package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential contract for the two LIVE mutations on one store —
  * appendToIndex (ingest) RACING deleteFromIndex (forget). The cascade
  * specs test each against maintain/retract but not against each other's
  * mutation lock (round-14 verdict item 8):
  *   - mutual exclusion: whichever mutation holds `_mutating`, the OTHER
  *     is rejected loudly (ConcurrentCommitException) before any file
  *     lands — append-under-forget and forget-under-append both;
  *   - the rejected mutation leaves the store bit-identical (cell files
  *     untouched, ledger unadvanced) and succeeds verbatim on retry once
  *     the lock clears;
  *   - order-independence of DISJOINT mutations: append(A) ∘ forget(B) ≡
  *     forget(B) ∘ append(A) — same code rows, same probe results;
  *   - forget of JUST-appended ids removes them from the probe stream
  *     (ingest-then-takedown, the governance sequence forget_cascade
  *     drives one level up).
  */
class IvfPqMutationRaceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = graft.Tables.embeddings(spark, sf("sf0.01"))
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
  private lazy val q = e.where(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("query_id"), col("emb").as("qemb"))

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def cellFiles(path: String): Map[String, Set[String]] = {
    val codes = new org.apache.hadoop.fs.Path(s"$path/codes")
    fs.listStatus(codes).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .map { st =>
        st.getPath.getName -> fs.listStatus(st.getPath)
          .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}").toSet
      }.toMap
  }

  private def codeRows(path: String): Set[String] =
    spark.read.option("basePath", s"$path/codes").parquet(s"$path/codes")
      .collect().map(_.mkString("|")).toSet

  private def probeRows(path: String): Seq[String] =
    IvfPq.approxTopKStored(spark, path, e, q, k = 10, dim = 64)
      .orderBy("query_id", "rank").collect().map(_.mkString("|")).toSeq

  private val base = () => e.where(col("vec_id") % 10 =!= 7)
  private val incr = () => e.where(col("vec_id") % 10 === 7)
  private val forgetIds = () => e.where(col("vec_id") % 20 === 7).select("vec_id")

  test("each mutation is rejected loudly while the other holds the lock, retry succeeds") {
    val path = s"${sys.props("java.io.tmpdir")}/graft-ivfpq-race-excl"
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    IvfPq.writeIndex(base(), path, dim = 64)
    val before = (cellFiles(path), IndexLedger.applied(spark, path))

    // a rival (here: the spec) holds the mutation lock mid-append
    IndexLedger.acquireMutationLock(spark, path, "spec-rival")
    try {
      val exA = intercept[graft.sources.ConcurrentCommitException](
        IvfPq.appendToIndex(spark, path, incr(), incrementId = 1L))
      assert(exA.getMessage.contains("_mutating"))
      val exF = intercept[graft.sources.ConcurrentCommitException](
        IvfPq.deleteFromIndex(spark, path, forgetIds(), incrementId = 1L))
      assert(exF.getMessage.contains("_mutating"))
    } finally IndexLedger.releaseMutationLock(spark, path)

    // the rejected mutations left the store byte-identical and the ledger
    // unadvanced...
    assert((cellFiles(path), IndexLedger.applied(spark, path)) == before,
      "a rejected mutation must not touch the store")
    // ...and the SAME calls succeed verbatim once the lock clears
    assert(IvfPq.appendToIndex(spark, path, incr(), incrementId = 1L))
    assert(IvfPq.deleteFromIndex(spark, path, forgetIds(), incrementId = 2L))
    assert(IndexLedger.applied(spark, path) == 2L)
  }

  test("disjoint append and forget commute: same code rows, same probe") {
    val pAF = s"${sys.props("java.io.tmpdir")}/graft-ivfpq-race-af"
    val pFA = s"${sys.props("java.io.tmpdir")}/graft-ivfpq-race-fa"
    Seq(pAF, pFA).foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
    // forgotten ids (vec_id % 20 = 7 with vec_id % 10 != 7 -> none; use
    // base-resident ids disjoint from the increment instead)
    val gone = e.where(col("vec_id") % 20 === 4).select("vec_id")

    IvfPq.writeIndex(base(), pAF, dim = 64)
    assert(IvfPq.appendToIndex(spark, pAF, incr(), incrementId = 1L))
    assert(IvfPq.deleteFromIndex(spark, pAF, gone, incrementId = 2L))

    IvfPq.writeIndex(base(), pFA, dim = 64)
    assert(IvfPq.deleteFromIndex(spark, pFA, gone, incrementId = 1L))
    assert(IvfPq.appendToIndex(spark, pFA, incr(), incrementId = 2L))

    assert(codeRows(pAF) == codeRows(pFA),
      "append∘forget and forget∘append must store the same rows")
    assert(probeRows(pAF) == probeRows(pFA),
      "probe results must be order-independent for disjoint mutations")
  }

  test("forget of just-appended ids removes them from the probe stream") {
    val path = s"${sys.props("java.io.tmpdir")}/graft-ivfpq-race-takedown"
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    IvfPq.writeIndex(base(), path, dim = 64)
    assert(IvfPq.appendToIndex(spark, path, incr(), incrementId = 1L))
    val appended = incr().select("vec_id").as[Long].collect().toSet
    val takedown = appended.filter(_ % 20 == 7)
    assert(takedown.nonEmpty, "fixture must append ids it then forgets")
    assert(IvfPq.deleteFromIndex(spark, path,
      incr().where(col("vec_id") % 20 === 7).select("vec_id"), incrementId = 2L))
    val probed = IvfPq.approxTopKStored(spark, path, e, q, k = 10, dim = 64)
      .select("vec_id").as[Long].collect().toSet
    assert(probed.intersect(takedown).isEmpty,
      s"forgotten appended ids leaked into the probe: ${probed.intersect(takedown)}")
    // survivors of the increment are still probe-visible somewhere: the
    // store retains them (codes), even if no query ranks them top-k
    val stored = spark.read.option("basePath", s"$path/codes").parquet(s"$path/codes")
      .select("vec_id").as[Long].collect().toSet
    assert((appended -- takedown).subsetOf(stored))
  }
}
