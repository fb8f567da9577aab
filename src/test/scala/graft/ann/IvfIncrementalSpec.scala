package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental IVF maintenance contract (IvfIndex.appendToIndex): because
  * cell assignment is per-row against fixed centroids, appending an
  * increment to a base-built index must yield exactly the store — and
  * exactly the probe results — of rebuilding the assignment over
  * base ∪ increment with the same quantizer. */
class IvfIncrementalSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  private def emb = graft.Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  test("append ≡ rebuild-with-same-quantizer, for the store and the probe") {
    val base = emb.where(col("vec_id") % 10 =!= 7)
    val inc = emb.where(col("vec_id") % 10 === 7)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-incr-spec").toString
    val appended = s"$tmp/appended"; val rebuilt = s"$tmp/rebuilt"

    IvfIndex.writeIndex(base, appended)
    assert(IvfIndex.appendToIndex(spark, appended, inc, incrementId = 1L))
    // a replayed increment id must be a no-op (the ledger guard)
    assert(!IvfIndex.appendToIndex(spark, appended, inc, incrementId = 1L))

    // rebuild: same base-fit centroids, one-shot assignment of the union
    IvfIndex.writeIndex(base, rebuilt)
    val cents = spark.read.parquet(s"$rebuilt/centroids")
      .orderBy("cell").collect()
      .map(r => r.getAs[Seq[Double]]("centroid").toArray)
    val full = emb.select(col("vec_id"), col("emb"),
      graft.functions.NearestCell.nearest(spark, col("emb"), cents).as("cell"))
    full.write.mode("overwrite").partitionBy("cell").parquet(s"$rebuilt/assigned")

    val a = spark.read.parquet(s"$appended/assigned").select("vec_id", "cell")
    val b = spark.read.parquet(s"$rebuilt/assigned").select("vec_id", "cell")
    assert(a.count() == emb.count(), "append must cover base + increment exactly once")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "appended store must equal a rebuild with the same quantizer")

    val q = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
    val pa = IvfIndex.approxTopKStored(spark, appended, q, k = 10)
    val pb = IvfIndex.approxTopKStored(spark, rebuilt, q, k = 10)
    assert(pa.exceptAll(pb).isEmpty && pb.exceptAll(pa).isEmpty)
    assert(pa.count() > 0)

    // the increment genuinely landed in existing cells (no refit happened):
    // centroid tables of both stores are identical
    val ca = spark.read.parquet(s"$appended/centroids")
    val cb = spark.read.parquet(s"$rebuilt/centroids")
    assert(ca.exceptAll(cb).isEmpty && cb.exceptAll(ca).isEmpty)

    // crash loudness: a store whose append died mid-mutation (commit
    // marker gone) must REFUSE probes and further appends instead of
    // silently serving — and double-appending — partial data
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(appended), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$appended/_index_commit"), false)
    intercept[IllegalArgumentException] {
      IvfIndex.approxTopKStored(spark, appended, q, k = 10)
    }
    intercept[IllegalArgumentException] {
      IvfIndex.appendToIndex(spark, appended, inc, incrementId = 2L)
    }
    // a rebuild recovers the store
    IvfIndex.writeIndex(base, appended)
    assert(IvfIndex.approxTopKStored(spark, appended, q, k = 10).count() > 0)
  }

  test("retry after a crash between ledger record and marker re-create self-heals " +
    "(the ledger certifies the append landed completely)") {
    val base = emb.where(col("vec_id") % 10 =!= 7)
    val inc = emb.where(col("vec_id") % 10 === 7)
    val store = java.nio.file.Files.createTempDirectory("graft-ivf-heal-spec").toString
    IvfIndex.writeIndex(base, store)
    assert(IvfIndex.appendToIndex(spark, store, inc, incrementId = 1L))
    val q = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
    val before = IvfIndex.approxTopKStored(spark, store, q, k = 10).collect().toSet
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(store), spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$store/_index_commit")
    // the one benign crash window: data landed, ledger advanced (inc-1
    // exists), only the marker re-create was lost
    fs.delete(marker, false)
    // the orchestrator's retry of increment 1: ledger ≥ id proves the
    // append is complete, so the store self-heals instead of demanding a
    // full rebuild — marker back, replay reported as the no-op it is
    assert(!IvfIndex.appendToIndex(spark, store, inc, incrementId = 1L))
    assert(fs.exists(marker), "retry must recreate the commit marker")
    assert(IvfIndex.approxTopKStored(spark, store, q, k = 10).collect().toSet == before)
    // but a NEW increment id against a missing marker still refuses loudly:
    // without the ledger advance the data may be half-written
    fs.delete(marker, false)
    intercept[IllegalArgumentException] {
      IvfIndex.appendToIndex(spark, store, inc, incrementId = 2L)
    }
    // same protocol on the composed IVF+PQ store
    val pqStore = java.nio.file.Files.createTempDirectory("graft-ivfpq-heal-spec").toString
    IvfPq.writeIndex(base, pqStore, dim = 64)
    assert(IvfPq.appendToIndex(spark, pqStore, inc, incrementId = 1L))
    val pqFs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(pqStore), spark.sparkContext.hadoopConfiguration)
    val pqMarker = new org.apache.hadoop.fs.Path(s"$pqStore/_index_commit")
    pqFs.delete(pqMarker, false)
    assert(!IvfPq.appendToIndex(spark, pqStore, inc, incrementId = 1L))
    assert(pqFs.exists(pqMarker), "IvfPq retry must recreate the commit marker")
    pqFs.delete(pqMarker, false)
    intercept[IllegalArgumentException] {
      IvfPq.appendToIndex(spark, pqStore, inc, incrementId = 2L)
    }
  }
}
