package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-index properties the registered oracle can't see: real file
  * skipping on point probes over a hash layout (where min/max prunes
  * nothing), correctness on present AND absent probes, and the
  * conservative keep for unindexed files. */
class BloomSkipIndexSpec extends SparkSpec {
  import spark.implicits._

  private val NFiles = 16

  /** 1600 rows, keys 0..199, hash-scattered across files by row id —
    * every file spans the whole key range. */
  private lazy val data = (0 until 1600).map { i =>
    (i.toLong, (i % 200).toLong, i * 0.5)
  }.toDF("id", "key", "value")

  private lazy val root = {
    val r = s"${sys.props("java.io.tmpdir")}/graft-bloomskip-spec"
    data.repartition(NFiles, col("id")).write.mode("overwrite").parquet(r)
    r
  }

  private def allFiles: Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName)
  }

  test("pruned point read == full filter, for present and absent probe values") {
    val idx = BloomSkipIndex.build(spark, root, Seq("key")).cache()
    for (probe <- Seq(0L, 7L, 199L, 5000L)) { // 5000 exists in no file
      val got = BloomSkipIndex.readPruned(spark, root, idx, "key", lit(probe))
        .select("id").as[Long].collect().toSet
      val want = data.where(col("key") === probe).select("id").as[Long].collect().toSet
      assert(got == want, s"probe=$probe")
    }
    idx.unpersist()
  }

  test("an absent value prunes every file; a present value keeps only its true files (+fp)") {
    val idx = BloomSkipIndex.build(spark, root, Seq("key"))
    // at m=8192/k=4 with ~100-ish distinct keys x 4 positions per file the
    // per-file fp rate is ~1e-5: an absent probe prunes everything
    assert(BloomSkipIndex.prunedFiles(idx, allFiles, "key", lit(5000L)).isEmpty)
    // a present probe must keep at least the files that really hold it,
    // and at this fp rate nothing else — on a HASH layout, where min/max
    // stats could not have pruned a single file
    val probe = 7L
    val trueFiles = spark.read.parquet(root).withColumn("f", input_file_name())
      .where(col("key") === probe)
      .select(element_at(split(col("f"), "/"), -1)).distinct().as[String].collect().toSet
    val kept = BloomSkipIndex.prunedFiles(idx, allFiles, "key", lit(probe)).toSet
    assert(trueFiles.subsetOf(kept), "pruning must never drop a true file")
    assert(kept == trueFiles, s"expected only the true files at this fp rate, got ${kept -- trueFiles}")
    assert(kept.size < NFiles, "a point probe over a hash layout must actually skip files")
  }

  test("a file with no index row for the probed column is conservatively kept") {
    val idx = Seq(("f1.parquet", "key", Seq(1, 2, 3)))
      .toDF("file", "column", "bits")
    val kept = BloomSkipIndex.prunedFiles(
      idx, Seq("f1.parquet", "f2.parquet"), "key", lit(42L))
    assert(kept.contains("f2.parquet"), "unindexed file must be kept")
    assert(!kept.contains("f1.parquet"), "indexed file lacking the probe bits must be pruned")
  }
}
