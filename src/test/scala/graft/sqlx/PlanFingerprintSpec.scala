package graft.sqlx

import graft.SparkSpec

/** The memo-key contract behind the session-memoized corpus counts and
  * quantizer fits: file-backed plans fingerprint stably, DIFFERENT data
  * at the same path re-fingerprints (the stale-memo failure
  * SourceFingerprint documents), and local-relation plans — whose
  * canonicalized form is their schema, not their rows — refuse a
  * fingerprint entirely so two in-memory corpora can never collide. */
class PlanFingerprintSpec extends SparkSpec {
  import spark.implicits._

  test("local relations have no fingerprint; identical local plans never memo-collide") {
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((2L, "y")).toDF("id", "v") // same schema, different rows
    assert(PlanFingerprint.of(a).isEmpty && PlanFingerprint.of(b).isEmpty)
    // Counts falls back to a fresh count — correct on both
    assert(Counts.of(a) == 1L && Counts.of(b) == 1L)
  }

  test("file-backed plans fingerprint stably, and rewritten data re-fingerprints") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fp").toString
    Seq(1L, 2L, 3L).toDF("id").write.mode("overwrite").parquet(s"$dir/t.parquet")
    val read = () => spark.read.parquet(s"$dir/t.parquet")
    val fp1 = PlanFingerprint.of(read())
    assert(fp1.nonEmpty)
    assert(PlanFingerprint.of(read()) == fp1, "same data, same plan -> same fingerprint")
    // a DIFFERENT plan over the same files is a different key
    assert(PlanFingerprint.of(read().filter("id > 1")) != fp1)
    assert(Counts.of(read()) == 3L)
    assert(Counts.of(read()) == 3L) // memo hit
    // rewrite the table: new file metadata must invalidate, not serve 3
    Thread.sleep(5) // ensure a distinct mtime even on coarse filesystems
    Seq(1L, 2L, 3L, 4L).toDF("id").write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(PlanFingerprint.of(read()) != fp1, "rewritten data must re-fingerprint")
    assert(Counts.of(read()) == 4L)
  }

  test("a plan mixing a file scan with a local relation refuses a fingerprint") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fp2").toString
    Seq(1L).toDF("id").write.mode("overwrite").parquet(s"$dir/t.parquet")
    val mixed = spark.read.parquet(s"$dir/t.parquet")
      .unionByName(Seq(9L).toDF("id"))
    assert(PlanFingerprint.of(mixed).isEmpty,
      "local rows are invisible to the canonicalized plan string — must not memoize")
  }

  test("RDD-backed leaves refuse a fingerprint too (whitelist, not a LocalRelation blacklist)") {
    // createDataFrame(parallelize(...)) canonicalizes without row content,
    // exactly like LocalRelation — the round-15 ADVICE gap: mixed with a
    // file scan it used to fingerprint on file metadata alone
    val rdd = spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(7L)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    val rddDf = spark.createDataFrame(rdd, schema)
    assert(PlanFingerprint.of(rddDf).isEmpty, "pure RDD plan must not fingerprint")
    val dir = java.nio.file.Files.createTempDirectory("graft-fp3").toString
    Seq(1L).toDF("id").write.mode("overwrite").parquet(s"$dir/t.parquet")
    val mixed = spark.read.parquet(s"$dir/t.parquet").unionByName(rddDf)
    assert(PlanFingerprint.of(mixed).isEmpty,
      "an RDD leaf beside a file scan must refuse — its rows are invisible to the key")
  }
}
