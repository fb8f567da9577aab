package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The mixed-generation schema-evolution contract: a store whose newer
  * files carry an added column stays readable with mergeSchema — union
  * schema, NULLs exactly on the old-generation rows, no history rewrite
  * (the old files are untouched by the append). */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = s"${sys.props("java.io.tmpdir")}/graft-schevo-spec"
    val fs = new org.apache.hadoop.fs.Path(r)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(r), true)
    val old = (1 to 100).map(i => (i.toLong, s"k$i")).toDF("id", "key")
    old.write.parquet(s"$r/gen=1")
    r
  }

  private def fingerprint(path: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(f =>
      s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}").toSet
  }

  test("added column resolves via mergeSchema with NULLs exactly on old rows; old files untouched") {
    val before = fingerprint(s"$root/gen=1")
    (101 to 150).map(i => (i.toLong, s"k$i", i * 2))
      .toDF("id", "key", "score").write.parquet(s"$root/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.toSet == Set("id", "key", "score", "gen"))
    assert(merged.count() == 150)
    // NULL placement is exact: every old row null, every new row valued
    assert(merged.where(col("gen") === 1 && col("score").isNotNull).count() == 0)
    assert(merged.where(col("gen") === 2 && col("score").isNull).count() == 0)
    // evolution required NO rewrite of history
    assert(fingerprint(s"$root/gen=1") == before,
      "gen-1 files must be byte-identical after the evolved append")
    // and the evolved store aggregates correctly across generations
    val agg = merged.agg(
      count(lit(1)).as("n"), count(col("score")).as("ns"),
      sum(col("score").cast("long")).as("ss")).head()
    assert(agg.getLong(0) == 150 && agg.getLong(1) == 50)
    assert(agg.getLong(2) == (101 to 150).map(_ * 2L).sum)
  }
}
