package graft.sources

import graft.SparkSpec

/** Round-trip contract of the driver-side metadata reader/writer pair
  * (round 18): whatever [[TinyParquet.write]] persists must read back
  * identically through BOTH consumers the stores use — [[TinyParquet.rows]]
  * (driver) and `spark.read.parquet` (jobs) — across the full supported
  * type set, including nulls and array<double>. Also pins the fail-loudly
  * contracts: unsupported write types and unsupported logical annotations
  * on read error instead of decoding garbage. */
class TinyParquetSpec extends SparkSpec {

  private val schema = Seq(
    "id" -> "long", "k" -> "int", "x" -> "double", "ok" -> "boolean",
    "name" -> "string", "vec" -> "array<double>")

  private val rows: Seq[Seq[Any]] = Seq(
    Seq(1L, 7, 2.5, true, "alpha", Array(1.0, -2.25, 3.5)),
    Seq(2L, null, -0.125, false, null, Array.empty[Double]),
    Seq(3L, 0, Double.MaxValue, true, "", null))

  test("write → rows round-trips every supported type, nulls included") {
    val dir = java.nio.file.Files.createTempDirectory("tinypq").toString + "/t1"
    TinyParquet.write(spark, dir, schema, rows)
    val back = TinyParquet.rows(spark, dir)
    assert(back.size == 3)
    val r1 = back.find(_.long("id") == 1L).get
    assert(r1.int("k") == 7 && r1.double("x") == 2.5 && r1.bool("ok") &&
      r1.string("name") == "alpha" && r1.doubles("vec").toSeq == Seq(1.0, -2.25, 3.5))
    val r2 = back.find(_.long("id") == 2L).get
    assert(r2.isNull("k") && r2.isNull("name") && r2.doubles("vec").isEmpty)
    val r3 = back.find(_.long("id") == 3L).get
    assert(r3.string("name") == "" && r3.isNull("vec"))
    // _SUCCESS lands, so CommittedVersions.list-style gates see the dir
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS")))
  }

  test("write → spark.read reads the same rows (layout is Spark-standard)") {
    val dir = java.nio.file.Files.createTempDirectory("tinypq").toString + "/t2"
    TinyParquet.write(spark, dir, schema, rows)
    val df = spark.read.parquet(dir).orderBy("id")
    assert(df.columns.toSeq == schema.map(_._1))
    val got = df.collect()
    assert(got.length == 3)
    assert(got(0).getLong(0) == 1L && got(0).getInt(1) == 7 &&
      got(0).getDouble(2) == 2.5 && got(0).getBoolean(3) &&
      got(0).getString(4) == "alpha" &&
      got(0).getSeq[Double](5) == Seq(1.0, -2.25, 3.5))
    assert(got(1).isNullAt(1) && got(1).isNullAt(4) && got(1).getSeq[Double](5).isEmpty)
    assert(got(2).isNullAt(5))
  }

  test("unsupported write type and unsupported logical annotation fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("tinypq").toString
    intercept[RuntimeException] {
      TinyParquet.write(spark, s"$dir/bad", Seq("d" -> "decimal(25,10)"), Seq(Seq(null)))
    }
    // a date column (INT32 + DateLogicalTypeAnnotation) must be rejected by
    // the reader, not decoded as a raw int
    import spark.implicits._
    Seq(java.sql.Date.valueOf("2024-01-02")).toDF("d")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/dated")
    val e = intercept[RuntimeException] { TinyParquet.rows(spark, s"$dir/dated") }
    assert(e.getMessage.contains("unsupported logical type"))
  }
}
