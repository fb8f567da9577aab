package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The driver's testdata has shipped `events.ts` in two parquet encodings
  * across regenerations — TIMESTAMP(NANOS) (readable only as Long via the
  * nanosAsLong legacy flag) and non-UTC-adjusted TIMESTAMP(MICROS) (read
  * natively as TIMESTAMP_NTZ). Round 8 was zeroed by the switch: the reader
  * only handled the nanos branch, and 50 of 115 queries failed analysis.
  * This spec pins the contract so the next driver-side regeneration cannot
  * zero a round again: every encoding read through [[Tables.events]] must
  * yield the same session-TZ TimestampType values. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("events reader yields identical TimestampType values for long-nanos, micros-NTZ, and UTC-micros encodings") {
    val base = Seq(
      (1L, "2024-01-02 03:04:05.123456"),
      (2L, "2024-06-30 23:59:59.999999"),
      (3L, "1999-12-31 00:00:00.000001")
    ).toDF("event_id", "s")
      .select(col("event_id"), to_timestamp(col("s")).as("ts"))

    val tmpPath = java.nio.file.Files.createTempDirectory("tablesspec")
    val tmp = tmpPath.toString
    try {
      // micros adjusted-to-UTC (what Spark itself writes for TimestampType)
      base.write.mode("overwrite").parquet(s"$tmp/utc/events.parquet")
      // micros NOT adjusted to UTC → reads back TIMESTAMP_NTZ (the current
      // driver testdata encoding, pandas/pyarrow timestamp[us] without tz)
      base.select(col("event_id"), col("ts").cast("timestamp_ntz").as("ts"))
        .write.mode("overwrite").parquet(s"$tmp/ntz/events.parquet")
      // epoch-nanos as plain INT64 → reads back LongType, same branch the
      // legacy TIMESTAMP(NANOS)+nanosAsLong encoding lands in
      base.select(col("event_id"), (unix_micros(col("ts")) * 1000).as("ts"))
        .write.mode("overwrite").parquet(s"$tmp/long/events.parquet")

      val frames = Seq("utc", "ntz", "long").map(e => e -> Tables.events(spark, s"$tmp/$e"))
      frames.foreach { case (e, df) =>
        assert(df.schema("ts").dataType == TimestampType,
          s"encoding $e read back as ${df.schema("ts").dataType}, expected TimestampType")
      }
      val collected = frames.map { case (e, df) =>
        e -> df.select(col("event_id"), col("ts").cast("string"))
          .as[(Long, String)].collect().sortBy(_._1).toSeq
      }.toMap
      assert(collected("ntz") == collected("utc"), "NTZ encoding drifted from UTC-micros")
      assert(collected("long") == collected("utc"), "long-nanos encoding drifted from UTC-micros")
      assert(collected("utc").map(_._2) == Seq(
        "2024-01-02 03:04:05.123456",
        "2024-06-30 23:59:59.999999",
        "1999-12-31 00:00:00.000001"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmpPath).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("driver testdata events reads with a TimestampType ts at every SF") {
    Seq("sf0.001", "sf0.01").foreach { s =>
      val df = Tables.events(spark, sf(s))
      assert(df.schema("ts").dataType == TimestampType, s"$s ts type")
      assert(df.where(col("ts").isNotNull).count() > 0, s"$s has rows")
    }
  }

  test("real TIMESTAMP(NANOS) parquet reads through the legacy-flag retry path") {
    // committed fixture written by pyarrow with timestamp[ns] (parquet
    // v2.6) — the round-7-era testdata encoding Spark cannot read without
    // the nanosAsLong legacy flag. Start from a clean session state so the
    // first read genuinely fails and the retry path is exercised; restore
    // the prior flag state afterwards so suite order cannot couple through
    // the shared session (an earlier-set flag would otherwise vanish).
    val flag = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(flag)
    spark.conf.unset(flag)
    try {
      val df = Tables.events(spark, "src/test/resources/events_nanos")
      assert(df.schema("ts").dataType == TimestampType)
      val got = df.select(col("event_id"), col("ts").cast("string"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got == Seq(
        (1L, "2024-01-02 03:04:05.123456"),
        (2L, "2024-06-30 23:59:59.999999"),
        (3L, "1999-12-31 00:00:00.000001")))
    } finally prior match {
      case Some(v) => spark.conf.set(flag, v)
      case None => spark.conf.unset(flag)
    }
  }

  /** Early-warning schema contract: every column the operators read, with
    * the type CLASS the code depends on (exact physical encodings may
    * legitimately drift between testdata regenerations — dates have
    * shipped as DATE and timestamp[us], ints as int32/int64). A driver
    * regeneration that breaks a dependency then fails THIS test by table
    * and column name instead of 50 queries failing with cryptic analysis
    * errors (how round 8 died). */
  test("driver testdata columns the operators depend on exist with compatible type classes") {
    import org.apache.spark.sql.types._
    def cls(dt: DataType): String = dt match {
      case _: IntegerType | _: LongType | _: ShortType => "int"
      case _: FloatType | _: DoubleType | _: DecimalType => "float"
      case _: StringType => "string"
      case _: DateType | _: TimestampType | _: TimestampNTZType => "time"
      case ArrayType(e, _) => s"array<${cls(e)}>"
      case _: BinaryType => "binary"
      case other => other.simpleString
    }
    val contract: Map[String, Map[String, String]] = Map(
      "events" -> Map("event_id" -> "int", "ts" -> "time", "user_id" -> "int",
        "event_type" -> "string", "value" -> "float", "props" -> "string"),
      "documents" -> Map("doc_id" -> "int", "text" -> "string",
        "lang" -> "string", "source" -> "string", "n_chars" -> "int"),
      "embeddings" -> Map("vec_id" -> "int", "embedding" -> "array<float>",
        "label" -> "int"),
      "orders" -> Map("o_orderkey" -> "int", "o_custkey" -> "int",
        "o_orderstatus" -> "string", "o_totalprice" -> "float",
        "o_orderdate" -> "time", "o_orderpriority" -> "string"),
      "lineitem" -> Map("l_orderkey" -> "int", "l_partkey" -> "int",
        "l_suppkey" -> "int", "l_quantity" -> "float",
        "l_extendedprice" -> "float", "l_discount" -> "float", "l_tax" -> "float",
        "l_returnflag" -> "string", "l_linestatus" -> "string",
        "l_shipdate" -> "time"),
      "customer" -> Map("c_custkey" -> "int", "c_name" -> "string",
        "c_nationkey" -> "int", "c_acctbal" -> "float", "c_mktsegment" -> "string"),
      "supplier" -> Map("s_suppkey" -> "int", "s_name" -> "string",
        "s_nationkey" -> "int", "s_acctbal" -> "float"),
      "part" -> Map("p_partkey" -> "int", "p_name" -> "string",
        "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
        "p_retailprice" -> "float"),
      "nation" -> Map("n_nationkey" -> "int", "n_name" -> "string",
        "n_regionkey" -> "int"),
      "region" -> Map("r_regionkey" -> "int", "r_name" -> "string"))
    val readers: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "events" -> Tables.events, "documents" -> Tables.documents,
      "embeddings" -> Tables.embeddings, "orders" -> Tables.orders,
      "lineitem" -> Tables.lineitem, "customer" -> Tables.customer,
      "supplier" -> Tables.supplier, "part" -> Tables.part,
      "nation" -> Tables.nation, "region" -> Tables.region)
    val problems = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema = readers(table)(spark, sf("sf0.001")).schema
      cols.toSeq.sortBy(_._1).flatMap { case (name, want) =>
        schema.fields.find(_.name == name) match {
          case None => Some(s"$table.$name: MISSING (schema=${schema.fieldNames.mkString(",")})")
          case Some(f) if cls(f.dataType) != want =>
            Some(s"$table.$name: ${f.dataType.simpleString} is not a $want")
          case _ => None
        }
      }
    }
    assert(problems.isEmpty, s"testdata schema drifted:\n${problems.mkString("\n")}")
  }
}
