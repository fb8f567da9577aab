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

    val tmp = java.nio.file.Files.createTempDirectory("tablesspec").toString
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
  }

  test("driver testdata events reads with a TimestampType ts at every SF") {
    Seq("sf0.001", "sf0.01").foreach { s =>
      val df = Tables.events(spark, sf(s))
      assert(df.schema("ts").dataType == TimestampType, s"$s ts type")
      assert(df.where(col("ts").isNotNull).count() > 0, s"$s has rows")
    }
  }
}
