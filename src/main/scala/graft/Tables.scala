package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed readers over the driver's parquet dir — the single place for schema
  * contracts (reference analog: db/postgres_database_manager.py:1-367, which
  * centralizes all table access for the pipeline).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the reader
  * keeps projection/filter pushdown intact by returning the raw scan and
  * letting each operator select only what it needs (verified via
  * `.explain` → ReadSchema/PushedFilters in the specs).
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) (readable only as Long via the nanosAsLong
    * legacy flag) and TIMESTAMP(MICROS) without UTC adjustment (read natively
    * as TIMESTAMP_NTZ). Branch on the read schema so either encoding yields
    * the same session-TZ TimestampType column. Sessions pin
    * spark.sql.session.timeZone=UTC, so the NTZ→timestamp cast is
    * value-preserving and matches the DuckDB oracle's native read. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(readMaybeNanos(spark)(read(spark, dir, "events")))

  /** Streaming twin of [[events]]: file sources need an explicit schema, so
    * probe it from the staged files with a batch read, then apply the same
    * `ts` normalization — the stream sees the identical TimestampType
    * column under either testdata encoding. */
  def eventsStream(spark: SparkSession, streamDir: String,
                   maxFilesPerTrigger: Int = 1): DataFrame = {
    val schema = readMaybeNanos(spark)(spark.read.parquet(streamDir)).schema
    normalizeTs(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(streamDir))
  }

  /** Parquet TIMESTAMP(NANOS) fails schema inference without the legacy
    * nanosAsLong flag; every other encoding reads fine without it. Try the
    * plain read first and set the flag only on the retry, so a session
    * reading micros-era testdata is never left with the global legacy flag
    * flipped (it would make OTHER nanos parquet reads silently yield longs
    * instead of erroring).
    *
    * Residual leak, by design: once a nanos file HAS been read here, the
    * session-global flag stays set for the rest of the session — it cannot
    * be unset after the call because the returned DataFrame reads the conf
    * lazily at execution time. From that point, non-Tables parquet readers
    * in the same session see TIMESTAMP(NANOS) columns as LongType instead
    * of getting the Illegal-Parquet-type error, and must not rely on that
    * error for encoding detection. */
  private def readMaybeNanos(spark: SparkSession)(body: => DataFrame): DataFrame =
    try body catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("Illegal Parquet type") =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        body
    }

  private[graft] def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType =>
        // legacy nanos-as-long: integer `div`, not `/` — double division
        // loses µs at 1e18-ns epochs (testdata is µs-precision, lossless)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already session-TZ TimestampType
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")

  /** Streaming twin of [[documents]] over a staged stream directory (file
    * sources need an explicit schema, probed from the staged files). */
  def documentsStream(spark: SparkSession, streamDir: String,
                      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream.schema(spark.read.parquet(streamDir).schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(streamDir)
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
  def customer(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "customer")
  def orders(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "lineitem")
  def supplier(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "region")
}
