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

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark only reads via the
    * nanosAsLong legacy flag. The driver's testdata is µs-precision (all
    * ns % 1000 == 0, verified), so truncating to micros is lossless and the
    * DuckDB oracle (which reads native ns) orders/derives identically. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      // integer `div`, not `/`: double division loses µs at 1e18-ns epochs
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
  def customer(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "customer")
  def orders(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "lineitem")
  def supplier(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "region")
}
