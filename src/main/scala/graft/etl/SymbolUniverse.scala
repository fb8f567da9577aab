package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Symbol-universe load with upsert/dedup semantics
  * (transform_load_symbol_universe.py:133): incoming batches are unioned
  * with the existing universe and deduplicated keeping the latest version
  * per symbol — the standard distributed upsert (window row_number over a
  * version ordering, one shuffle by key; at scale this is the merge-on-read
  * pattern rather than a row-at-a-time UPSERT loop).
  *
  * Testdata mapping: base universe = customer (version 1); the overlay batch
  * re-delivers every third symbol with a bumped version and shifted balance.
  */
object SymbolUniverse {
  def base(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey").as("symbol_id"),
      col("c_name").as("symbol"),
      col("c_mktsegment").as("segment"),
      col("c_acctbal").as("acctbal"),
      lit(1).as("version"))

  def overlay(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir)
      .where(col("symbol_id") % 3 === 0)
      .withColumn("acctbal", col("acctbal") + 100.0)
      .withColumn("version", lit(2))

  /** Upsert = union + keep-latest-version dedup. */
  def upsert(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol_id").orderBy(col("version").desc)
    existing.unionByName(incoming)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") === 1)
      .drop("rnk")
  }

  def universe(spark: SparkSession, dir: String): DataFrame =
    upsert(base(spark, dir), overlay(spark, dir))
}
