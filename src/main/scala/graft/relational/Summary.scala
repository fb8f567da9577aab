package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sqlx.Exact.decSumAgg

/** Cross-table database summary view (database_summary_view.py:17-204):
  * one row per table with row count and an exact aggregate of its headline
  * numeric column. Each leg is an independent scan-side aggregate; the union
  * is driver-free and tiny. */
object Summary {
  def dbSummary(spark: SparkSession, dir: String): DataFrame = {
    def leg(name: String, df: DataFrame, metric: org.apache.spark.sql.Column): DataFrame =
      df.agg(count(lit(1)).as("row_count"), metric.as("value_sum"))
        .select(lit(name).as("table_name"), col("row_count"), col("value_sum"))
    Seq(
      leg("customer", Tables.customer(spark, dir), decSumAgg(col("c_acctbal"))),
      leg("orders", Tables.orders(spark, dir), decSumAgg(col("o_totalprice"))),
      leg("lineitem", Tables.lineitem(spark, dir), decSumAgg(col("l_extendedprice"))),
      leg("supplier", Tables.supplier(spark, dir), decSumAgg(col("s_acctbal"))),
      leg("part", Tables.part(spark, dir), decSumAgg(col("p_retailprice"))),
      leg("nation", Tables.nation(spark, dir), sum(col("n_regionkey")).cast("double")),
      leg("region", Tables.region(spark, dir), sum(col("r_regionkey")).cast("double")),
      leg("events", Tables.events(spark, dir), decSumAgg(col("value"))),
      leg("documents", Tables.documents(spark, dir), sum(col("n_chars")).cast("double")),
      leg("embeddings", Tables.embeddings(spark, dir), sum(col("label")).cast("double"))
    ).reduce(_ unionByName _).orderBy("table_name")
  }
}
