package graft.fundamentals

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sqlx.Exact._

/** Insider-transaction transform + rolling aggregation
  * (transform_insider_transactions.py, transform_insider_transactions_agg.py:
  * 75-130): per-row typing/tiering/value calc, then the CASE-pivot sum matrix
  * by transaction type × executive tier × 10%-owner, grouped per
  * (symbol, day). Data mapping per SURVEY.md §1.1: lineitem rows are
  * transactions (l_suppkey→symbol, R-returnflag→disposition, linenumber→tier,
  * partkey%10→10%-owner).
  *
  * The aggregation is a single hash groupBy with map-side partial
  * aggregation — the pivot is plain conditional sums, no shuffle beyond the
  * one aggregation exchange.
  */
object Insider {
  val Tiers: Seq[Int] = 0 to 3

  def transactions(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_suppkey").as("symbol_id"),
      col("l_shipdate").cast("date").as("transaction_date"),
      col("l_orderkey"), col("l_linenumber"),
      when(col("l_returnflag") === "R", "D").otherwise("A").as("transaction_type"),
      (col("l_linenumber") % 4).as("tier"),
      (col("l_partkey") % 10 === 0).as("is_owner_10pct"),
      col("l_quantity").cast("long").as("shares"),
      (col("l_extendedprice") / col("l_quantity")).as("price_per_share"))
      .withColumn("transaction_value",
        col("shares").cast("double") * col("price_per_share"))

  /** The reference's full pivot-sum column matrix. */
  def aggregated(spark: SparkSession, dir: String): DataFrame = {
    val t = transactions(spark, dir)
    def typed(ty: String): Column = col("transaction_type") === ty
    def sharesSum(cond: Column, name: String): Column =
      sum(when(cond, col("shares")).otherwise(0L)).as(name)
    def valueSum(cond: Column, name: String): Column =
      sum(when(cond, dec(col("transaction_value"))).otherwise(dec(lit(0.0)))).cast("double").as(name)
    def cnt(cond: Column, name: String): Column =
      sum(when(cond, 1L).otherwise(0L)).as(name)

    val aggs: Seq[Column] = Seq("d", "a").flatMap { tl =>
      val ty = typed(tl.toUpperCase)
      Seq(sharesSum(ty, s"total_shares_$tl")) ++
        Tiers.map(k => sharesSum(ty && col("tier") === k, s"total_shares_${tl}_tier_$k")) ++
        Seq(sharesSum(ty && col("is_owner_10pct"), s"total_shares_${tl}_10pct_owner"),
          valueSum(ty, s"total_value_$tl")) ++
        Tiers.map(k => valueSum(ty && col("tier") === k, s"total_value_${tl}_tier_$k")) ++
        Seq(valueSum(ty && col("is_owner_10pct"), s"total_value_${tl}_10pct_owner"))
    } ++ Seq("d", "a").flatMap { tl =>
      val ty = typed(tl.toUpperCase)
      val c = sum(when(ty, 1L).otherwise(0L))
      val s = sum(when(ty, dec(col("price_per_share")))).cast("double")
      Seq(when(c > 0, s / c).as(s"avg_price_$tl"),
        cnt(ty, s"transaction_count_$tl"),
        cnt(ty && col("is_owner_10pct"), s"transaction_count_${tl}_10pct"))
    }
    t.groupBy(col("symbol_id"), col("transaction_date")).agg(aggs.head, aggs.tail: _*)
  }
}
