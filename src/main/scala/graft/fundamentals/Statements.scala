package graft.fundamentals

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sqlx.Exact._

/** Quarterly fundamental-statement analogs over the TPC-H-ish testdata
  * (SURVEY.md §1.1): per (customer, fiscal quarter) line items derived from
  * customer/orders/lineitem, then the reference's three statement transforms
  * (transform_balance_sheet.py:201-268, transform_cash_flow.py:222-299,
  * transform_income_statement.py:222-276) — safe-divide ratios
  * (num/(den+1e-6)), QoQ/YoY pct-change, rolling(4, min 2) volatility,
  * per-(quarter, sector) percentile ranks, and shock/decline flags.
  *
  * Two hash aggregations (orders, lineitem) + a broadcast customer join +
  * one window pass keyed by symbol — no per-symbol loop, no global window
  * (ranks partition by quarter×sector).
  */
object Statements {
  private val Eps = 1.0e-6
  private val BySym = Window.partitionBy("symbol_id").orderBy("fiscal_q")
  private def frame(p: Int) = BySym.rowsBetween(-(p - 1), 0)

  private def sdiv(num: Column, den: Column): Column = num / (den + lit(Eps))

  /** Quarterly line items. */
  def base(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("symbol_id"),
        year(col("o_orderdate")).as("fy"), quarter(col("o_orderdate")).as("fq"))
      .agg(decSumAgg(col("o_totalprice")).as("tca"))
    // pre-aggregate lineitem per order BEFORE the orders join: decimal sums
    // are exact and associative, so the two-phase rollup is bit-identical to
    // aggregating the joined rows — and the join input shrinks from
    // line-items to orders (4-6x at TPC-H shape, the same at 100 TB)
    val perOrder = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev_d"),
        sum(dec(col("l_extendedprice") * col("l_discount"))).as("opex_d"),
        sum(dec(col("l_extendedprice") * col("l_tax"))).as("tcl_d"),
        sum(dec(col("l_quantity"))).as("inv_d"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * col("l_tax"))).as("cogs_d"))
    val li = perOrder.join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("symbol_id"),
        year(col("o_orderdate")).as("fy"), quarter(col("o_orderdate")).as("fq"))
      .agg(
        sum(col("rev_d")).cast("double").as("revenue"),
        sum(col("opex_d")).cast("double").as("opex"),
        sum(col("tcl_d")).cast("double").as("tcl"),
        sum(col("inv_d")).cast("double").as("inventory"),
        sum(col("cogs_d")).cast("double").as("cogs"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey").as("sector"),
        col("c_mktsegment").as("industry"), greatest(col("c_acctbal"), lit(0.0)).as("cash"))
    o.join(li, Seq("symbol_id", "fy", "fq"))
      .join(broadcast(c), col("symbol_id") === col("c_custkey"))
      .withColumn("fiscal_q", make_date(col("fy"), (col("fq") - 1) * 3 + 1, lit(1)))
      .withColumn("total_assets", col("tca") + col("cash") + col("inventory"))
      .withColumn("total_liabilities", col("tcl") + col("opex"))
      .withColumn("equity", col("total_assets") - col("total_liabilities"))
      .withColumn("gross_profit", col("revenue") - col("cogs"))
      .withColumn("operating_income", col("gross_profit") - col("opex"))
      .withColumn("net_income", col("operating_income") - col("tcl"))
      .withColumn("ocf", col("operating_income"))
      .withColumn("capex", col("inventory"))
      .withColumn("fcf", col("ocf") - abs(col("capex")))
      .drop("c_custkey")
  }

  /** pandas rank(pct=True) within a partition: average-rank / non-null count.
    * avg_rank = cnt_less + (cnt_eq + 1)/2. Everything derives from ONE
    * ascending sort with nulls last: rank()-1 is the strictly-less count
    * (null rows sort after every value, so they never inflate it), the
    * default RANGE frame's running count(v) is the ≤-count, and the
    * unordered whole-partition count(v) is the non-null total — all three
    * are O(n) running/once-per-partition frames on the same exchange. (The
    * previous formulation mirrored a rangeBetween(currentRow,
    * unboundedFollowing) frame, which Spark evaluates by re-scanning to the
    * partition end for every row — O(n²) per partition.) Counts are exact
    * integers, so the derived cnt_less/cnt_eq and the final double DAG are
    * bit-identical to the direct formulation the oracle uses. */
  def pctRank(v: Column, part: Seq[Column]): Column = {
    val ws = Window.partitionBy(part: _*).orderBy(v.asc_nulls_last)
    val cntLe = count(v).over(ws) // ≤ v (default RANGE = peers incl.)
    val nTot = count(v).over(Window.partitionBy(part: _*))
    val cntLess = rank().over(ws).cast("long") - lit(1L)
    val cntEq = cntLe - cntLess
    when(v.isNotNull, (cntLess + (cntEq + lit(1)) / lit(2.0)) / nTot)
  }

  /** pct_change(k, fill_method=None) with the reference's inf→null wash. */
  private def pctChange(v: Column, k: Int): Column = {
    val prev = lag(v, k).over(BySym)
    when(prev =!= 0.0, (v - prev) / prev)
  }

  /** rolling(4, min_periods=2) sample stddev via a fixed-order two-pass
    * formula over explicit lags. Epsilon-guarded ratios can reach ~1e12 where
    * decimal round-trips diverge across engines, so no decimals here — every
    * IEEE op is in a fixed order, giving bit-identical results. */
  private def vol4(v: Column): Column = {
    val ls = (1 to 3).map(k => lag(v, k).over(BySym))
    val n = least(col("rn"), lit(4)).cast("double")
    val s = ls.foldLeft(v)((acc, l) => acc + coalesce(l, lit(0.0)))
    val mean = s / n
    def sq(c: Column) = when(c.isNotNull, (c - mean) * (c - mean)).otherwise(lit(0.0))
    val variance = (v +: ls).map(sq).reduce(_ + _) / (n - lit(1.0))
    when(col("rn") >= 2, sqrt(variance))
  }

  /** All fbs_/fcf_/fis_ features in one window pass (memoized + persisted
    * per (session, dir): three statement queries + the score build share
    * one evaluation; the frame is small — one row per customer-quarter).
    * localCheckpoint (not persist), the signalFeatures discipline: this is
    * the ~400-column statement tree, and EVERY downstream query otherwise
    * re-analyzes/re-optimizes that whole logical plan before the cache
    * lookup even happens — round-17 profiling measured the model/bot
    * queries spending multi-second pure-driver gaps in exactly that walk.
    * The checkpoint truncates lineage to a scan; the frame is one row per
    * customer-quarter, so losing columnar cache pruning costs microseconds
    * while the planning win is seconds per consumer. */
  def full(spark: SparkSession, dir: String): DataFrame =
    graft.sqlx.FrameCache.getOrElseUpdate(graft.sqlx.FrameCache.key(spark, "stmt", dir))(
      build(spark, dir).transform(graft.sqlx.Lineage.truncate))

  /** Columns are computed GROUPED BY WINDOW PARTITIONING, not in reference
    * order: row-level ratios first, then every symbol-ordered window
    * (qoq/yoy/volatility) contiguously, then every (quarter, sector) rank,
    * then the (quarter, industry) rank, then row-level flags. Interleaved
    * in reference order, Catalyst planned 32 Window operators and 26
    * exchanges — the 123k-row frame re-shuffled between symbol and
    * quarter×sector partitioning ~13 times. Grouped, adjacent compatible
    * windows collapse to one pass per partitioning. Values are unchanged
    * (each column's expression DAG is identical); only the column order of
    * the raw frame differs, and every consumer selects by name. */
  private def build(spark: SparkSession, dir: String): DataFrame = {
    val qcol = Seq(col("fiscal_q"))
    base(spark, dir)
      // row-level ratios (transform_balance_sheet.py:206-244,
      // transform_cash_flow.py:222-299, transform_income_statement.py:222-276)
      .withColumn("fbs_current_ratio", sdiv(col("tca"), col("tcl")))
      .withColumn("fbs_quick_ratio", sdiv(col("tca") - col("inventory"), col("tcl")))
      .withColumn("fbs_cash_ratio", sdiv(col("cash"), col("tcl")))
      .withColumn("fbs_working_capital", col("tca") - col("tcl"))
      .withColumn("fbs_debt_to_equity", sdiv(col("total_liabilities"), col("equity")))
      .withColumn("fbs_debt_to_assets", sdiv(col("total_liabilities"), col("total_assets")))
      .withColumn("fbs_tangible_asset_ratio", sdiv(col("total_assets") - col("inventory"), col("total_assets")))
      .withColumn("fcf_free_cash_flow", col("fcf"))
      .withColumn("fcf_ocf_to_capex_ratio", sdiv(col("ocf"), col("capex")))
      .withColumn("fcf_cash_conversion_ratio", sdiv(col("ocf"), col("net_income")))
      .withColumn("fcf_capex_intensity", sdiv(col("capex"), col("revenue")))
      .withColumn("fcf_operating_cf_margin", sdiv(col("ocf"), col("revenue")))
      .withColumn("fis_gross_margin", sdiv(col("gross_profit"), col("revenue")))
      .withColumn("fis_operating_margin", sdiv(col("operating_income"), col("revenue")))
      .withColumn("fis_net_margin", sdiv(col("net_income"), col("revenue")))
      // one symbol-partitioned window pass: rn + every qoq/yoy/volatility
      .withColumn("rn", row_number().over(BySym))
      .withColumn("fbs_current_ratio_qoq_pct", pctChange(col("fbs_current_ratio"), 1))
      .withColumn("fbs_quick_ratio_qoq_pct", pctChange(col("fbs_quick_ratio"), 1))
      .withColumn("fbs_current_ratio_yoy_pct", pctChange(col("fbs_current_ratio"), 4))
      .withColumn("fbs_current_ratio_volatility", vol4(col("fbs_current_ratio")))
      .withColumn("fcf_operating_cf_qoq_pct", pctChange(col("ocf"), 1))
      .withColumn("fcf_free_cash_flow_qoq_pct", pctChange(col("fcf"), 1))
      .withColumn("fcf_operating_cf_yoy_pct", pctChange(col("ocf"), 4))
      .withColumn("fcf_free_cash_flow_yoy_pct", pctChange(col("fcf"), 4))
      .withColumn("fcf_operating_cf_volatility", vol4(col("ocf")))
      .withColumn("fis_revenue_qoq_pct", pctChange(col("revenue"), 1))
      .withColumn("fis_net_income_qoq_pct", pctChange(col("net_income"), 1))
      .withColumn("fis_revenue_yoy_pct", pctChange(col("revenue"), 4))
      .withColumn("fis_net_income_yoy_pct", pctChange(col("net_income"), 4))
      .withColumn("fis_revenue_volatility", vol4(col("revenue")))
      // one (quarter, sector) window pass: every sector percentile rank
      .withColumn("fbs_current_ratio_sector_rank", pctRank(col("fbs_current_ratio"), qcol :+ col("sector")))
      .withColumn("fcf_operating_cf_sector_rank", pctRank(col("ocf"), qcol :+ col("sector")))
      .withColumn("fcf_free_cash_flow_sector_rank", pctRank(col("fcf"), qcol :+ col("sector")))
      .withColumn("fis_net_margin_sector_rank", pctRank(col("fis_net_margin"), qcol :+ col("sector")))
      .withColumn("fis_operating_margin_sector_rank", pctRank(col("fis_operating_margin"), qcol :+ col("sector")))
      // one (quarter, industry) window pass
      .withColumn("fbs_current_ratio_industry_rank", pctRank(col("fbs_current_ratio"), qcol :+ col("industry")))
      // row-level flags
      .withColumn("fbs_liquidity_shock_flag",
        when(col("fbs_current_ratio_qoq_pct") < -0.2, 1).otherwise(0))
      .withColumn("fcf_negative_free_cash_flow_flag", when(col("fcf") < 0.0, 1).otherwise(0))
      .withColumn("fcf_cash_burn_flag", when(col("fcf") < 0.0 && col("ocf") < 0.0, 1).otherwise(0))
      .withColumn("fis_negative_net_income_flag", when(col("net_income") < 0.0, 1).otherwise(0))
      .withColumn("fis_revenue_decline_flag", when(col("fis_revenue_yoy_pct") < 0.0, 1).otherwise(0))
  }
}
