package graft.fundamentals

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fundamental quality scores
  * (transform_fundamental_quality_scores.py:250-521): clip-normalize each
  * metric to 0-100 (fixed bounds per metric; FCF uses the 20th/80th
  * percentile of the whole column), combine into weighted component scores,
  * apply penalty multipliers for shock flags, and derive overall score +
  * quality flags.
  *
  * The FCF percentile bounds use an exact interpolated quantile (sorted
  * row_number + linear interpolation, the same formula as numpy's default) —
  * at 100 TB this is the documented place to switch to approx_percentile;
  * everything else is per-row arithmetic + the statements window pass.
  */
object QualityScores {

  /** clip(x, lo, hi) → (x-lo)/(hi-lo)·100, optional reverse; null passes
    * through (pandas clip/normalize keep NaN). */
  private def norm(x: Column, lo: Column, hi: Column, reverse: Boolean = false): Column = {
    val clipped = least(greatest(x, lo), hi)
    val scaled = (clipped - lo) / (hi - lo)
    val oriented = if (reverse) lit(1.0) - scaled else scaled
    when(x.isNotNull, oriented * 100.0)
  }
  private def norm(x: Column, lo: Double, hi: Double): Column = norm(x, lit(lo), lit(hi))
  private def normRev(x: Column, lo: Double, hi: Double): Column = norm(x, lit(lo), lit(hi), reverse = true)

  /** pandas row-mean (skips nulls; null iff all null). */
  private def meanOf(cols: Column*): Column = {
    val s = cols.map(c => coalesce(c, lit(0.0))).reduce(_ + _)
    val n = cols.map(c => when(c.isNull, 0.0).otherwise(1.0)).reduce(_ + _)
    when(n > 0.0, s / n)
  }

  private def clip100(c: Column): Column =
    when(c.isNotNull, least(greatest(c, lit(0.0)), lit(100.0)))

  /** Interpolated global quantile bounds of fcf (q=0.2 and 0.8) appended as
    * literal columns. The exact-and-distributed global-rank machinery now
    * lives in [[graft.operators.ExactQuantiles]] (promoted round 12 so the
    * curriculum tiering shares one implementation); the interpolation
    * formula and its bit-exactness contract with the DuckDB oracle's
    * franked-window replay are unchanged. */
  private[fundamentals] def withFcfBounds(df: DataFrame): DataFrame = {
    val bs = graft.operators.ExactQuantiles.interpolated(
      df.select(col("fcf_free_cash_flow").as("v")), Seq(0.2, 0.8))
    def dlit(o: Option[Double]): Column =
      o.map(lit).getOrElse(lit(null)).cast("double")
    df.withColumn("fcf_q20", dlit(bs(0))).withColumn("fcf_q80", dlit(bs(1)))
  }

  /** Score table over [[Statements.full]] output (memoized + persisted per
    * (session, dir) — three enrichment queries share one build). */
  def scores(spark: SparkSession, dir: String): DataFrame =
    graft.sqlx.FrameCache.getOrElseUpdate(graft.sqlx.FrameCache.key(spark, "scores", dir)) {
      import org.apache.spark.sql.functions.col
      // persist only the score projection: caching the wide statements frame
      // would defeat column pruning for every consumer
      build(spark, dir).select(
        (Seq("symbol_id", "fiscal_q",
          "bs_liquidity_score", "bs_leverage_score", "bs_asset_quality_score",
          "balance_sheet_quality_score", "cf_generation_score", "cf_efficiency_score",
          "cf_sustainability_score", "cash_flow_quality_score", "is_profitability_score",
          "is_margin_score", "is_growth_score", "income_statement_quality_score",
          "overall_quality_score", "is_high_quality", "is_investment_grade",
          "has_red_flags").map(col)): _*)
        // localCheckpoint truncates the score-ladder lineage so the five
        // enrichment consumers plan against a scan, not the quality tree
        // (Statements.full's rationale; round 17)
        .transform(graft.sqlx.Lineage.truncate)
    }

  private def build(spark: SparkSession, dir: String): DataFrame = {
    val f = withFcfBounds(Statements.full(spark, dir))
    val bsLiquidity = meanOf(
      norm(col("fbs_current_ratio"), 0.5, 2.5),
      norm(col("fbs_quick_ratio"), 0.3, 1.5))
    val bsLeverage = meanOf(
      normRev(col("fbs_debt_to_equity"), 0.0, 3.0),
      normRev(col("fbs_debt_to_assets"), 0.0, 0.8))
    val bsAsset = norm(col("fbs_tangible_asset_ratio"), 0.3, 0.95)
    val bsRaw = bsLiquidity * 0.30 + bsLeverage * 0.40 + bsAsset * 0.30
    val bsScore = when(col("fbs_liquidity_shock_flag") === 1, bsRaw * 0.8).otherwise(bsRaw)

    val cfGeneration = meanOf(
      norm(col("fcf_free_cash_flow"), col("fcf_q20"), col("fcf_q80")),
      norm(col("fcf_operating_cf_margin"), 0.05, 0.25))
    val cfEfficiency = meanOf(
      norm(col("fcf_ocf_to_capex_ratio"), 0.5, 3.0),
      norm(col("fcf_cash_conversion_ratio"), 0.5, 1.5))
    val cfSustainability = meanOf(norm(col("fcf_free_cash_flow_yoy_pct"), -0.20, 0.30))
    val cfRaw = cfGeneration * 0.40 + cfEfficiency * 0.30 + cfSustainability * 0.30
    val cfPenalized0 = when(col("fcf_negative_free_cash_flow_flag") === 1, cfRaw * 0.7).otherwise(cfRaw)
    val cfScore = when(col("fcf_cash_burn_flag") === 1, cfPenalized0 * 0.5).otherwise(cfPenalized0)

    val isProfitability = meanOf(norm(col("fis_net_margin"), 0.05, 0.25))
    val isMargin = meanOf(
      norm(col("fis_operating_margin"), 0.05, 0.30),
      norm(col("fis_gross_margin"), 0.20, 0.60))
    val isGrowth = meanOf(
      norm(col("fis_revenue_yoy_pct"), -0.05, 0.20),
      norm(col("fis_net_income_yoy_pct"), -0.20, 0.30))
    val isRaw = isProfitability * 0.40 + isMargin * 0.30 + isGrowth * 0.30
    val isPenalized0 = when(col("fis_negative_net_income_flag") === 1, isRaw * 0.6).otherwise(isRaw)
    val isScore = when(col("fis_revenue_decline_flag") === 1, isPenalized0 * 0.85).otherwise(isPenalized0)

    val overall = coalesce(clip100(bsScore), lit(50.0)) * 0.33 +
      coalesce(clip100(cfScore), lit(50.0)) * 0.33 +
      coalesce(clip100(isScore), lit(50.0)) * 0.34

    f.withColumn("bs_liquidity_score", clip100(bsLiquidity))
      .withColumn("bs_leverage_score", clip100(bsLeverage))
      .withColumn("bs_asset_quality_score", clip100(bsAsset))
      .withColumn("balance_sheet_quality_score", clip100(bsScore))
      .withColumn("cf_generation_score", clip100(cfGeneration))
      .withColumn("cf_efficiency_score", clip100(cfEfficiency))
      .withColumn("cf_sustainability_score", clip100(cfSustainability))
      .withColumn("cash_flow_quality_score", clip100(cfScore))
      .withColumn("is_profitability_score", clip100(isProfitability))
      .withColumn("is_margin_score", clip100(isMargin))
      .withColumn("is_growth_score", clip100(isGrowth))
      .withColumn("income_statement_quality_score", clip100(isScore))
      .withColumn("overall_quality_score", clip100(overall))
      .withColumn("is_high_quality", col("overall_quality_score") >= 70.0)
      .withColumn("is_investment_grade",
        coalesce(col("balance_sheet_quality_score") >= 50.0, lit(false)) &&
        coalesce(col("cash_flow_quality_score") >= 50.0, lit(false)) &&
        coalesce(col("income_statement_quality_score") >= 50.0, lit(false)))
      .withColumn("has_red_flags",
        col("fbs_liquidity_shock_flag") === 1 || col("fcf_cash_burn_flag") === 1 ||
        col("fis_negative_net_income_flag") === 1)
  }
}
