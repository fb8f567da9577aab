package graft.backtest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trade/signal enrichment (join_fundamentals_to_trades.py:49-185,
  * filter_trades_by_prediction.py:179-270, daily_signal_scorer.py:53-330):
  *
  *  - publication-lag as-of join: each trade matches the most recent
  *    fundamental score published before its entry date and still inside the
  *    lookforward window — a range join resolved as broadcast-join +
  *    keep-latest-publication window (fundamentals are per-symbol-quarter,
  *    tiny next to trades at scale; no lookahead bias)
  *  - prediction filter: success probability (deterministic logistic of
  *    signal strength standing in for the model score) thresholds trades,
  *    then per-strategy performance rollup
  *  - daily signal scorer: recent buy signals joined to the symbol universe
  *    and their as-of quality score, composite-scored and ranked per day.
  */
object Enrich {
  val PublicationLagDays = 45
  val LookforwardDays = 90

  /** Deterministic trade-entry table for the enrichment queries, derived
    * from `orders` so entry dates share the fundamentals' fiscal-date domain
    * (SURVEY.md §1.1; the simulator's trades are golden-tested separately —
    * events dates and order dates live in disjoint synthetic ranges). */
  def tradeEntries(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("symbol_id"),
        col("o_orderdate").cast("date").as("entry_date"))
      .agg((max(col("o_orderkey")) % 100).cast("double").as("signal_strength"))
      .withColumn("trade_strategy", lit("orders_flow"))

  /** As-of join of quality scores to trades. */
  def joinFundamentals(trades: DataFrame, scores: DataFrame,
                       lagDays: Int = PublicationLagDays,
                       windowDays: Int = LookforwardDays): DataFrame = {
    // scores are 4dp-rounded at this boundary: the score pipeline is equal
    // across engines at 4dp (oracle-proven) but not bit-identical raw
    val f = scores.select(
      col("symbol_id"), col("fiscal_q"),
      date_add(col("fiscal_q"), lagDays).as("publication_date"),
      date_add(date_add(col("fiscal_q"), lagDays), windowDays).as("valid_until_date"),
      round(col("overall_quality_score"), 4).as("overall_quality_score"),
      round(col("balance_sheet_quality_score"), 4).as("balance_sheet_quality_score"),
      round(col("cash_flow_quality_score"), 4).as("cash_flow_quality_score"),
      round(col("income_statement_quality_score"), 4).as("income_statement_quality_score"),
      col("is_high_quality"), col("is_investment_grade"), col("has_red_flags"))
    val joined = trades.join(broadcast(f),
      trades("symbol_id") === f("symbol_id") &&
        f("publication_date") <= trades("entry_date") &&
        trades("entry_date") < f("valid_until_date"), "left")
      .drop(f("symbol_id"))
    val w = Window.partitionBy(trades("symbol_id"), col("entry_date"), col("trade_strategy"))
      .orderBy(col("publication_date").desc_nulls_last)
    joined.withColumn("rnk", row_number().over(w)).where(col("rnk") === 1).drop("rnk")
  }

  /** Deterministic stand-in for the model score: logistic of strength. */
  def successProbability(strength: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(lit(1.0) / (lit(1.0) + exp(-(strength - lit(50.0)) / lit(20.0))), 6)

  /** Filter by prediction + per-strategy rollup (filter_trades_by_prediction). */
  def filterByPrediction(enriched: DataFrame, threshold: Double = 0.6): DataFrame =
    enriched
      .withColumn("success_probability", successProbability(col("signal_strength")))
      .where(col("success_probability") >= threshold)
      .groupBy("trade_strategy").agg(
        count(lit(1)).as("n_trades"),
        sum(graft.sqlx.Exact.dec(col("signal_strength"))).cast("double").as("sum_strength"),
        sum(when(col("is_high_quality"), 1L).otherwise(0L)).as("n_high_quality"),
        sum(when(col("overall_quality_score").isNotNull, 1L).otherwise(0L)).as("n_with_fundamentals"))

  /** Daily signal scorer: composite of strength and as-of quality, ranked
    * per day (daily_signal_scorer.py). */
  def dailyScores(enriched: DataFrame, universe: DataFrame): DataFrame = {
    val withScore = enriched
      .join(broadcast(universe.select(col("symbol_id"), col("symbol"))), Seq("symbol_id"), "left")
      .withColumn("composite_score",
        col("signal_strength") * 0.5 + coalesce(col("overall_quality_score"), lit(50.0)) * 0.5)
    withScore.withColumn("day_rank",
      row_number().over(Window.partitionBy("entry_date")
        .orderBy(col("composite_score").desc, col("symbol_id"))))
  }
}
