package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.backtest.{Enrich, Recommend}
import graft.etl.SymbolUniverse
import graft.sqlx.Exact.r4
import OracleSql._

/** Model-gated daily recommendation scorer
  * (trading_bot/daily_signal_scorer.py:32-288) as registered queries:
  *
  *  - `daily_recommendations` — the full quality-gate → probability-gate →
  *    composite-rank pipeline with the deterministic sigmoid probability
  *    stand-in, hash-checked against a DuckDB oracle that mirrors every
  *    step (the green twin proving the gating/ranking plumbing).
  *  - `daily_recommendations_model` — the same pipeline with the trained
  *    GBT's success probability (the reference's `model.predict_proba`,
  *    ref :254), rows-only: tree split choices aren't SQL-portable.
  *    DailyRecommendSpec proves the two queries share the gating logic and
  *    that the model filter equals filter-by-model-probability.
  */
object RecommendQueries {

  /** Probability floor for the registered queries. The reference defaults
    * to 0.80 (ref :36) on a model trained on real market outcomes; on the
    * synthetic testdata both the GBT's probabilities and the sigmoid
    * stand-in concentrate near 0.5, so the registered queries keep the
    * ≥-threshold semantics at 0.5 to stay non-degenerate (same adaptation
    * as MlQueries.ModelThreshold). */
  val ProbabilityFloor = 0.5

  /** Latest BUY signals × latest quality (gated) × universe names/sector —
    * everything before the probability step, shared by both queries. */
  private def gatedBase(s: SparkSession, d: String): DataFrame = {
    val features = SignalQueries.signalFeatures(s, d)
    val sigs = SignalQueries.allSignals(s, d)
      .withColumn("signal_strength", r4(col("signal_strength")))
    val latest = Recommend.latestBuySignals(sigs, features)
    // quality + universe are per-symbol tables — broadcast, no shuffle of
    // the signal side beyond the latest-signal dedup
    val quality = Recommend.latestQuality(graft.fundamentals.QualityScores.scores(s, d))
      .select(col("symbol_id"), r4(col("overall_quality_score")).as("overall_quality_score"))
    val uni = SymbolUniverse.universe(s, d)
      .select(col("symbol_id"), col("symbol"), col("segment").as("sector"))
    latest
      .join(broadcast(quality), Seq("symbol_id"), "left")
      .where(col("overall_quality_score") >= Recommend.MinQuality)
      .join(broadcast(uni), Seq("symbol_id"), "left")
  }

  private val outCols = Seq("symbol_id", "symbol", "signal_date", "trade_strategy",
    "close", "success_probability", "signal_strength", "overall_quality_score",
    "composite_score", "sector", "volume")

  private def finish(withProb: DataFrame): DataFrame =
    withProb
      .where(col("success_probability") >= ProbabilityFloor)
      .withColumn("composite_score", r4(Recommend.composite(
        col("success_probability"), col("signal_strength"), col("overall_quality_score"))))
      .withColumnRenamed("date", "signal_date")
      .select(outCols.map(col): _*)
      .orderBy(col("composite_score").desc, col("symbol_id"), col("trade_strategy"))

  /** Oracle CTE chain up to `gated` (latest BUY signals × quality gate ×
    * universe) — shared by the sigmoid query and the model-scored twin. */
  private val gatedCtes: String =
    s"""${SignalQueries.featCte},
       |sigall AS MATERIALIZED (
       |  ${SignalQueries.allScoredSubquery}
       |),
       |latestd AS (SELECT MAX(date) AS latest_date FROM sigall WHERE buy_signal),
       |lastsig AS (
       |  SELECT * EXCLUDE (rn, latest_date) FROM (
       |    SELECT s.*, l.latest_date,
       |           row_number() OVER (PARTITION BY s.symbol_id, s.trade_strategy
       |                              ORDER BY s.date DESC) AS rn
       |    FROM sigall s JOIN latestd l ON s.date >= l.latest_date - ${Recommend.LookbackDays}
       |    WHERE s.buy_signal
       |  ) WHERE rn = 1
       |),
       |withpx AS (
       |  SELECT ls.symbol_id, ls.date, ls.trade_strategy, ls.signal_strength,
       |         b2.close, b2.volume
       |  FROM lastsig ls JOIN b b2 ON ls.symbol_id = b2.symbol_id AND ls.date = b2.date
       |),
       |${FundamentalQueries.scoresPrelude.stripPrefix("WITH ")},
       |lastq AS (
       |  SELECT symbol_id AS q_symbol_id, overall_quality_score FROM (
       |    SELECT symbol_id,
       |           CAST(ROUND(CAST(CAST(overall_quality_score AS VARCHAR) AS DECIMAL(38,20)), 4) + 0.0 AS DOUBLE) AS overall_quality_score,
       |           row_number() OVER (PARTITION BY symbol_id ORDER BY fiscal_q DESC) AS rn
       |    FROM scores
       |  ) WHERE rn = 1
       |),
       |${BacktestQueries.universeCte},
       |gated AS (
       |  SELECT w.*, q.overall_quality_score, u.symbol, u.segment AS sector
       |  FROM withpx w
       |  LEFT JOIN lastq q ON w.symbol_id = q.q_symbol_id
       |  LEFT JOIN universe u ON w.symbol_id = u.symbol_id
       |  WHERE q.overall_quality_score >= ${Recommend.MinQuality}
       |)""".stripMargin

  /** Probability gate → composite rank → final projection, from a `probd`
    * CTE carrying `gated.*` + `success_probability` — shared epilogue. */
  private val finishSql: String =
    s"""SELECT symbol_id, symbol, date AS signal_date, trade_strategy, close,
       |       success_probability, signal_strength, overall_quality_score,
       |       ${rd("success_probability * 0.6 + signal_strength / 100.0 * 0.2 + overall_quality_score / 100.0 * 0.2", "composite_score")},
       |       sector, volume
       |FROM probd WHERE success_probability >= $ProbabilityFloor
       |ORDER BY composite_score DESC, symbol_id, trade_strategy""".stripMargin

  private val dailyRecommendations = Q(
    (s, d) => finish(gatedBase(s, d)
      .withColumn("success_probability", Enrich.successProbability(col("signal_strength")))),
    s"""$gatedCtes,
       |probd AS (
       |  SELECT gated.*,
       |         CAST(ROUND(CAST(CAST(1.0 / (1.0 + exp(-(signal_strength - 50.0) / 20.0)) AS VARCHAR) AS DECIMAL(38,20)), 6) AS DOUBLE) + 0.0 AS success_probability
       |  FROM gated
       |)
       |$finishSql""".stripMargin)

  /** The reference's actual scorer: the trained GBT's probability on each
    * candidate's signal-date feature row (ref :245-259). Inner join to the
    * complete-feature frame — the model can't score rows with missing
    * features (the reference zero-fills, fabricating scores for unknown
    * states; we skip those candidates instead, same stance as
    * TradeSuccess.scoreTrades). The oracle serializes the session's fitted
    * trees ([[graft.ml.GbtSql]], model-as-constant) and replays the whole
    * gate → score → rank pipeline in DuckDB from the raw parquet. */
  private val dailyRecommendationsModel = Q.gen(
    (s, d) => {
      val feats = graft.ml.TradeSuccess.scoringFrame(s, d)
      val scored = graft.ml.TradeSuccess.scoreFrameExpr(
        graft.ml.TradeSuccess.fitted(s, d).gbt,
        gatedBase(s, d).join(feats, Seq("symbol_id", "date")))
      finish(scored.withColumn("success_probability",
        round(col("success_probability"), 6)))
    }) { (s, d) =>
    val margin = graft.ml.GbtSql.marginSql(
      graft.ml.TradeSuccess.fitted(s, d).gbt, i => s"mf.${MlQueries.FeatShort(i)}")
    s"""$gatedCtes,
       |${MlQueries.mlFeatureCtes("ml")},
       |mmarg AS (
       |  SELECT gated.*, $margin AS margin
       |  FROM gated JOIN mlfeat mf
       |    ON gated.symbol_id = mf.symbol_id AND gated.date = mf.date
       |),
       |probd AS (
       |  SELECT * EXCLUDE (margin),
       |         ${OracleSql.rnd(graft.ml.GbtSql.probabilitySql("margin"), 6)} AS success_probability
       |  FROM mmarg
       |)
       |$finishSql""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "daily_recommendations" -> dailyRecommendations,
    "daily_recommendations_model" -> dailyRecommendationsModel)
}
