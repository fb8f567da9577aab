package graft.queries

import org.apache.spark.sql.functions._
import graft.features.Ewm
import graft.sqlx.Exact.{lit17, r4}
import OracleSql._

/** ML feature-prep query (trade_success_predictor.py:124-294's
  * `prepare_features` stage): the deterministic, SQL-expressible selection
  * that feeds the GBT classifier — model training itself stays spec-tested
  * (TradeSuccessSpec AUC bound). The oracle recomputes all ten model
  * features (windowed + recursive) with the identical op DAG and applies
  * the same not-null row filter as `na.drop`. */
object MlQueries {

  private val mlTrainingFrame = Q(
    (s, d) => {
      val t = graft.ml.TradeSuccess.trainingFrame(s, d)
      t.select((Seq(col("symbol_id"), col("date"), col("label")) ++
        graft.ml.TradeSuccess.FeatureCols.map(c => r4(col(c)).as(c.stripPrefix("ohlcv_")))): _*)
        .orderBy("symbol_id", "date")
    }, {
      val b8 = lit17(Ewm.betaSpan(8)); val b21 = lit17(Ewm.betaSpan(21))
      val b12 = lit17(Ewm.betaSpan(12)); val b26 = lit17(Ewm.betaSpan(26))
      val b9 = lit17(Ewm.betaSpan(9)); val bw14 = lit17(Ewm.betaWilder(14))
      val bw10 = lit17(Ewm.betaWilder(10))
      val macdStep =
        s"(b.close + $b12 * r.n12)/(1.0 + $b12 * r.d12) - (b.close + $b26 * r.n26)/(1.0 + $b26 * r.d26)"
      val trStep = "greatest(b.high - b.low, abs(b.high - r.close), abs(b.low - r.close))"
      s"""WITH RECURSIVE $barsCte,
         |r AS (
         |  SELECT symbol_id, date, rn, high, low, close, volume,
         |    CAST(close AS DOUBLE) AS n8, CAST(1.0 AS DOUBLE) AS d8,
         |    CAST(close AS DOUBLE) AS n21, CAST(1.0 AS DOUBLE) AS d21,
         |    CAST(NULL AS DOUBLE) AS g14, CAST(NULL AS DOUBLE) AS l14,
         |    CAST(close AS DOUBLE) AS n12, CAST(1.0 AS DOUBLE) AS d12,
         |    CAST(close AS DOUBLE) AS n26, CAST(1.0 AS DOUBLE) AS d26,
         |    CAST(0.0 AS DOUBLE) AS ns, CAST(1.0 AS DOUBLE) AS ds,
         |    CAST(high - low AS DOUBLE) AS na10, CAST(1.0 AS DOUBLE) AS da10
         |  FROM b WHERE rn = 1
         |  UNION ALL
         |  SELECT b.symbol_id, b.date, b.rn, b.high, b.low, b.close, b.volume,
         |    b.close + $b8 * r.n8, 1.0 + $b8 * r.d8,
         |    b.close + $b21 * r.n21, 1.0 + $b21 * r.d21,
         |    CASE WHEN r.rn = 1 THEN greatest(b.close - r.close, 0.0)
         |         ELSE greatest(b.close - r.close, 0.0) + $bw14 * r.g14 END,
         |    CASE WHEN r.rn = 1 THEN greatest(r.close - b.close, 0.0)
         |         ELSE greatest(r.close - b.close, 0.0) + $bw14 * r.l14 END,
         |    b.close + $b12 * r.n12, 1.0 + $b12 * r.d12,
         |    b.close + $b26 * r.n26, 1.0 + $b26 * r.d26,
         |    ($macdStep) + $b9 * r.ns, 1.0 + $b9 * r.ds,
         |    ($trStep) + $bw10 * r.na10, 1.0 + $bw10 * r.da10
         |  FROM r JOIN b ON b.symbol_id = r.symbol_id AND b.rn = r.rn + 1
         |),
         |w AS (
         |  SELECT r.*,
         |    CASE WHEN rn >= 5 THEN ${decSum("close", 5)}/5 END AS sma_5v,
         |    CASE WHEN rn >= 10 THEN ${decSum("close", 10)}/10 END AS sma_10v,
         |    lag(close, 10) OVER ($bySymbol) AS prev10,
         |    MAX(high) ${win(14)} AS hh,
         |    MIN(low) ${win(14)} AS ll,
         |    CASE WHEN rn >= 20 THEN CAST(SUM(volume) ${win(20)} AS DOUBLE) / 20 END AS volume_sma_20,
         |    ${decSum("close", 20)} AS s1,
         |    ${decSum("close * close", 20)} AS s2,
         |    lead(close, 5) OVER ($bySymbol) AS fut5
         |  FROM r
         |),
         |g AS (
         |  SELECT w.*,
         |    s1 / 20.0 AS mid,
         |    SQRT(CASE WHEN (s2 - s1 * s1 / 20.0) / 19.0 > 0.0
         |              THEN (s2 - s1 * s1 / 20.0) / 19.0 ELSE 0.0 END) AS std
         |  FROM w
         |),
         |f AS (
         |  SELECT symbol_id, date,
         |    CASE WHEN sma_5v <> 0 THEN close / sma_5v END AS sma_5_ratio,
         |    CASE WHEN sma_10v <> 0 THEN close / sma_10v END AS sma_10_ratio,
         |    CASE WHEN prev10 <> 0 THEN (close - prev10) / prev10 * 100.0 END AS roc_10,
         |    CASE WHEN rn >= 14 AND hh - ll <> 0 THEN (hh - close) / (hh - ll) * -100.0 END AS willr_14,
         |    CASE WHEN volume_sma_20 <> 0 THEN CAST(volume AS DOUBLE) / volume_sma_20 END AS volume_ratio,
         |    CASE WHEN (CASE WHEN rn >= 20 THEN mid + 2.0 * std END) - (CASE WHEN rn >= 20 THEN mid - 2.0 * std END) <> 0
         |         THEN (close - (CASE WHEN rn >= 20 THEN mid - 2.0 * std END))
         |              / ((CASE WHEN rn >= 20 THEN mid + 2.0 * std END) - (CASE WHEN rn >= 20 THEN mid - 2.0 * std END)) END AS bb_position,
         |    CASE WHEN rn >= 15 AND g14 + l14 <> 0 THEN 100.0 * g14 / (g14 + l14) END AS rsi_14,
         |    (n12/d12 - n26/d26) - ns/ds AS macd_histogram,
         |    CASE WHEN n21/d21 <> 0 THEN (n8/d8)/(n21/d21) END AS ema_8_21_ratio,
         |    CASE WHEN close <> 0 THEN (CASE WHEN rn >= 10 THEN na10/da10 END)/close*100.0 END AS atr_10_pct,
         |    CASE WHEN close <> 0 THEN (fut5 - close) / close END AS pct5
         |  FROM g
         |)
         |SELECT symbol_id, date,
         |  CAST(CASE WHEN pct5 > 0 THEN 1 ELSE 0 END AS DOUBLE) AS label,
         |  ${rd("sma_5_ratio", "sma_5_ratio")},
         |  ${rd("sma_10_ratio", "sma_10_ratio")},
         |  ${rd("roc_10", "roc_10")},
         |  ${rd("willr_14", "willr_14")},
         |  ${rd("volume_ratio", "volume_ratio")},
         |  ${rd("bb_position", "bb_position")},
         |  ${rd("rsi_14", "rsi_14")},
         |  ${rd("macd_histogram", "macd_histogram")},
         |  ${rd("ema_8_21_ratio", "ema_8_21_ratio")},
         |  ${rd("atr_10_pct", "atr_10_pct")}
         |FROM f
         |WHERE sma_5_ratio IS NOT NULL AND sma_10_ratio IS NOT NULL
         |  AND roc_10 IS NOT NULL AND willr_14 IS NOT NULL
         |  AND volume_ratio IS NOT NULL AND bb_position IS NOT NULL
         |  AND rsi_14 IS NOT NULL AND macd_histogram IS NOT NULL
         |  AND ema_8_21_ratio IS NOT NULL AND atr_10_pct IS NOT NULL
         |ORDER BY symbol_id, date""".stripMargin
    })

  /** Model-scored trades, memoized: the fitted GBT's success probability on
    * every simulated trade with complete entry-date features. Shared by the
    * filter/top-25 queries and ModelScoringSpec. */
  def scoredTrades(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.sqlx.FrameCache.getOrElseUpdate(graft.sqlx.FrameCache.key(s, "scoredTrades", d))(
      graft.ml.TradeSuccess.scoreTrades(BacktestQueries.simulatedTrades(s, d), s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Probability threshold for the registered model filter. The reference
    * defaults to 0.8 on a model trained on real market outcomes
    * (filter_trades_by_prediction.py:29); on the synthetic testdata the
    * GBT's probabilities concentrate near 0.5, so the registered query
    * keeps the reference's ≥-threshold semantics at 0.5 to stay
    * non-degenerate. */
  val ModelThreshold = 0.5

  /** filter_trades_by_prediction.py:179-270 end-to-end with the REAL model:
    * probability-filter the simulated trades, then the reference's
    * per-strategy performance rollup (+ mean success probability, which its
    * report also prints). Rows-only: GBT split choices are not portable to
    * a SQL oracle; ModelScoringSpec asserts the filter ≡
    * filter-by-model-probability on the same frame and the AUC bound. */
  /** Probability-filter + per-strategy performance rollup over a scored
    * trade frame — shared by the in-session-fit query and its
    * loaded-model twin. */
  private def filterPerfRollup(scored: org.apache.spark.sql.DataFrame) = {
    val filtered = scored.where(col("success_probability") >= ModelThreshold)
    val avgProb = filtered.groupBy("trade_strategy")
      .agg(avg("success_probability").as("avg_success_probability"))
    graft.backtest.Metrics.perStrategy(filtered)
      .join(broadcast(avgProb), Seq("trade_strategy"))
      .orderBy(col("total_return").desc, col("trade_strategy"))
  }

  private val tradesFilterModel = Q(
    (s, d) => filterPerfRollup(scoredTrades(s, d)), None)

  /** The persistence twin (trade_success_predictor.py:403-415 saves,
    * filter_trades_by_prediction.py:43 loads): identical rollup, but every
    * probability comes from the SAVED-then-LOADED PipelineModel instead of
    * the in-session fit. Rows-only like the other model queries;
    * ModelScoringSpec asserts the loaded model's scores — and therefore
    * this query — are bit-identical to the in-session fit's. */
  private val tradesFilterModelLoaded = Q(
    (s, d) => {
      val f = graft.ml.TradeSuccess.loadedFitted(s, d)
      filterPerfRollup(graft.ml.TradeSuccess.scoreTradesWith(
        f.model, BacktestQueries.simulatedTrades(s, d), s, d))
    }, None)

  /** Model-scored top-25 report (create_top25_viz_input.py over model
    * probabilities instead of the sigmoid stand-in). TakeOrdered top-k —
    * no global sort shuffle. */
  private val topSignalsModel = Q(
    (s, d) => {
      scoredTrades(s, d)
        .orderBy(col("success_probability").desc, col("symbol_id"),
          col("entry_date"), col("trade_strategy"))
        .limit(25)
        .select("symbol_id", "entry_date", "trade_strategy",
          "success_probability", "pnl", "pnl_pct", "holding_days")
    }, None)

  /** Feature importances + train/held-out AUC
    * (trade_success_predictor.py:124-294's export). Deterministic schema:
    * (rank, feature, importance, auc_train, auc_test), 10 rows. */
  private val modelFeatureImportance = Q(
    (s, d) => graft.ml.TradeSuccess.featureImportances(s, d), None)

  val all: Map[String, Q] = Map(
    "ml_training_frame" -> mlTrainingFrame,
    "trades_filter_model" -> tradesFilterModel,
    "trades_filter_model_loaded" -> tradesFilterModelLoaded,
    "top_signals_model" -> topSignalsModel,
    "model_feature_importance" -> modelFeatureImportance)
}
