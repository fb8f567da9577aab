package graft.queries

import org.apache.spark.sql.functions._
import graft.features.Ewm
import graft.sqlx.Exact.{decSumAgg, lit17, r4}
import OracleSql._

/** ML feature-prep + model-scored queries (trade_success_predictor.py:124-294
  * and filter_trades_by_prediction.py:179-270).
  *
  * `ml_training_frame` oracle-checks the deterministic feature selection that
  * feeds the GBT. The model-SCORED queries carry generated oracles
  * ([[graft.ml.GbtSql]]): the session's fitted ensemble is serialized into
  * the SQL as a constant — exactly the shape of the reference's production
  * workflow, where the pickled model is a constant of every scoring run —
  * and DuckDB independently replays feature computation, tree walks, margin
  * accumulation, probability, thresholding, and the downstream rollup from
  * the raw parquet. Training itself stays spec-tested (TradeSuccessSpec AUC
  * bound, ModelScoringSpec save/load bit-identity, GbtSqlSpec SQL≡MLlib).
  */
object MlQueries {

  /** Model feature names with the `ohlcv_` prefix stripped — the column
    * names both the oracle CTEs and the dumped training frame use. */
  private[queries] val FeatShort = graft.ml.TradeSuccess.FeatureCols.map(_.stripPrefix("ohlcv_"))

  /** The ten model features + label, recomputed from raw events as a chain
    * of CTEs `${p}r` (recursive EMA/RSI/MACD/ATR state), `${p}w`/`${p}g`
    * (windowed sums), `${p}f` (feature expressions) and `${p}feat` (the
    * complete-feature row set — na.drop's not-null filter). Builds on the
    * shared bars CTE `b`, so it composes with both the standalone
    * `WITH RECURSIVE $barsCte` prelude (ml_training_frame) and simCte's
    * signal prelude (the model-scored trade queries) without name clashes.
    */
  private[queries] def mlFeatureCtes(p: String): String = {
    val b8 = lit17(Ewm.betaSpan(8)); val b21 = lit17(Ewm.betaSpan(21))
    val b12 = lit17(Ewm.betaSpan(12)); val b26 = lit17(Ewm.betaSpan(26))
    val b9 = lit17(Ewm.betaSpan(9)); val bw14 = lit17(Ewm.betaWilder(14))
    val bw10 = lit17(Ewm.betaWilder(10))
    val macdStep =
      s"(b.close + $b12 * ${p}r.n12)/(1.0 + $b12 * ${p}r.d12) - (b.close + $b26 * ${p}r.n26)/(1.0 + $b26 * ${p}r.d26)"
    val trStep = s"greatest(b.high - b.low, abs(b.high - ${p}r.close), abs(b.low - ${p}r.close))"
    s"""${p}r AS (
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
       |    b.close + $b8 * ${p}r.n8, 1.0 + $b8 * ${p}r.d8,
       |    b.close + $b21 * ${p}r.n21, 1.0 + $b21 * ${p}r.d21,
       |    CASE WHEN ${p}r.rn = 1 THEN greatest(b.close - ${p}r.close, 0.0)
       |         ELSE greatest(b.close - ${p}r.close, 0.0) + $bw14 * ${p}r.g14 END,
       |    CASE WHEN ${p}r.rn = 1 THEN greatest(${p}r.close - b.close, 0.0)
       |         ELSE greatest(${p}r.close - b.close, 0.0) + $bw14 * ${p}r.l14 END,
       |    b.close + $b12 * ${p}r.n12, 1.0 + $b12 * ${p}r.d12,
       |    b.close + $b26 * ${p}r.n26, 1.0 + $b26 * ${p}r.d26,
       |    ($macdStep) + $b9 * ${p}r.ns, 1.0 + $b9 * ${p}r.ds,
       |    ($trStep) + $bw10 * ${p}r.na10, 1.0 + $bw10 * ${p}r.da10
       |  FROM ${p}r JOIN b ON b.symbol_id = ${p}r.symbol_id AND b.rn = ${p}r.rn + 1
       |),
       |${p}w AS (
       |  SELECT ${p}r.*,
       |    CASE WHEN rn >= 5 THEN ${decSum("close", 5)}/5 END AS sma_5v,
       |    CASE WHEN rn >= 10 THEN ${decSum("close", 10)}/10 END AS sma_10v,
       |    lag(close, 10) OVER ($bySymbol) AS prev10,
       |    MAX(high) ${win(14)} AS hh,
       |    MIN(low) ${win(14)} AS ll,
       |    CASE WHEN rn >= 20 THEN CAST(SUM(volume) ${win(20)} AS DOUBLE) / 20 END AS volume_sma_20,
       |    ${decSum("close", 20)} AS s1,
       |    ${decSum("close * close", 20)} AS s2,
       |    lead(close, 5) OVER ($bySymbol) AS fut5
       |  FROM ${p}r
       |),
       |${p}g AS (
       |  SELECT ${p}w.*,
       |    s1 / 20.0 AS mid,
       |    SQRT(CASE WHEN (s2 - s1 * s1 / 20.0) / 19.0 > 0.0
       |              THEN (s2 - s1 * s1 / 20.0) / 19.0 ELSE 0.0 END) AS std
       |  FROM ${p}w
       |),
       |${p}f AS (
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
       |  FROM ${p}g
       |),
       |${p}feat AS MATERIALIZED (
       |  SELECT symbol_id, date,
       |    CAST(CASE WHEN pct5 > 0 THEN 1 ELSE 0 END AS DOUBLE) AS label,
       |    ${FeatShort.mkString(", ")}
       |  FROM ${p}f
       |  WHERE ${FeatShort.map(c => s"$c IS NOT NULL").mkString(" AND ")}
       |)""".stripMargin
  }

  private val mlTrainingFrame = Q(
    (s, d) => {
      val t = graft.ml.TradeSuccess.trainingFrame(s, d)
      t.select((Seq(col("symbol_id"), col("date"), col("label")) ++
        graft.ml.TradeSuccess.FeatureCols.map(c => r4(col(c)).as(c.stripPrefix("ohlcv_")))): _*)
        .orderBy("symbol_id", "date")
    },
    s"""WITH RECURSIVE $barsCte,
       |${mlFeatureCtes("")}
       |SELECT symbol_id, date, label,
       |  ${FeatShort.map(c => rd(c, c)).mkString(",\n  ")}
       |FROM feat
       |ORDER BY symbol_id, date""".stripMargin)

  // ------------------------------------------------------------ model scoring

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

  /** 6dp-canonical probability: thresholding and output both use this, so
    * the oracle's DuckDB `exp` (libm, ≤1 ulp off the JVM's) can never flip
    * a comparison — a flip would need the true probability within an ulp of
    * a 6dp rounding boundary. */
  private def p6 = round(col("success_probability"), 6)

  /** Probability-filter + per-strategy performance rollup over a scored
    * trade frame — shared by the in-session-fit query and its loaded-model
    * twin. Mirrors backtest_metrics' 4dp canon; the mean probability is a
    * decimal-exact sum of the 6dp probabilities (group-sum order differs
    * between engines; decimal addition doesn't care). */
  private def filterPerfRollup(scored: org.apache.spark.sql.DataFrame) = {
    val filtered = scored.withColumn("success_probability", p6)
      .where(col("success_probability") >= ModelThreshold)
    val avgProb = filtered.groupBy("trade_strategy")
      .agg(r4(decSumAgg(col("success_probability")) / count(lit(1)).cast("double"))
        .as("avg_success_probability"))
    BacktestQueries.perStrategyRounded(filtered)
      .join(broadcast(avgProb), Seq("trade_strategy"))
      .orderBy(col("total_return").desc, col("trade_strategy"))
  }

  /** Oracle prelude shared by the model-scored trade queries: full
    * simulation + ml feature chain + tree-scored probabilities.
    * `scored` = every simulated trade with complete entry-date features,
    * its margin, and the 6dp probability. A pure function of the fitted
    * ensemble — the data context only enters through which model was fit. */
  private def scoredTradesCtes(gbt: org.apache.spark.ml.classification.GBTClassificationModel): String = {
    val margin = graft.ml.GbtSql.marginSql(gbt, i => s"mf.${FeatShort(i)}")
    s"""${BacktestQueries.simCte},
       |${mlFeatureCtes("ml")},
       |marg AS (
       |  SELECT t.*, $margin AS margin
       |  FROM trades_all t JOIN mlfeat mf
       |    ON t.symbol_id = mf.symbol_id AND t.entry_date = mf.date
       |),
       |scored AS (
       |  SELECT marg.*,
       |         ${rnd(graft.ml.GbtSql.probabilitySql("margin"), 6)} AS success_probability
       |  FROM marg
       |)""".stripMargin
  }

  /** `filt` must be MATERIALIZED: DuckDB inlines plain CTEs per reference,
    * and `filt` is read by both `avgp` and the metrics chain — inlined, the
    * recursive simulation + serialized-ensemble margin expression is
    * replayed per reference, which exhausts DuckDB's memory at sf0.1. */
  private def filterRollupSql(gbt: org.apache.spark.ml.classification.GBTClassificationModel): String =
    s"""${scoredTradesCtes(gbt)},
       |filt AS MATERIALIZED (SELECT * FROM scored WHERE success_probability >= $ModelThreshold),
       |avgp AS (
       |  SELECT trade_strategy,
       |         CAST(ROUND(CAST(CAST(CAST(CAST(SUM(CAST(success_probability AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS VARCHAR) AS DECIMAL(38,20)), 4) + 0.0 AS DOUBLE) AS avg_success_probability
       |  FROM filt GROUP BY trade_strategy
       |),
       |${BacktestQueries.metricsCtes("filt", "m")},
       |met AS (
       |  ${BacktestQueries.metricsSelect("mdd")}
       |)
       |SELECT met.*, avgp.avg_success_probability
       |FROM met JOIN avgp USING (trade_strategy)
       |ORDER BY total_return DESC, trade_strategy""".stripMargin

  /** filter_trades_by_prediction.py:179-270 end-to-end with the REAL model:
    * probability-filter the simulated trades, then the reference's
    * per-strategy performance rollup (+ mean success probability, which its
    * report also prints). The oracle serializes the in-session fit's trees
    * (model-as-constant) and replays features → margins → probabilities →
    * filter → rollup in DuckDB from the raw parquet. */
  private val tradesFilterModel = Q.gen(
    (s, d) => filterPerfRollup(scoredTrades(s, d))) {
    (s, d) => filterRollupSql(graft.ml.TradeSuccess.fitted(s, d).gbt)
  }

  /** The persistence twin (trade_success_predictor.py:403-415 saves,
    * filter_trades_by_prediction.py:43 loads): identical rollup, but every
    * probability comes from the SAVED-then-LOADED PipelineModel instead of
    * the in-session fit — and so does the oracle's serialized ensemble, so
    * the roundtrip is checked tree-for-tree, not just row-for-row.
    * ModelScoringSpec additionally asserts loaded ≡ in-session
    * probabilities bit-for-bit. */
  private val tradesFilterModelLoaded = Q.gen(
    (s, d) => {
      val f = graft.ml.TradeSuccess.loadedFitted(s, d)
      filterPerfRollup(graft.ml.TradeSuccess.scoreTradesWith(
        f, BacktestQueries.simulatedTrades(s, d), s, d))
    }) {
    (s, d) => filterRollupSql(graft.ml.TradeSuccess.loadedFitted(s, d).gbt)
  }

  /** Model-scored top-25 report (create_top25_viz_input.py over model
    * probabilities instead of the sigmoid stand-in). TakeOrdered top-k —
    * no global sort shuffle. Ordered by the 6dp probability with a full
    * deterministic tiebreak, so the boundary of the 25 is engine-stable. */
  private val topSignalsModel = Q.gen(
    (s, d) => {
      scoredTrades(s, d).withColumn("success_probability", p6)
        .orderBy(col("success_probability").desc, col("symbol_id"),
          col("entry_date"), col("trade_strategy"))
        .limit(25)
        .select("symbol_id", "entry_date", "trade_strategy",
          "success_probability", "pnl", "pnl_pct", "holding_days")
    }) { (s, d) =>
    s"""${scoredTradesCtes(graft.ml.TradeSuccess.fitted(s, d).gbt)}
       |SELECT symbol_id, entry_date, trade_strategy,
       |       success_probability, pnl, pnl_pct, holding_days
       |FROM scored
       |ORDER BY success_probability DESC, symbol_id, entry_date, trade_strategy
       |LIMIT 25""".stripMargin
  }

  /** Feature importances + train/held-out AUC
    * (trade_success_predictor.py:124-294's export). Deterministic schema:
    * (rank, feature, importance, auc_train, auc_test), 10 rows.
    *
    * Oracle-green via the model-as-constant precedent extended to TRAINING
    * statistics: the fitted trees carry per-split impurity stats
    * (gain · node count — persisted in the saved model, not a runtime
    * internal), so the oracle serializes those rows as 10dp decimals
    * (GbtSql.gainStats / dec10) and independently replays MLlib's GBT
    * importance definition — Σ_f gain·count / Σ_all gain·count
    * (perTreeNormalization=false), exact decimal sums, VARCHAR-round-trip
    * division, 10dp publication — plus the (importance DESC, feature)
    * ranking. The Spark side computes the identical canon
    * (TradeSuccess.canonicalImportances), so the compare is bit-exact.
    * The AUCs are training-run constants of the same fit and ride as
    * lit17 literals (like the tree thresholds in every scoring oracle);
    * TradeSuccessSpec pins their [0,1] bounds and the canon ≡ MLlib
    * agreement. */
  private val modelFeatureImportance = Q.gen(
    (s, d) => graft.ml.TradeSuccess.featureImportances(s, d)) { (s, d) =>
    val f = graft.ml.TradeSuccess.fitted(s, d)
    val gains = graft.ml.GbtSql.gainStats(f.gbt)
      .map { case (i, g) => s"($i, CAST('${graft.ml.GbtSql.dec10(g)}' AS DECIMAL(25,10)))" }
      .mkString(",\n    ")
    val feats = graft.ml.TradeSuccess.FeatureCols.zipWithIndex
      .map { case (n, i) => s"($i, '$n')" }.mkString(", ")
    s"""WITH gains(fidx, g) AS (VALUES
       |    $gains),
       |feats(fidx, feature) AS (VALUES $feats),
       |fsum AS (SELECT fidx, SUM(g) AS s FROM gains GROUP BY fidx),
       |alls AS (SELECT SUM(g) AS a FROM gains),
       |imp AS (
       |  SELECT feats.feature,
       |         COALESCE(${rnd("CAST(CAST(fsum.s AS VARCHAR) AS DOUBLE) / CAST(CAST(alls.a AS VARCHAR) AS DOUBLE)", 10)}, 0.0) AS importance
       |  FROM feats LEFT JOIN fsum USING (fidx) CROSS JOIN alls
       |)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY importance DESC, feature) AS INTEGER) AS rank,
       |       feature, importance,
       |       ${lit17(f.aucTrain)} AS auc_train,
       |       ${lit17(f.aucTest)} AS auc_test
       |FROM imp
       |ORDER BY rank""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "ml_training_frame" -> mlTrainingFrame,
    "trades_filter_model" -> tradesFilterModel,
    "trades_filter_model_loaded" -> tradesFilterModelLoaded,
    "top_signals_model" -> topSignalsModel,
    "model_feature_importance" -> modelFeatureImportance)
}
