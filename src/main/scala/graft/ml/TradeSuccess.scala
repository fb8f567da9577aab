package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{GBTClassificationModel, GBTClassifier}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** Trade-success prediction (trade_success_predictor.py:124-294): the
  * reference trains an XGBoost classifier on feature rows to predict
  * forward-return direction; the Spark-native equivalent is an MLlib
  * Pipeline (VectorAssembler → GBTClassifier) trained distributed.
  *
  * Train/test split is by symbol hash (no temporal leakage across split —
  * a whole symbol is either train or test), AUC via
  * BinaryClassificationEvaluator. Seeded, deterministic.
  *
  * The fitted pipeline is the product surface, not just a spec artifact:
  * [[scoreTrades]] re-creates filter_trades_by_prediction.py:179-270's
  * predict_and_filter (model probabilities on backtested trades) and
  * [[featureImportances]] re-creates trade_success_predictor.py's
  * feature-importance export. Training is memoized per (session, dir) so
  * every model-scored query shares one fit.
  */
object TradeSuccess {
  val FeatureCols: Seq[String] = Seq(
    "ohlcv_sma_5_ratio", "ohlcv_sma_10_ratio", "ohlcv_roc_10",
    "ohlcv_willr_14", "ohlcv_volume_ratio", "ohlcv_bb_position",
    "ohlcv_rsi_14", "ohlcv_macd_histogram", "ohlcv_ema_8_21_ratio",
    "ohlcv_atr_10_pct")
  val LabelCol = "target_direction_5d"

  def trainingFrame(spark: SparkSession, dir: String): DataFrame = {
    // reuse the memoized feature table (superset ladder — the model's ten
    // features are all present) instead of rebuilding bars + windows
    val feats = graft.queries.FeatureQueries.featureTable(spark, dir)
    feats.na.drop(FeatureCols :+ LabelCol)
      .select((col(LabelCol).cast("double").as("label") +:
        col("symbol_id").as("symbol_id") +: col("date").as("date") +:
        FeatureCols.map(col)): _*)
  }

  /** Complete-feature rows WITHOUT requiring a label: scoring a candidate
    * needs the ten features but not the forward return — requiring the
    * label (as [[trainingFrame]] must) would silently drop every row in the
    * final `lead` horizon, which is exactly where live scoring candidates
    * (daily recommendations) sit. */
  def scoringFrame(spark: SparkSession, dir: String): DataFrame = {
    val feats = graft.queries.FeatureQueries.featureTable(spark, dir)
    feats.na.drop(FeatureCols)
      .select((col("symbol_id") +: col("date") +: FeatureCols.map(col)): _*)
  }

  def pipeline(maxIter: Int = 20): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(FeatureCols.toArray).setOutputCol("features")
    val gbt = new GBTClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(maxIter).setMaxDepth(4).setSeed(42L)
    new Pipeline().setStages(Array(assembler, gbt))
  }

  /** A fitted pipeline plus its train/held-out AUC. */
  final case class Fitted(model: PipelineModel, aucTrain: Double, aucTest: Double) {
    def gbt: GBTClassificationModel =
      model.stages.last.asInstanceOf[GBTClassificationModel]
  }

  private val fittedCache = TrieMap.empty[String, Fitted]

  private def isTest = pmod(hash(col("symbol_id")), lit(5)) === 0

  /** Fit once per (session, dir); every model-scored query and spec shares
    * the same fitted pipeline — training is the expensive step and the GBT
    * is seeded, so one fit is both cheaper and more consistent. */
  def fitted(spark: SparkSession, dir: String): Fitted =
    fittedCache.getOrElseUpdate(graft.sqlx.FrameCache.key(spark, "gbt", dir), {
      // GBT boosting runs ~3 jobs per iteration over the training frame;
      // with the frame far smaller than the raw data (na.drop + 10 columns)
      // the per-task scheduling overhead dominates on many small
      // partitions. Compact to a handful before the ~60 boosting jobs —
      // on a real cluster this is rows/1e6 partitions, never fewer tasks
      // than the frame needs.
      val parts = math.max(2, math.min(spark.sparkContext.defaultParallelism / 4,
        (trainingFrame(spark, dir).count() / 1000000L).toInt + 2))
      val data = trainingFrame(spark, dir).coalesce(parts)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val model = pipeline().fit(data.where(!isTest))
      val eval = new BinaryClassificationEvaluator()
        .setLabelCol("label").setRawPredictionCol("rawPrediction")
        .setMetricName("areaUnderROC")
      val aucTrain = eval.evaluate(model.transform(data.where(!isTest)))
      val aucTest = eval.evaluate(model.transform(data.where(isTest)))
      data.unpersist(false)
      Fitted(model, aucTrain, aucTest)
    })

  /** Train on ~80% of symbols, return (predictions on held-out, AUC). */
  def trainAndEvaluate(spark: SparkSession, dir: String): (DataFrame, Double) = {
    val f = fitted(spark, dir)
    (f.model.transform(trainingFrame(spark, dir).where(isTest)), f.aucTest)
  }

  /** Persist the fitted pipeline + its AUC metadata — the reference's
    * train-once/score-many workflow (trade_success_predictor.py:403-415
    * pickles the model; filter_trades_by_prediction.py:43 and
    * trading_bot/daily_signal_scorer.py re-load it to score without
    * retraining; the repo even ships models/trade_success_model.pkl).
    * MLlib's native writer is the Spark analog: metadata JSON + per-stage
    * parquet — metadata-sized I/O for a GBT regardless of training-data
    * scale, readable by any cluster session. */
  def save(f: Fitted, path: String): Unit = {
    f.model.write.overwrite().save(s"$path/pipeline")
    val spark = SparkSession.active
    import spark.implicits._
    Seq((f.aucTrain, f.aucTest)).toDF("auc_train", "auc_test")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/metrics")
  }

  /** Load a [[save]]d pipeline + metrics. */
  def load(spark: SparkSession, path: String): Fitted = {
    val m = PipelineModel.load(s"$path/pipeline")
    val r = spark.read.parquet(s"$path/metrics").head()
    Fitted(m, r.getAs[Double]("auc_train"), r.getAs[Double]("auc_test"))
  }

  private val loadedCache = TrieMap.empty[String, Fitted]

  /** Fit → save → load roundtrip, memoized per (session, dir): the loaded
    * model is the artifact a production scoring session starts from — the
    * registered `trades_filter_model_loaded` twin scores through THIS, and
    * ModelScoringSpec asserts loaded ≡ in-session probabilities
    * bit-for-bit. */
  def loadedFitted(spark: SparkSession, dir: String): Fitted =
    loadedCache.getOrElseUpdate(graft.sqlx.FrameCache.key(spark, "gbt-loaded", dir), {
      val path = s"${sys.props("java.io.tmpdir")}/graft-gbt-model-${graft.sqlx.PathTag.of(dir)}"
      save(fitted(spark, dir), path)
      load(spark, path)
    })

  /** Score an arbitrary frame carrying [[FeatureCols]] with the fitted
    * model via MLlib's transform: adds `success_probability` = P(label=1)
    * and drops the ML vector columns (parquet-unfriendly, and downstream
    * queries only need the probability). Spec/evaluation path — the
    * registered queries score through [[scoreFrameExpr]] instead. */
  def scoreFrame(model: PipelineModel, frame: DataFrame): DataFrame =
    model.transform(frame)
      .withColumn("success_probability",
        vector_to_array(col("probability")).getItem(1))
      .drop("features", "rawPrediction", "probability", "prediction")

  /** Score through the fitted ensemble rendered as ONE Column expression
    * ([[GbtSql]] — nested CASE tree walks + the weighted margin sum + the
    * logistic link): the registered queries' scoring path.
    *
    * Two reasons over MLlib's transform:
    *  - scale: transform is a per-row black-box UDF over an assembled
    *    vector (no codegen, vector boxing per row); a pure expression
    *    chain compiles into whole-stage codegen beside the rest of the
    *    query plan — the "no hot-path UDFs" rule applied to model scoring;
    *  - exactness: netlib's JVM ddot accumulates tree·weight products with
    *    Math.fma in 4 lanes, which no SQL engine can replay bit-for-bit.
    *    The expression form is plain IEEE mul/add in a fixed order — the
    *    SAME op DAG the DuckDB oracle runs, so Spark and the oracle agree
    *    bit-for-bit by construction, and GbtSqlSpec pins the expression ≡
    *    MLlib agreement at the 6dp canon the queries publish.
    */
  def scoreFrameExpr(gbt: GBTClassificationModel, frame: DataFrame): DataFrame =
    frame.withColumn("success_probability",
      org.apache.spark.sql.functions.expr(
        GbtSql.probabilitySql(GbtSql.marginSql(gbt, i => FeatureCols(i)))))

  /** Model-scored trades (filter_trades_by_prediction.py:179-215's
    * predict_and_filter, pre-threshold): join each simulated trade to its
    * entry-date feature row (inner — the model cannot score rows with
    * incomplete features; the reference zero-fills instead, which would
    * fabricate scores for unknown states) and attach the fitted GBT's
    * success probability. One broadcast-free equi-join on
    * (symbol_id, date) — both sides are already symbol-partitioned. */
  def scoreTrades(trades: DataFrame, spark: SparkSession, dir: String): DataFrame =
    scoreTradesWith(fitted(spark, dir), trades, spark, dir)

  /** [[scoreTrades]] with an explicit fitted pipeline — the load-then-score
    * half of the persistence workflow (a session that never trains). Takes
    * [[Fitted]] so the GBT-is-last-stage assumption lives only in
    * [[Fitted.gbt]]. */
  def scoreTradesWith(f: Fitted, trades: DataFrame,
                      spark: SparkSession, dir: String): DataFrame = {
    val feats = trainingFrame(spark, dir)
      .withColumnRenamed("date", "entry_date").drop("label")
    scoreFrameExpr(f.gbt, trades.join(feats, Seq("symbol_id", "entry_date")))
  }

  /** MLlib's GBT feature-importance definition (importance(f) =
    * Σ_f gain·count / Σ_all gain·count over the ensemble's internal nodes;
    * perTreeNormalization = false for GBT) replayed through the repo's
    * cross-engine decimal canon so the published values are BIT-IDENTICAL
    * to the DuckDB oracle's replay of the same serialized gain stats:
    * each per-node stat is quantized to 10dp (exact, order-free
    * DECIMAL(25,10) sums in both engines), the two sums divide as doubles
    * via the VARCHAR round-trip, and the ratio publishes at 10dp (+0.0
    * zero-sign canon). Differs from `gbt.featureImportances` only in
    * summation-order ulps and the 10dp quantization — TradeSuccessSpec
    * pins agreement within 1e-8. */
  def canonicalImportances(gbt: GBTClassificationModel): Seq[(String, Double)] = {
    import java.math.{BigDecimal => JBD}
    def parse(b: JBD): Double = java.lang.Double.parseDouble(b.toPlainString)
    val gains = GbtSql.gainStats(gbt).map { case (i, g) => (i, new JBD(GbtSql.dec10(g))) }
    val byFeat = gains.groupMapReduce(_._1)(_._2)(_.add(_))
    val all = parse(byFeat.values.reduce(_.add(_)))
    FeatureCols.indices.map { i =>
      val imp = byFeat.get(i)
        .map(s => java.lang.Double.parseDouble(GbtSql.dec10(parse(s) / all)) + 0.0)
        .getOrElse(0.0)
      (FeatureCols(i), imp)
    }
  }

  /** Feature-importance + AUC export (trade_success_predictor.py:124-294
    * exports exactly this report). The importance vector is driver-local
    * model metadata, so the ranking is computed driver-side — no global
    * window over data. Values are the [[canonicalImportances]] canon (the
    * oracle replays the serialized gain stats through the identical DAG). */
  def featureImportances(spark: SparkSession, dir: String): DataFrame = {
    val f = fitted(spark, dir)
    val ranked = canonicalImportances(f.gbt)
      .sortBy { case (name, imp) => (-imp, name) }.zipWithIndex
      .map { case ((name, imp), i) => (i + 1, name, imp, f.aucTrain, f.aucTest) }
    spark.createDataFrame(ranked)
      .toDF("rank", "feature", "importance", "auc_train", "auc_test")
  }
}
