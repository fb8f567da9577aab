package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trade-success prediction (trade_success_predictor.py:124-294): the
  * reference trains an XGBoost classifier on feature rows to predict
  * forward-return direction; the Spark-native equivalent is an MLlib
  * Pipeline (VectorAssembler → GBTClassifier) trained distributed.
  *
  * Train/test split is by symbol hash (no temporal leakage across split —
  * a whole symbol is either train or test), AUC via
  * BinaryClassificationEvaluator. Seeded, deterministic.
  */
object TradeSuccess {
  val FeatureCols: Seq[String] = Seq(
    "ohlcv_sma_5_ratio", "ohlcv_sma_10_ratio", "ohlcv_roc_10",
    "ohlcv_willr_14", "ohlcv_volume_ratio", "ohlcv_bb_position",
    "ohlcv_rsi_14", "ohlcv_macd_histogram", "ohlcv_ema_8_21_ratio",
    "ohlcv_atr_10_pct")
  val LabelCol = "target_direction_5d"

  def trainingFrame(spark: SparkSession, dir: String): DataFrame = {
    // reuse the memoized signal feature frame (superset ladder — the model's
    // ten features are all present) instead of rebuilding bars + windows
    val feats = graft.features.Targets.withTargets(
      graft.queries.SignalQueries.signalFeatures(spark, dir))
    feats.na.drop(FeatureCols :+ LabelCol)
      .select((col(LabelCol).cast("double").as("label") +:
        col("symbol_id").as("symbol_id") +: col("date").as("date") +:
        FeatureCols.map(col)): _*)
  }

  def pipeline(maxIter: Int = 20): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(FeatureCols.toArray).setOutputCol("features")
    val gbt = new GBTClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(maxIter).setMaxDepth(4).setSeed(42L)
    new Pipeline().setStages(Array(assembler, gbt))
  }

  /** Train on ~80% of symbols, return (predictions on held-out, AUC). */
  def trainAndEvaluate(spark: SparkSession, dir: String): (DataFrame, Double) = {
    val data = trainingFrame(spark, dir)
    val test = data.where(pmod(hash(col("symbol_id")), lit(5)) === 0)
    val train = data.where(pmod(hash(col("symbol_id")), lit(5)) =!= 0)
    val model = pipeline().fit(train)
    val pred = model.transform(test)
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC").evaluate(pred)
    (pred, auc)
  }
}
