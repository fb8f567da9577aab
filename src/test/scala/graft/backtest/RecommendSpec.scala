package graft.backtest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Daily recommendation scorer (trading_bot/daily_signal_scorer.py:32-288):
  * the model-gated query's guarantees live here (tree splits aren't
  * SQL-portable); the sigmoid twin `daily_recommendations` is hash-checked
  * against its DuckDB oracle by the driver. */
class RecommendSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  private def gated = graft.SparkEntry.queries("daily_recommendations")(spark, dir)
  private def model = graft.SparkEntry.queries("daily_recommendations_model")(spark, dir)

  test("latest-buy dedup: one row per (symbol, strategy), all inside the lookback window") {
    val sigs = graft.signals.Strategies.all(
      graft.queries.SignalQueries.signalFeatures(spark, dir),
      ribbonPeriods = Seq(3, 5, 10, 20), trendSma = 20)
    val latest = Recommend.latestBuySignals(sigs, graft.queries.SignalQueries.signalFeatures(spark, dir))
    assert(latest.count() > 0)
    assert(latest.groupBy("symbol_id", "trade_strategy").count()
      .where(col("count") > 1).count() == 0, "duplicate (symbol, strategy) rows")
    val maxDate = sigs.where(col("buy_signal")).agg(max("date")).head.getDate(0)
    val windowOk = latest.where(
      datediff(lit(maxDate), col("date")) > Recommend.LookbackDays).count()
    assert(windowOk == 0, "row outside the lookback window")
    assert(latest.where(!col("buy_signal")).count() == 0, "non-BUY signal survived")
  }

  test("both queries enforce the quality and probability gates") {
    // the reference treats "no signals passed the probability filter" as a
    // valid empty result (ref :261-263) — on tiny sf0.001 the GBT scores the
    // whole latest window below the floor, so emptiness is asserted to be
    // CORRECT (no candidate ≥ floor) rather than forbidden
    for ((df, label) <- Seq((gated, "sigmoid"), (model, "model"))) {
      val rows = df.collect()
      assert(rows.forall(_.getAs[Double]("overall_quality_score") >= Recommend.MinQuality),
        s"$label: quality gate violated")
      assert(rows.forall(_.getAs[Double]("success_probability") >=
        graft.queries.RecommendQueries.ProbabilityFloor),
        s"$label: probability gate violated")
      // ranked by composite desc (reference :272-273)
      val comp = rows.map(_.getAs[Double]("composite_score")).toSeq
      assert(comp == comp.sortBy(-(_: Double)), s"$label: not ranked by composite")
    }
    assert(gated.count() > 0, "sigmoid twin: no recommendations")
  }

  test("model probabilities are genuine GBT outputs: filter ≡ filter-by-model-probability") {
    // rebuild the model path by hand from the fitted pipeline and compare
    val feats = graft.ml.TradeSuccess.scoringFrame(spark, dir)
    val sigs = graft.signals.Strategies.all(
        graft.queries.SignalQueries.signalFeatures(spark, dir),
        ribbonPeriods = Seq(3, 5, 10, 20), trendSma = 20)
      .withColumn("signal_strength", graft.sqlx.Exact.r4(col("signal_strength")))
    val latest = Recommend.latestBuySignals(sigs, graft.queries.SignalQueries.signalFeatures(spark, dir))
    val quality = Recommend.latestQuality(graft.fundamentals.QualityScores.scores(spark, dir))
      .select(col("symbol_id"), graft.sqlx.Exact.r4(col("overall_quality_score")).as("q"))
    val byHand = graft.ml.TradeSuccess.scoreFrame(
        graft.ml.TradeSuccess.fitted(spark, dir).model,
        latest.join(quality, Seq("symbol_id")).where(col("q") >= Recommend.MinQuality)
          .join(feats, Seq("symbol_id", "date")))
      .where(round(col("success_probability"), 6) >=
        graft.queries.RecommendQueries.ProbabilityFloor)
      .select(col("symbol_id"), col("date").as("signal_date"), col("trade_strategy"),
        round(col("success_probability"), 6).as("p"))
    val fromQuery = model.select(col("symbol_id"), col("signal_date"),
      col("trade_strategy"), col("success_probability").as("p"))
    assert(fromQuery.exceptAll(byHand).isEmpty && byHand.exceptAll(fromQuery).isEmpty,
      "model query != hand-built scored frame")
  }

  test("the two queries share the gating: model rows are a subset of the gated candidates") {
    // dropping the probability column, every model row's (symbol, strategy,
    // date, quality) must appear in the sigmoid twin's pre-probability base —
    // i.e. the model path changes WHICH rows pass only via the probability
    val modelKeys = model.select("symbol_id", "trade_strategy", "signal_date",
      "overall_quality_score", "signal_strength")
    val sigmoidBase = gated.select("symbol_id", "trade_strategy", "signal_date",
      "overall_quality_score", "signal_strength")
    // sigmoid gate (strength >= 50) can drop rows the model keeps, so compare
    // against the gate-free candidate set instead when that happens
    val missing = modelKeys.exceptAll(sigmoidBase)
    val sigs = graft.signals.Strategies.all(
        graft.queries.SignalQueries.signalFeatures(spark, dir),
        ribbonPeriods = Seq(3, 5, 10, 20), trendSma = 20)
      .withColumn("signal_strength", graft.sqlx.Exact.r4(col("signal_strength")))
    val candidates = Recommend.latestBuySignals(sigs, graft.queries.SignalQueries.signalFeatures(spark, dir))
      .select(col("symbol_id"), col("trade_strategy"), col("date").as("signal_date"),
        col("signal_strength"))
    assert(missing.join(candidates,
      Seq("symbol_id", "trade_strategy", "signal_date", "signal_strength"), "left_anti")
      .count() == 0, "model row not in the latest-buy candidate set")
  }
}
