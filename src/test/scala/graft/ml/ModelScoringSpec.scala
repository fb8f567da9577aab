package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-scored prediction surface (filter_trades_by_prediction.py:179-270,
  * trade_success_predictor.py:124-294): the registered queries score trades
  * with the REAL fitted GBT, so their guarantees live here instead of a SQL
  * oracle — AUC bound, filter ≡ filter-by-model-probability consistency,
  * and a deterministic importance export. */
class ModelScoringSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  test("fitted GBT fits the training split (train AUC bound), held-out AUC is sane") {
    val f = TradeSuccess.fitted(spark, dir)
    // the GBT must at least separate the data it was fit on — a model whose
    // train AUC is near 0.5 learned nothing and its scores are noise
    assert(f.aucTrain >= 0.6, s"train AUC = ${f.aucTrain}")
    assert(!f.aucTest.isNaN && f.aucTest >= 0.0 && f.aucTest <= 1.0,
      s"test AUC = ${f.aucTest}")
  }

  test("feature importances: 10 ranked rows, non-negative, summing to 1") {
    val imp = TradeSuccess.featureImportances(spark, dir).collect()
    assert(imp.length == TradeSuccess.FeatureCols.size)
    assert(imp.map(_.getAs[Int]("rank")).toSeq == (1 to imp.length))
    val vals = imp.map(_.getAs[Double]("importance"))
    assert(vals.forall(_ >= 0.0))
    assert(math.abs(vals.sum - 1.0) < 1e-6, s"sum = ${vals.sum}")
    // ranking is by descending importance (name tie-break)
    assert(vals.toSeq == vals.toSeq.sortBy(-_))
  }

  test("canonical importances (the published/oracle canon) agree with MLlib's " +
    "featureImportances to summation-order ulps + the 10dp quantization") {
    val f = TradeSuccess.fitted(spark, dir)
    val canon = TradeSuccess.canonicalImportances(f.gbt).toMap
    val mllib = TradeSuccess.FeatureCols.zip(f.gbt.featureImportances.toArray).toMap
    assert(canon.keySet == mllib.keySet)
    canon.foreach { case (feat, c) =>
      assert(math.abs(c - mllib(feat)) < 1e-8,
        s"$feat: canonical $c vs MLlib ${mllib(feat)}")
    }
    // and the serialized gain stats only name features the trees split on
    val splitFeats = GbtSql.gainStats(f.gbt).map(_._1).toSet
    assert(splitFeats.subsetOf(TradeSuccess.FeatureCols.indices.toSet))
    canon.foreach { case (feat, c) =>
      if (c > 0) assert(splitFeats.contains(TradeSuccess.FeatureCols.indexOf(feat)),
        s"$feat has importance $c but never splits")
    }
  }

  test("trades_filter_model output equals filtering the scored frame by model probability") {
    val scored = graft.queries.MlQueries.scoredTrades(spark, dir)
    assert(scored.count() > 0, "no simulated trade matched an entry-date feature row")
    // every probability is a genuine model output, not the sigmoid stand-in
    // the registered query thresholds the 6dp-canonical probability (the
    // engine-portable form its oracle replays) — mirror that here
    val expected = scored
      .where(round(col("success_probability"), 6) >= graft.queries.MlQueries.ModelThreshold)
      .groupBy("trade_strategy").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val query = graft.SparkEntry.queries("trades_filter_model")(spark, dir)
      .collect().map(r => r.getAs[String]("trade_strategy") -> r.getAs[Long]("total_trades")).toMap
    assert(query == expected, s"query=$query expected=$expected")
  }

  test("model scoring is reproducible: same trades, same probabilities") {
    // bypass the memoized frame: rebuild the scored trades from the cached
    // model and compare to the registered path row-for-row
    val again = TradeSuccess.scoreTrades(
      graft.queries.BacktestQueries.simulatedTrades(spark, dir), spark, dir)
      .select("symbol_id", "entry_date", "trade_strategy", "success_probability")
    val memo = graft.queries.MlQueries.scoredTrades(spark, dir)
      .select("symbol_id", "entry_date", "trade_strategy", "success_probability")
    assert(memo.exceptAll(again).isEmpty && again.exceptAll(memo).isEmpty)
  }

  test("saved+loaded pipeline scores bit-identically to the in-session fit") {
    val f = TradeSuccess.fitted(spark, dir)
    val loaded = TradeSuccess.loadedFitted(spark, dir)
    // metrics survive the roundtrip exactly
    assert(loaded.aucTrain == f.aucTrain && loaded.aucTest == f.aucTest)
    // probabilities from the loaded model are bit-identical — same tree
    // splits, same leaf weights (MLlib persists them losslessly)
    val frame = TradeSuccess.scoringFrame(spark, dir)
    val a = TradeSuccess.scoreFrame(f.model, frame)
      .select("symbol_id", "date", "success_probability")
    val b = TradeSuccess.scoreFrame(loaded.model, frame)
      .select("symbol_id", "date", "success_probability")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("trades_filter_model_loaded equals trades_filter_model row-for-row") {
    val live = graft.SparkEntry.queries("trades_filter_model")(spark, dir)
    val fromDisk = graft.SparkEntry.queries("trades_filter_model_loaded")(spark, dir)
    assert(live.exceptAll(fromDisk).isEmpty && fromDisk.exceptAll(live).isEmpty)
    assert(fromDisk.count() > 0)
  }

  test("top_signals_model returns the 25 highest-probability trades") {
    val top = graft.SparkEntry.queries("top_signals_model")(spark, dir).collect()
    assert(top.length <= 25 && top.nonEmpty)
    val probs = top.map(_.getAs[Double]("success_probability")).toSeq
    assert(probs == probs.sortBy(-_), "not ordered by probability desc")
    val minTop = probs.min
    val nAbove = graft.queries.MlQueries.scoredTrades(spark, dir)
      .where(round(col("success_probability"), 6) > minTop).count()
    assert(nAbove <= 25, s"$nAbove trades score above the reported top-25 floor")
  }
}
