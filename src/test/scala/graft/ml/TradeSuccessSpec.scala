package graft.ml

import graft.SparkSpec

/** MLlib pipeline spec (reference: trade_success_predictor.py:124-294):
  * trains the GBT pipeline on sf0.001 features, predicts the held-out
  * symbol split, and checks the AUC is a valid, non-degenerate number. */
class TradeSuccessSpec extends SparkSpec {

  test("GBT trade-success pipeline trains and scores held-out symbols") {
    val (pred, auc) = TradeSuccess.trainAndEvaluate(spark, sf("sf0.001"))
    assert(pred.count() > 0)
    assert(!auc.isNaN && auc >= 0.0 && auc <= 1.0, s"auc = $auc")
    val cols = pred.columns.toSet
    assert(cols.contains("prediction") && cols.contains("probability"))
  }
}
