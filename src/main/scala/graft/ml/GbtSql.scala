package graft.ml

import org.apache.spark.ml.classification.GBTClassificationModel
import org.apache.spark.ml.tree.{ContinuousSplit, InternalNode, LeafNode, Node}
import graft.sqlx.Exact.lit17

/** Fitted-GBT scoring as ANSI SQL — the "model-as-constant" oracle half of
  * the reference's train-once/score-many workflow
  * (trade_success_predictor.py:403-415 persists the model;
  * filter_trades_by_prediction.py:43 treats it as a constant of every later
  * scoring query). Training stays spec-tested (TradeSuccessSpec's AUC bound,
  * ModelScoringSpec's save/load bit-identity); what a production user runs
  * daily is SCORING, and scoring a fixed tree ensemble is a pure expression:
  *
  *  - each regression tree is a nested `CASE WHEN feature <= threshold`
  *    walk ([[org.apache.spark.ml.tree.ContinuousSplit]].shouldGoLeft is
  *    `features(i) <= threshold`, ties left);
  *  - the ensemble margin is the trees' weighted sum accumulated
  *    left-to-right — the same sequential order as MLlib's
  *    `blas.dot(treePredictions, treeWeights)`;
  *  - P(label=1) is `1 - 1/(1 + exp(2·margin))`: GBTClassificationModel
  *    sets prob(0) = LogLoss.computeProbability(-margin) =
  *    1/(1+exp(2·margin)) and prob(1) = 1 - prob(0), and the SQL must
  *    mirror that exact IEEE op DAG, not the algebraically-equal
  *    1/(1+exp(-2·margin)).
  *
  * Every threshold / leaf value / tree weight rides through [[lit17]]
  * (VARCHAR→DOUBLE strtod — bit-exact round-trip in both engines).
  * GbtSqlSpec asserts the generated expressions reproduce MLlib's
  * rawPrediction and probability bit-for-bit on every scored row.
  */
object GbtSql {

  /** One tree's prediction as a SQL expression; `feat(i)` renders the SQL
    * for feature index i (VectorAssembler input order). */
  def treeSql(n: Node, feat: Int => String): String = n match {
    case l: LeafNode => lit17(l.prediction)
    case i: InternalNode =>
      val cond = i.split match {
        case c: ContinuousSplit => s"${feat(c.featureIndex)} <= ${lit17(c.threshold)}"
        case other =>
          // the ten model features are all continuous; a categorical split
          // would mean the pipeline changed shape under us — fail loudly so
          // the oracle degrades to rows-only instead of silently mis-scoring
          sys.error(s"non-continuous split not supported in SQL oracle: $other")
      }
      s"(CASE WHEN $cond THEN ${treeSql(i.leftChild, feat)} ELSE ${treeSql(i.rightChild, feat)} END)"
  }

  /** Ensemble margin: Σ tree_m(x) · w_m, left-associated in tree order. */
  def marginSql(m: GBTClassificationModel, feat: Int => String): String =
    m.trees.zip(m.treeWeights).map { case (t, w) =>
      s"${treeSql(t.rootNode, feat)} * ${lit17(w)}"
    }.mkString("(", " + ", ")")

  /** P(label=1) from a margin-valued SQL expression (see class doc for why
    * this exact formulation). */
  def probabilitySql(marginExpr: String): String =
    s"(1.0 - 1.0 / (1.0 + exp(2.0 * $marginExpr)))"

  /** Per-internal-node gain statistics of the ensemble, preorder:
    * (featureIndex, gain · weighted node count) — exactly the inputs of
    * MLlib's GBT `featureImportances` (TreeEnsembleModel.featureImportances
    * with perTreeNormalization = false: importance(f) = Σ_f gain·count /
    * Σ_all gain·count). Serialized into the feature-importance oracle the
    * same way the split thresholds ride into the scoring oracles — the
    * training-run statistics become constants of the published report.
    * `impurityStats` is package-private in the Scala API but public in
    * bytecode (it is part of the persisted model format, written to every
    * saved tree's parquet), so it's read reflectively. */
  def gainStats(m: GBTClassificationModel): Seq[(Int, Double)] = {
    def count(n: Node): Double = {
      val stats = n.getClass.getMethod("impurityStats").invoke(n)
      stats.getClass.getMethod("count").invoke(stats).asInstanceOf[Double]
    }
    def walk(n: Node): Seq[(Int, Double)] = n match {
      case _: LeafNode => Seq.empty
      case i: InternalNode =>
        (i.split.featureIndex, i.gain * count(i)) +:
          (walk(i.leftChild) ++ walk(i.rightChild))
    }
    m.trees.toSeq.flatMap(t => walk(t.rootNode))
  }

  /** 10dp half-up decimal string of a double's SHORTEST representation —
    * the literal form both engines sum exactly (DECIMAL(25,10) /
    * BigDecimal): the quantize-then-sum-exactly rule from
    * [[graft.sqlx.Exact]] applied to the serialized gain stats. */
  def dec10(x: Double): String =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(10, java.math.RoundingMode.HALF_UP).toPlainString
}
