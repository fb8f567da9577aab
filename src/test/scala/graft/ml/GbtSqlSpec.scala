package graft.ml

import graft.SparkSpec
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._

/** The generated-SQL scoring oracle ([[GbtSql]]) must reproduce MLlib's
  * ensemble scoring BIT-FOR-BIT — it is the DuckDB side of the
  * model-as-constant oracles, so any drift (tree-walk tie direction, margin
  * accumulation order, the probability formula's exact IEEE op DAG, literal
  * round-trip) would silently desync the driver's hash compare. Evaluating
  * the same SQL text through Spark's own parser pins everything except the
  * cross-engine exp/strtod behavior, which the oracle canonicalizes away
  * (6dp rounding, VARCHAR literals). */
class GbtSqlSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  test("generated scoring expression matches MLlib transform at the 6dp canon") {
    // MLlib's margin goes through netlib ddot, which accumulates the 20
    // tree·weight products with Math.fma in 4 lanes — a few-ulp difference
    // from any plain mul/add order, and unreproducible in SQL. The
    // registered queries therefore score through the expression on BOTH
    // engines; here we pin that the expression agrees with MLlib to ulps
    // on the margin and EXACTLY at the 6dp probability canon the queries
    // publish and threshold on.
    val f = TradeSuccess.fitted(spark, dir)
    val frame = TradeSuccess.scoringFrame(spark, dir)
    val marginSql = GbtSql.marginSql(f.gbt, i => TradeSuccess.FeatureCols(i))
    val scored = f.model.transform(frame)
      .withColumn("mllib_margin", vector_to_array(col("rawPrediction")).getItem(1))
      .withColumn("mllib_prob", vector_to_array(col("probability")).getItem(1))
      .withColumn("sql_margin", expr(marginSql))
      .withColumn("sql_prob", expr(GbtSql.probabilitySql(marginSql)))
    val rows = scored.select("mllib_margin", "mllib_prob", "sql_margin", "sql_prob").collect()
    assert(rows.nonEmpty)
    val badMargin = rows.filterNot { r =>
      val (a, b) = (r.getDouble(0), r.getDouble(2))
      math.abs(a - b) <= 1e-12 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
    }
    assert(badMargin.isEmpty,
      s"${badMargin.length}/${rows.length} margins beyond ulp tolerance; first: mllib=${badMargin.headOption.map(_.getDouble(0))} sql=${badMargin.headOption.map(_.getDouble(2))}")
    def p6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val badProb = rows.filterNot(r => p6(r.getDouble(1)) == p6(r.getDouble(3)))
    assert(badProb.isEmpty,
      s"${badProb.length}/${rows.length} probabilities differ at 6dp; first: mllib=${badProb.headOption.map(_.getDouble(1))} sql=${badProb.headOption.map(_.getDouble(3))}")
  }

  test("registered scoring path (scoreFrameExpr) equals the expression evaluated standalone") {
    val f = TradeSuccess.fitted(spark, dir)
    val frame = TradeSuccess.scoringFrame(spark, dir)
    val viaHelper = TradeSuccess.scoreFrameExpr(f.gbt, frame)
      .select("symbol_id", "date", "success_probability")
    val marginSql = GbtSql.marginSql(f.gbt, i => TradeSuccess.FeatureCols(i))
    val direct = frame.withColumn("success_probability",
        expr(GbtSql.probabilitySql(marginSql)))
      .select("symbol_id", "date", "success_probability")
    assert(viaHelper.exceptAll(direct).isEmpty && direct.exceptAll(viaHelper).isEmpty)
  }

  test("tree literals round-trip: every threshold, leaf and weight re-parses to identical bits") {
    val gbt = TradeSuccess.fitted(spark, dir).gbt
    def collectNodes(n: org.apache.spark.ml.tree.Node): Seq[Double] = n match {
      case l: org.apache.spark.ml.tree.LeafNode => Seq(l.prediction)
      case i: org.apache.spark.ml.tree.InternalNode =>
        i.split.asInstanceOf[org.apache.spark.ml.tree.ContinuousSplit].threshold +:
          (collectNodes(i.leftChild) ++ collectNodes(i.rightChild))
    }
    val all = gbt.trees.flatMap(t => collectNodes(t.rootNode)) ++ gbt.treeWeights
    all.foreach { d =>
      val lit = graft.sqlx.Exact.lit17(d)
      val digits = lit.stripPrefix("CAST('").takeWhile(_ != '\'')
      assert(java.lang.Double.parseDouble(digits) == d, s"$lit does not round-trip to $d")
    }
  }
}
