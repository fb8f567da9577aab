package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._

/** The zero-join as-of operator must reproduce the broadcast-range-join
  * as-of (Enrich.joinFundamentals, oracle-green as
  * trades_fundamentals_join) exactly, while planning no join at all. */
class AsOfJoinSpec extends SparkSpec {

  private val cols = Seq("symbol_id", "entry_date", "trade_strategy",
    "signal_strength", "fiscal_q", "publication_date",
    "overall_quality_score", "is_high_quality")

  private def key(r: org.apache.spark.sql.Row): String =
    cols.indices.map(i => if (r.isNullAt(i)) "∅" else r.get(i).toString).mkString("|")

  test("union+window as-of equals the broadcast range-join as-of, with no join in the plan") {
    val d = sf("sf0.001")
    val trades = graft.backtest.Enrich.tradeEntries(spark, d)
    val scores = graft.fundamentals.QualityScores.scores(spark, d)

    val expected = graft.backtest.Enrich.joinFundamentals(trades, scores)
      .select(cols.map(col): _*).collect().map(key).sorted

    // same input preparation as joinFundamentals' right side
    val f = scores.select(
      col("symbol_id"), col("fiscal_q"),
      date_add(col("fiscal_q"), graft.backtest.Enrich.PublicationLagDays).as("publication_date"),
      round(col("overall_quality_score"), 4).as("overall_quality_score"),
      col("is_high_quality"))
    val joined = AsOfJoin.backward(
      trades, f, keys = Seq("symbol_id"),
      leftTime = "entry_date", rightTime = "publication_date",
      payload = Seq("fiscal_q", "publication_date", "overall_quality_score", "is_high_quality"),
      toleranceDays = Some(graft.backtest.Enrich.LookforwardDays))
    val actual = joined.select(cols.map(col): _*).collect().map(key).sorted

    assert(actual.length == expected.length,
      s"row count: asof=${actual.length} rangejoin=${expected.length}")
    assert(actual.sameElements(expected),
      s"first divergence: ${actual.zip(expected).find(p => p._1 != p._2)}")

    def joins(p: org.apache.spark.sql.execution.SparkPlan): Seq[BaseJoinExec] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => Nil
      }
      (p match { case j: BaseJoinExec => Seq(j); case _ => Nil }) ++
        (p.children ++ nested).flatMap(joins)
    }
    joined.collect()
    assert(joins(joined.queryExecution.executedPlan).isEmpty,
      "as-of union form must plan no join operator")
  }

  test("tolerance voids stale matches but keeps the left row") {
    import spark.implicits._
    val left = Seq((1L, java.sql.Date.valueOf("2024-06-01")),
                   (1L, java.sql.Date.valueOf("2024-01-02"))).toDF("k", "t")
    val right = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 7.0)).toDF("k", "rt", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt",
      payload = Seq("rt", "v"), toleranceDays = Some(30))
      .orderBy("t").collect()
    assert(out.length == 2)
    assert(!out(0).isNullAt(2) && out(0).getDouble(3) == 7.0) // within 30d
    assert(out(1).isNullAt(2) && out(1).isNullAt(3))          // expired
  }
}
