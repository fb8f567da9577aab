package graft.operators

import graft.{PlanCheck, SparkSpec}
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

    assert(!PlanCheck.executedNodes(joined).exists(_.isInstanceOf[BaseJoinExec]),
      "as-of union form must plan no join operator")
  }

  test("a genuine NULL in the matched row's payload is NOT papered over by an older value") {
    import spark.implicits._
    val left = Seq((1L, java.sql.Date.valueOf("2024-03-01"))).toDF("k", "t")
    val right = Seq(
      (1L, java.sql.Date.valueOf("2024-01-01"), Some(5.0)),
      (1L, java.sql.Date.valueOf("2024-02-01"), None)).toDF("k", "rt", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt",
      payload = Seq("rt", "v")).collect()
    assert(out.length == 1)
    assert(out(0).getDate(2).toString == "2024-02-01", s"must match Feb row: ${out(0)}")
    assert(out(0).isNullAt(3), s"Feb row's NULL v must survive, not Jan's 5.0: ${out(0)}")
  }

  test("tolerance works without the right time column in payload") {
    import spark.implicits._
    val left = Seq((1L, java.sql.Date.valueOf("2024-06-01"))).toDF("k", "t")
    val right = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 7.0)).toDF("k", "rt", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt",
      payload = Seq("v"), toleranceDays = Some(30)).collect()
    assert(out.length == 1 && out(0).isNullAt(2), s"expired match must void: ${out(0)}")
  }

  test("payload colliding with a left column fails fast") {
    import spark.implicits._
    val left = Seq((1L, java.sql.Date.valueOf("2024-06-01"), 1.0)).toDF("k", "t", "v")
    val right = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 7.0)).toDF("k", "rt", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, Seq("k"), "t", "rt", payload = Seq("v"))
    }
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
