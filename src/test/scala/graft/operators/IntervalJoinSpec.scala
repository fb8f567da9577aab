package graft.operators

import graft.{PlanCheck, SparkSpec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

/** Binned interval join: exact vs the naive range join, and never a
  * nested-loop/cartesian plan. */
class IntervalJoinSpec extends SparkSpec {

  test("binned interval join equals the naive range join and plans no nested loop") {
    val d = sf("sf0.001")
    val points = graft.backtest.Enrich.tradeEntries(spark, d)
    val wins = graft.Tables.orders(spark, d)
      .select(make_date(year(col("o_orderdate")),
        (quarter(col("o_orderdate")) - 1) * 3 + 1, lit(1)).as("win_start"))
      .distinct()
      .withColumn("win_end", add_months(col("win_start"), 6))

    val naive = points.join(wins,
        col("entry_date") >= col("win_start") && col("entry_date") < col("win_end"))
      .select("symbol_id", "entry_date", "win_start")
      .collect().map(_.toString).sorted
    // odd binDays on purpose: cell boundaries never align with the windows
    val binned = IntervalJoin.pointInInterval(points, wins,
        "entry_date", "win_start", "win_end", binDays = 23)
      .select("symbol_id", "entry_date", "win_start")
    val got = binned.collect().map(_.toString).sorted
    assert(got.length == naive.length, s"rows: binned=${got.length} naive=${naive.length}")
    assert(got.sameElements(naive))
    assert(naive.length > points.count(), "windows should overlap (each point in 2 windows)")

    val bad = PlanCheck.allNodes(binned.queryExecution.executedPlan).collect {
      case j: BroadcastNestedLoopJoinExec => j
      case c: CartesianProductExec => c
    }
    assert(bad.isEmpty, s"binned interval join must not plan a nested loop: $bad")
  }
}
