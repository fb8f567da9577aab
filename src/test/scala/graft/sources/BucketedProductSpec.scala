package graft.sources

import graft.{PlanCheck, SparkSpec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** The REGISTERED bucketed product query (bucketed_symbol_stats) must plan
  * its aggregations and join with zero shuffles — the bucketed write paid
  * the one-and-only shuffle. The registered entry adds a presentation sort
  * on top; the shuffle-free core is what scales. */
class BucketedProductSpec extends SparkSpec {

  test("bucketed_symbol_stats core plans zero ShuffleExchangeExec") {
    val core = graft.queries.BucketedQueries.symbolStats(spark, sf("sf0.001"))
    val shuffles = PlanCheck.executedNodes(core)
      .count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles == 0,
      s"expected shuffle-free bucketed rollup, found $shuffles exchanges:\n" +
        core.queryExecution.executedPlan)
    assert(core.count() > 0)
  }

  test("registered query returns one row per symbol with consistent counts") {
    val rows = graft.SparkEntry.queries("bucketed_symbol_stats")(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getAs[Int]("symbol_id") : Any)
    assert(ids.distinct.length == ids.length, "duplicate symbol rows")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") > 0)
      assert(r.getAs[Long]("n_strategies") >= 1)
    }
  }
}
