package graft.sources

import graft.{PlanCheck, SparkSpec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketed tables must make symbol-keyed joins and aggregations
  * shuffle-free: the write pays the one shuffle, every read-side plan on
  * the bucket key skips its exchange. */
class BucketedTablesSpec extends SparkSpec {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    PlanCheck.executedNodes(df).count(_.isInstanceOf[ShuffleExchangeExec])

  test("join of two tables bucketed by the same key plans no shuffle") {
    val bars = graft.features.Bars.daily(graft.Tables.events(spark, sf("sf0.001")))
      .select("symbol_id", "date", "close", "volume")
    val feats = bars.groupBy("symbol_id")
      .agg(avg("close").as("avg_close"), count(lit(1)).as("n_days"))

    BucketedTables.write(bars, "bars_b", Seq("symbol_id"), numBuckets = 4,
      sortCols = Seq("symbol_id", "date"))
    BucketedTables.write(feats, "feats_b", Seq("symbol_id"), numBuckets = 4)

    val a = BucketedTables.read(spark, "bars_b")
    val b = BucketedTables.read(spark, "feats_b")
    val joined = a.join(b, "symbol_id")
    assert(shuffles(joined) == 0,
      s"bucketed equi-join should be shuffle-free:\n${joined.queryExecution.executedPlan}")
    // sanity: the same join on unbucketed frames DOES shuffle, so the
    // counter is proven able to see exchanges through AQE stage boundaries
    assert(shuffles(bars.join(feats, "symbol_id")) > 0,
      "control: unbucketed join should show shuffles to the counter")
    // same rows as the plain (shuffled) join
    val plain = bars.join(feats, "symbol_id")
    assert(joined.count() == plain.count())

    val agg = a.groupBy("symbol_id").agg(max("close"))
    assert(shuffles(agg) == 0,
      s"aggregation on the bucket key should be shuffle-free:\n${agg.queryExecution.executedPlan}")

    spark.sql("DROP TABLE IF EXISTS bars_b")
    spark.sql("DROP TABLE IF EXISTS feats_b")
  }
}
