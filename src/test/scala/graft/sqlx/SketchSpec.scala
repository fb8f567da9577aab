package graft.sqlx

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Error bounds for the sketch aggregations (sketch_event_stats): KMV
  * bottom-k distinct within its rsd of exact, sampled quantiles within the
  * sampling-rank tolerance. (The sketch's cross-engine bit-identity is the
  * registered query's DuckDB oracle; KmvSpec pins the operator semantics —
  * this spec keeps the accuracy-vs-exact contract the old HLL++ twin had.) */
class SketchSpec extends SparkSpec {

  test("sketch distinct/quantiles stay within their error bounds vs exact") {
    val ev = graft.Tables.events(spark, sf("sf0.01"))
    val approx = graft.SparkEntry.queries("sketch_event_stats")(spark, sf("sf0.01"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("users"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(exact.nonEmpty && exact.keySet == approx.keySet)
    exact.foreach { case (et, (users, p50, p95)) =>
      val (aUsers, aP50, aP95) = approx(et)
      val relErr = math.abs(aUsers - users).toDouble / users
      assert(relErr <= 0.06, s"$et KMV rel err $relErr (approx=$aUsers exact=$users)")
      // k=2048 bottom-k sampling: rank error σ ≈ √(q(1−q)/k) ≈ 1.1%; values
      // are dense uniform doubles, so a loose 2% value tolerance is generous
      // (at sf0.01 each group fits inside k, so the quantiles are exact)
      assert(math.abs(aP50 - p50) <= math.abs(p50) * 0.02 + 1e-6, s"$et p50 $aP50 vs $p50")
      assert(math.abs(aP95 - p95) <= math.abs(p95) * 0.02 + 1e-6, s"$et p95 $aP95 vs $p95")
    }
  }

  test("exact companion anchors the sketch query: same keys/counts, quantiles inside [min,max]") {
    val approx = graft.SparkEntry.queries("sketch_event_stats")(spark, sf("sf0.01"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    val exact = graft.SparkEntry.queries("sketch_event_stats_exact")(spark, sf("sf0.01"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (et, (nExact, minV, maxV)) =>
      val (nApprox, p50, p95) = approx(et)
      assert(nApprox == nExact, s"$et row counts diverge: $nApprox vs $nExact")
      assert(p50 >= minV && p50 <= maxV && p95 >= minV && p95 <= maxV,
        s"$et quantiles outside exact [min,max]")
    }
  }
}
