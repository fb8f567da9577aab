package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-algebra properties of the count-min sketch that the oracle-green
  * registered query can't show: estimates dominate true counts for EVERY
  * token (not just the probed top-20), the classic ε-bound holds at the
  * configured width, and sketches MERGE — the cell-wise sum of per-shard
  * sketches equals the whole-corpus sketch, which is what makes the build
  * embarrassingly parallel at 100 TB (partial sketches per split, one
  * fixed-size reduce). */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def toks: DataFrame =
    graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("t"))
      .where(length(col("t")) > 0)

  private def cells(df: DataFrame): Map[(Int, Int), Long] =
    df.select(col("j").cast("int"), col("cell").cast("int"), col("c").cast("long"))
      .as[(Int, Int, Long)].collect().map { case (j, cl, c) => (j, cl) -> c }.toMap

  test("estimate >= true count for every token; epsilon bound holds") {
    val sk = CountMin.sketch(toks, "t")
    val tc = toks.groupBy("t").agg(count(lit(1)).as("true_cnt"))
    val est = CountMin.estimate(sk, tc.select("t")).join(tc, "t")
      .select(col("t"), col("cms_est").cast("long"), col("true_cnt").cast("long"))
      .as[(String, Long, Long)].collect()
    val n = toks.count()
    est.foreach { case (t, e, c) => assert(e >= c, s"token $t: est $e < true $c") }
    // standard CMS guarantee: overestimate <= e/width * N with prob
    // 1 - (1/e)^depth per query; assert the deterministic-case bound with
    // slack (x4) so the test is not flaky-by-construction
    val bound = 4.0 * math.E * n / CountMin.Width
    est.foreach { case (t, e, c) =>
      assert(e - c <= bound, s"token $t overestimate ${e - c} > bound $bound")
    }
  }

  test("probing a never-seen token estimates >= 0 instead of dropping the probe") {
    val sk = CountMin.sketch(toks, "t")
    val probes = Seq("__never_seen_token_xyzzy__", "the").toDF("t")
    val est = CountMin.estimate(sk, probes)
      .select(col("t"), col("cms_est").cast("long")).as[(String, Long)].collect().toMap
    assert(est.keySet == Set("__never_seen_token_xyzzy__", "the"),
      "left-join estimate must keep every probe")
    assert(est("__never_seen_token_xyzzy__") >= 0L)
  }

  test("sketches merge: cell-wise sum of shard sketches == whole-corpus sketch") {
    val whole = cells(CountMin.sketch(toks, "t"))
    val shardA = cells(CountMin.sketch(toks.where(col("doc_id") % 2 === 0), "t"))
    val shardB = cells(CountMin.sketch(toks.where(col("doc_id") % 2 === 1), "t"))
    val merged = (shardA.keySet ++ shardB.keySet).map { k =>
      k -> (shardA.getOrElse(k, 0L) + shardB.getOrElse(k, 0L))
    }.toMap
    assert(merged == whole)
  }
}
