package graft.retrieval

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential test of RRF fusion against a single-node reference over the
  * real retrieval lists, plus the structural fusion contracts. */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def dec10(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(10, java.math.RoundingMode.HALF_UP)

  test("fused top-10 matches a single-node RRF over the same lists on sf0.001") {
    val sem = graft.ann.Cosine.topK(spark, sf("sf0.001"))
      .select(col("query_id"), col("vec_id").as("item_id"), col("rank"))
    val lex = graft.text.Bm25.moreLikeThis(spark, sf("sf0.001"), k = 10)
      .select(col("query_id"), col("doc_id").as("item_id"), col("rank"))
    val s = sem.as[(Long, Long, Int)].collect().toSeq
    val l = lex.as[(Long, Long, Int)].collect().toSeq

    // single-node reference: exact decimal add of 10dp-quantized terms,
    // rank on the exact sum with item_id tiebreak
    val sMap = s.map { case (q, i, r) => (q, i) -> r }.toMap
    val lMap = l.map { case (q, i, r) => (q, i) -> r }.toMap
    val want = (sMap.keySet ++ lMap.keySet).groupBy(_._1).toSeq.flatMap { case (q, keys) =>
      keys.toSeq.map { key =>
        val c1 = sMap.get(key).map(r => dec10(1.0 / (60.0 + r))).getOrElse(dec10(0.0))
        val c2 = lMap.get(key).map(r => dec10(1.0 / (60.0 + r))).getOrElse(dec10(0.0))
        (q, key._2, sMap.get(key), lMap.get(key), c1.add(c2))
      }.sortBy { case (_, i, _, _, sd) => (sd.negate, i) }(
        Ordering.Tuple2(Ordering.ordered[java.math.BigDecimal], Ordering.Long))
        .take(10).zipWithIndex
        .map { case ((qq, i, sr, lr, sd), idx) =>
          (qq, i, sr, lr, sd.doubleValue(), idx + 1) }
    }.sortBy(t => (t._1, t._6))

    val got = Fusion.rrf(sem, lex).orderBy("query_id", "rank")
      .as[(Long, Long, Option[Int], Option[Int], Double, Int)].collect().toSeq
      .map(t => (t._1, t._2, t._3, t._4, t._5, t._6))
    assert(got.nonEmpty)
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
  }

  test("an item in both lists outranks single-list items of equal best rank") {
    val sem = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("query_id", "item_id", "rank")
    val lex = Seq((0L, 10L, 2), (0L, 12L, 1)).toDF("query_id", "item_id", "rank")
    val got = Fusion.rrf(sem, lex, k = 3).orderBy("rank")
      .select("item_id").as[Long].collect().toSeq
    // item 10: 1/61 + 1/62 beats item 12's 1/61 and item 11's 1/62
    assert(got == Seq(10L, 12L, 11L))
  }
}
