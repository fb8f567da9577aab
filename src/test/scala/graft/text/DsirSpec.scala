package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("target-like source docs outweigh disjoint ones and the flag tracks the threshold") {
    // 18/19 are the target shard; 1 copies target content, 2 is disjoint
    val docs = Seq(
      18L -> "alpha beta gamma delta epsilon zeta eta theta",
      19L -> "alpha beta gamma delta iota kappa lambda mu",
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "one two three four five six seven eight"
    ).toDF("doc_id", "text")
    val got = Dsir.weights(docs, col("doc_id") % 20 >= 18)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(got.keySet == Set(1L, 2L)) // only source docs scored
    val (n1, w1, s1) = got(1L)
    val (n2, w2, s2) = got(2L)
    assert(n1 == 15 && n2 == 15) // 8 unigrams + 7 bigrams
    assert(w1 > w2, s"copy weight $w1 should exceed disjoint weight $w2")
    assert(s1 == (w1 > Dsir.SelectThreshold) && s2 == (w2 > Dsir.SelectThreshold))
  }

  test("weights are finite and feature counts are 2n-1 on the real corpus") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val nTok = docs.select(col("doc_id"),
      size(split(trim(col("text")), " ")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Dsir.weights(docs, col("doc_id") % 20 >= 18).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 2L * nTok(id) - 1, s"doc $id n_feats")
      assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite)
    }
  }
}
