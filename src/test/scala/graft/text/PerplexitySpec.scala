package graft.text

import graft.SparkSpec
import java.math.{BigDecimal => JBig, RoundingMode}

/** Differential test of the bigram-LM scorer against a hand-rolled
  * single-node reference (same smoothing, same quantize-then-exact-sum
  * arithmetic), exercising both the seen-bigram path and the two unseen
  * smoothing paths (unseen bigram with seen context; fully unseen token). */
class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  /** Reference scorer: add-0.5 bigram LM trained on doc_id % 20 < 18. */
  private def ref(docs: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    def bigrams(t: String): Seq[(String, String)] = {
      val w = t.trim.split(" ").toSeq
      if (w.length < 2) Nil else w.zip(w.tail)
    }
    val train = docs.filter(_._1 % 20 < 18)
    val c12 = train.flatMap(d => bigrams(d._2)).groupBy(identity).map { case (k, g) => k -> g.size }
    val c1 = train.flatMap(d => bigrams(d._2)).groupBy(_._1).map { case (k, g) => k -> g.size }
    val v = train.flatMap(_._2.trim.split(" ")).filter(_.nonEmpty).distinct.size
    docs.flatMap { case (id, t) =>
      val bs = bigrams(t)
      if (bs.isEmpty) None
      else {
        val lpq = bs.map { b =>
          val p = (c12.getOrElse(b, 0).toDouble + 0.5) /
            (c1.getOrElse(b._1, 0).toDouble + 0.5 * v.toDouble)
          // JBig.valueOf (shortest decimal repr) mirrors Spark's round():
          // scala BigDecimal(double) routes through valueOf, NOT the exact
          // binary expansion `new BigDecimal(double)` — the two differ at
          // exact ...5 ties, the divergence class OracleSql.rnd documents
          JBig.valueOf(math.log(p)).setScale(10, RoundingMode.HALF_UP)
        }
        val sum = lpq.reduce(_ add _)
        val avg = sum.doubleValue() / bs.size.toDouble
        val r4 = JBig.valueOf(avg).setScale(4, RoundingMode.HALF_UP).doubleValue()
        Some(id -> (bs.size.toLong, r4))
      }
    }.toMap
  }

  test("matches the reference on seen, unseen-bigram, and unseen-token paths") {
    val docs = Seq(
      0L -> "a b a b",  // train: bigrams (a,b) x2, (b,a)
      1L -> "a b c",    // train: (a,b), (b,c)
      2L -> "q",        // train: single token, no bigrams -> absent from output
      18L -> "a b z",   // val: (b,z) unseen bigram, seen context b
      19L -> "z z")     // test: z fully unseen -> P = 0.5/(0.5*V)
    val got = Perplexity.scoreDocs(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = ref(docs)
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("low-quality flag fires exactly below the threshold") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val out = Perplexity.scoreDocs(docs).collect()
    out.foreach { r =>
      assert(r.getBoolean(3) == (r.getDouble(2) < Perplexity.LowQualityThreshold))
    }
    assert(out.length > 0)
  }
}
