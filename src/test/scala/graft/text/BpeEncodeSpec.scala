package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential test of the distributed merge-APPLY path
  * (Bpe.encodeWords) against a single-node encoder running the SAME
  * learned merges: full subword sequences per word, and the per-doc
  * count rollup the registered `corpus_bpe_encode` query ships. */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  /** Single-node Sennrich encode: apply each merge everywhere in the word,
    * in learned order, leftmost non-overlapping per pass (mirrors
    * BpeSpec.refBpe's application loop). */
  private def refEncode(word: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    for ((l, r) <- merges) {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += syms(i); i += 1 }
      }
      syms = b.result()
    }
    syms
  }

  test("distributed word segmentation matches the reference on real corpus merges") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val merges = Bpe.merges(docs, "text", nMerges = 12)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    val words = docs.select(explode(split(trim(col("text")), " ")).as("word"))
      .where(length(col("word")) > 0).distinct()
    val got = Bpe.encodeWords(words, merges)
      .select(col("word"), col("subwords"))
      .as[(String, Seq[String])].collect().toMap
    assert(got.nonEmpty)
    got.foreach { case (w, sub) =>
      assert(sub == refEncode(w, merges), s"word '$w'")
      assert(sub.mkString == w, s"subwords must concatenate back to '$w'")
    }
  }

  test("per-doc subword rollup matches a single-node count") {
    val dir = sf("sf0.001")
    val out = graft.SparkEntry.queries("corpus_bpe_encode")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, nw, nc, ns) => id -> ((nw, nc, ns)) }.toMap
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val merges = Bpe.merges(graft.Tables.documents(spark, dir), "text", nMerges = 12)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    docs.foreach { case (id, text) =>
      val ws = text.trim.split(" ").filter(_.nonEmpty)
      val want = (ws.length.toLong, ws.map(_.length.toLong).sum,
        ws.map(w => refEncode(w, merges).size.toLong).sum)
      assert(out(id) == want, s"doc $id")
    }
  }
}
