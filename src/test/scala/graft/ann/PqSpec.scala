package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.functions._

/** PQ (product quantization) ANN specs: ADC+re-rank recall vs brute force,
  * the exactness limit (re-rank pool covering the corpus ⇒ bit-identical to
  * the brute-force top-k, because the final ordering comes from the same
  * exact 6-dp-rounded rescoring), the m-ints-per-vector index shape, and
  * plan shape (the ADC scoring join must stay broadcast — the corpus never
  * reshuffles to be scored). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = graft.Tables.embeddings(spark, sf("sf0.01"))
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
  private lazy val q = e.where(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("query_id"), col("emb").as("qemb"))

  test("PQ ADC + re-rank recall@10 >= 0.8 vs brute force; no CartesianProduct") {
    val exact = Cosine.topK(spark, sf("sf0.01"), k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val pqDf = Pq.approxTopK(e, q, k = 10, dim = 64)
    val pq = pqDf.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect pq).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ recall@10 = $recall")
    assert(pqDf.queryExecution.executedPlan.collect {
      case c: CartesianProductExec => c
    }.isEmpty)
  }

  test("re-rank pool >= corpus makes PQ exactly the brute-force top-k") {
    val n = e.count().toInt
    val exact = Cosine.topK(spark, sf("sf0.01"), k = 10)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    val pq = Pq.approxTopK(e, q, k = 10, dim = 64, rerank = n)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(pq == exact,
      s"diff: missing=${(exact -- pq).take(3)} extra=${(pq -- exact).take(3)}")
  }

  test("encode emits m small-int codes per vector — the 64x-compressed index row") {
    val cbs = Pq.fit(e, dim = 64)
    assert(cbs.length == Pq.SubSpaces && cbs.forall(_.length == Pq.Codes))
    val enc = Pq.encode(e, cbs)
    assert(enc.columns.toSeq == ("vec_id" +: (0 until Pq.SubSpaces).map(j => s"code_$j")))
    val bad = enc.where((0 until Pq.SubSpaces)
      .map(j => col(s"code_$j") < 0 || col(s"code_$j") >= Pq.Codes)
      .reduce(_ || _)).count()
    assert(bad == 0, s"$bad rows with out-of-range codes")
    assert(enc.count() == e.count())
  }
}
