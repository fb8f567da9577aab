package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.functions._

/** ANN specs: hyperplane-LSH recall vs the brute-force baseline, and
  * plan-shape (the LSH candidate join must be a bucket equi-join). */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = graft.Tables.embeddings(spark, sf("sf0.01"))
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
  private lazy val q = e.where(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("query_id"), col("emb").as("qemb"))

  test("hyperplane LSH recall@10 >= 0.8 vs brute force") {
    val exact = Cosine.topK(spark, sf("sf0.01"), k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = HyperplaneLSH.approxTopK(e, q, dim = 64, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@10 = $recall")
  }

  test("LSH candidate generation has no CartesianProduct") {
    val plan = HyperplaneLSH.approxTopK(e, q, dim = 64, k = 10)
      .queryExecution.executedPlan
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
  }

  test("IVF ANN: recall@10 >= 0.8 vs brute force, candidate join is a cell equi-join") {
    val exact = Cosine.topK(spark, sf("sf0.01"), k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivfDf = IvfIndex.approxTopK(e, q, k = 10)
    val ivf = ivfDf.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall@10 = $recall")
    assert(ivfDf.queryExecution.executedPlan.collect {
      case c: CartesianProductExec => c
    }.isEmpty)
  }

  test("embedding LSH near-dup: recall >= 0.95 vs exact all-pairs, no nested-loop join") {
    val exact = Cosine.thresholdPairs(spark, sf("sf0.01"), 0.4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lshDf = HyperplaneLSH.nearDupPairs(e, dim = 64, threshold = 0.4)
    val lsh = lshDf.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "testdata should contain embedding near-dups")
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall = $recall (missed ${(exact -- lsh).size}/${exact.size})")
    // every surviving pair is exact-rescored, so no false positives either
    assert((lsh -- exact).isEmpty, s"invented pairs: ${(lsh -- exact).take(5)}")
    val plan = lshDf.queryExecution.executedPlan
    assert(plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, "embedding LSH must not plan a nested-loop join")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
  }

  test("cosine is 1 for identical vectors, 0-guarded for zero vectors") {
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
      (2L, Seq(1.0, 0.0, 0.0), Seq(0.0, 0.0, 0.0))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), Cosine.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(math.abs(out(1L).get.asInstanceOf[Double] - 1.0) < 1e-12)
    assert(out(2L).isEmpty)
  }
}
