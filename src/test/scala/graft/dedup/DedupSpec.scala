package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.functions._

/** LSH dedup specs: recall against exact Jaccard (the probabilistic ops'
  * correctness contract) and plan-shape assertions (bucketed joins only —
  * a CartesianProduct anywhere means the operator won't scale). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sf("sf0.01"))

  private def hasCartesian(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.collect { case c: CartesianProductExec => c }.nonEmpty

  test("minhash LSH finds every exact-Jaccard pair at t=0.2 (S-curve well above midpoint)") {
    val exact = Jaccard.pairsFromShingles(Jaccard.shingles(docs), 0.2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = MinHashLSH.nearDuplicates(docs, 0.2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    assert(lsh == exact, s"LSH missed ${(exact -- lsh).size} pairs, invented ${(lsh -- exact).size}")
  }

  test("LSH candidate join is bucketed — no CartesianProduct in the plan") {
    assert(!hasCartesian(MinHashLSH.candidates(docs)))
    assert(!hasCartesian(SimHash.nearDuplicates(docs)))
    assert(!hasCartesian(Jaccard.pairsFromShingles(Jaccard.shingles(docs), 0.2)))
  }

  test("simhash: identical docs collide, distance is symmetric-free (a<b) and bounded") {
    val twins = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val pairs = SimHash.nearDuplicates(twins, maxHamming = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.contains((1L, 2L, 0)), s"identical docs must be hamming-0: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("exact dedup groups token-set permutations") {
    val d = Seq(
      (1L, "a b c", "en", "s", 5L),
      (2L, "c b a", "en", "s", 5L),
      (3L, "a b d", "en", "s", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val keyed = d.select(col("doc_id"), Exact.normalizedTokenSet(col("text")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keyed(1L) == keyed(2L) && keyed(1L) != keyed(3L))
  }
}
