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

  test("minhash verify is candidate-restricted — no full shingle self-join in the plan") {
    // the full-corpus self-join is keyed on shingle WITH a doc_id < doc_id
    // residual condition; the candidate-restricted verify joins on
    // (doc_b, shingle) with no residual. Assert no shingle-keyed join
    // carries a residual condition anywhere in the minhash plan.
    val plan = MinHashLSH.nearDuplicates(docs, 0.2).queryExecution.executedPlan
    val offenders = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.leftKeys.exists(_.toString.contains("shingle")) && j.condition.nonEmpty => j
    }
    assert(offenders.isEmpty, s"full shingle self-join leaked into LSH verify:\n${offenders.mkString}")
  }

  test("jaccard df-cap drops hot shingles from the join but keeps exact set sizes") {
    // 4 docs share the stopword-grade trigram "the quick fox"; docs 1/2 are
    // real near-dups with extra overlap, docs 3/4 overlap ONLY via the hot
    // shingle. With cap=3 the hot shingle leaves the join: the 1-2 pair
    // survives (other shared shingles) with exact na/nb, 3-4 disappears.
    val d = Seq(
      (1L, "the quick fox a b c d e f g"),
      (2L, "the quick fox a b c d e f zz"),
      (3L, "the quick fox p q r s t u v"),
      (4L, "the quick fox l m n o w x y")
    ).toDF("doc_id", "text")
    val sh = Jaccard.shingles(d)
    val capped = Jaccard.pairsFromShingles(sh, 0.1, maxShingleDf = Some(3L))
      .select("doc_a", "doc_b", "na", "nb").as[(Long, Long, Long, Long)].collect()
    assert(capped.exists(p => p._1 == 1L && p._2 == 2L), s"real near-dup lost: ${capped.toSeq}")
    assert(!capped.exists(p => p._1 == 3L || p._1 == 4L || p._2 == 3L || p._2 == 4L),
      s"hot-shingle-only pair kept: ${capped.toSeq}")
    // na/nb stay full exact sizes (8 trigrams each), not capped-set sizes
    val p12 = capped.find(p => p._1 == 1L && p._2 == 2L).get
    assert(p12._3 == 8L && p12._4 == 8L, s"set sizes must stay exact: $p12")
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
