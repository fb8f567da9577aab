package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The adaptive-capacity rules' load-bearing properties: the floors must
  * decide EXACTLY at the driver-SF boundary (2 048 vectors) — that is
  * what keeps every committed oracle hash unchanged — and the wider
  * buckets the rules pick at scale must not cost the LSH near-dup path
  * its recall (multi-probe + 16 tables is the safety margin). */
class AdaptiveSpec extends SparkSpec {
  import spark.implicits._

  test("floors decide at and below the driver-SF boundary, rules engage above") {
    // every driver SF (embeddings: 50 / 500 / 2000) sits below 2048
    for (n <- Seq(1L, 50L, 500L, 2000L, 2048L)) {
      assert(HyperplaneLSH.adaptiveBits(n) == 8, s"bits at n=$n")
      assert(Adaptive.cellsForServing(n) == 16, s"serving cells at n=$n")
    }
    for (n <- Seq(1L, 50L, 500L, 2000L, 2048L))
      assert(Adaptive.cellsForPairs(n) == 16, s"pair cells at n=$n")
    // strictly monotone growth past the boundary
    assert(HyperplaneLSH.adaptiveBits(2049L) == 9)
    assert(HyperplaneLSH.adaptiveBits(20000L) == 12)
    assert(Adaptive.cellsForPairs(20000L) == 157)
    assert(Adaptive.cellsForServing(20000L) == 50)
    // occupancy stays bounded: doubling the corpus never doubles it
    val occ = (n: Long) => n.toDouble / (1L << HyperplaneLSH.adaptiveBits(n))
    for (n <- Seq(4096L, 65536L, 1048576L))
      assert(occ(n) <= 2 * HyperplaneLSH.TargetOccupancy, s"occupancy at n=$n is ${occ(n)}")
  }

  test("adaptive width keeps planted near-dup recall on a corpus past the boundary") {
    // 6000 vectors -> adaptiveBits = 10 (four times the buckets of the
    // fixed width); 30 planted pairs at cosine ~0.98 must all surface
    val rnd = new scala.util.Random(20260816L)
    val base = (0 until 3000).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()))
    }
    val planted = (0 until 30).map { i =>
      val (id, v) = base(i * 7)
      // tiny perturbation: cosine stays ~0.99
      (id + 100000L, v.map(x => x + 0.05 * rnd.nextGaussian()))
    }
    val noise = (0 until 2970).map { i =>
      (200000L + i, Array.fill(64)(rnd.nextGaussian()))
    }
    val vecs = (base ++ planted ++ noise).toDF("vec_id", "emb")
    assert(HyperplaneLSH.adaptiveBits(vecs.count()) == 10)
    val pairs = HyperplaneLSH.nearDupPairs(vecs, dim = 64, threshold = 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val expected = (0 until 30).map(i => (base(i * 7)._1, base(i * 7)._1 + 100000L)).toSet
    assert(expected.subsetOf(pairs),
      s"missing planted pairs: ${expected -- pairs}")
  }
}
