package graft.dedup

import graft.SparkSpec

/** SimHash's default hot-bucket cap (SimHash.MaxBucketSize, round 16):
  * the last near-dup path whose default plan could go quadratic past
  * N ≫ 2¹⁶ (the 4×16 band space is pigeonhole-fixed, so random band
  * collisions densify with the corpus). A planted saturated bucket —
  * identical docs share ALL FOUR band buckets, so one cluster over the
  * cap saturates every band it touches — must contribute zero pairs,
  * while an ordinary under-cap duplicate pair elsewhere still surfaces.
  * Twin of [[HotBucketSpec]] (MinHashLSH) and the HyperplaneLSH cap. */
class SimHashHotBucketSpec extends SparkSpec {
  import spark.implicits._

  private val cap = SimHash.MaxBucketSize
  private val hotText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  private lazy val docs = {
    val hot = (0 until cap + 200).map(i => (i.toLong, hotText))
    val pair = Seq(
      (100000L, "one two three four five six seven eight nine ten eleven twelve"),
      (100001L, "one two three four five six seven eight nine ten eleven twelve"))
    val noise = (200000 until 200020).map(i =>
      (i.toLong, s"unique filler document number $i with words w${i}a w${i}b w${i}c"))
    (hot ++ pair ++ noise).toDF("doc_id", "text")
  }

  test("a saturated band bucket contributes no pairs; an under-cap pair survives") {
    val pairs = SimHash.nearDuplicates(docs, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // uncapped, the hot cluster alone is (cap+200 choose 2) ≈ 750k pairs;
    // identical fingerprints saturate all four bands, so the default cap
    // must remove every one of them
    assert(!pairs.exists { case (a, b) => a <= cap + 200L && b <= cap + 200L },
      s"saturated bucket leaked pairs (${pairs.size} total)")
    // recall outside the hot bucket is untouched
    assert(pairs.contains((100000L, 100001L)), "under-cap duplicate pair lost")
    assert(pairs.size < 100, s"candidate set not bounded: ${pairs.size}")
  }

  test("maxBucket = None restores the uncapped all-pairs equivalence") {
    val uncapped = SimHash.nearDuplicates(docs, maxHamming = 3, maxBucket = None)
      .where($"doc_a" === 0L).count()
    assert(uncapped == cap + 199L, s"uncapped must keep the hot cluster: $uncapped")
  }
}
