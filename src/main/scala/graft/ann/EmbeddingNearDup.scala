package graft.ann

import org.apache.spark.sql.DataFrame

/** Regime-routed embedding near-dup — the scale path for
  * [[graft.queries]]' embedding dedup (reference analog: the pandas
  * cosine screens in fin-trade-craft's transcript/feature EDA, re-planned
  * for corpora that never fit one machine). One semantic contract —
  * "(vec_a, vec_b, cosine ≥ threshold), vec_a < vec_b, cosine rounded to
  * 6" — served by the right plan per threshold regime:
  *
  *   - threshold ≥ [[LshMinThreshold]] → [[HyperplaneLSH.nearDupPairs]]:
  *     sign-LSH bucket join. Per-bit match probability p = 1 − θ/π ≥ 0.70
  *     here, so 16 tables + Hamming-1 probes hold recall ~1 at ANY
  *     adaptive width — and the bucketing pass is one scan, no fit.
  *   - threshold < [[LshMinThreshold]] → [[SemDeDup.cellPairs]]: k-means
  *     cells at occupancy-constant count (N/128), in-cell exact rescore.
  *     Cost stays O(N) however low the threshold; recall is the
  *     cell-split trade, which does NOT decay with corpus size (the
  *     round-14 scale-stress finding: sign-LSH at cos 0.4 was 30×
  *     exponent 1.43 and decaying recall, the cell path 0.51 and stable).
  *
  * Both branches are md5-derandomized, so the registered queries carry
  * full DuckDB oracles either way; the routing constant is mirrored into
  * the oracle CHOICE (which SQL a query registers), not into SQL logic —
  * a query pins one regime, so there is nothing runtime-dynamic to
  * replay. */
object EmbeddingNearDup {

  /** Routing threshold: at cos = 0.6, p_bit = 1 − acos(0.6)/π ≈ 0.705,
    * and one-sided Hamming-1 recall per 8-bit table ≈ 0.19 ⇒ ~0.97 over
    * 16 tables, IMPROVING as cosine rises; below it the per-table hit
    * rate (and with the adaptive width, total recall) falls off the
    * cliff the k-means cells don't have. */
  val LshMinThreshold = 0.6

  /** Near-dup pairs at `threshold`, routed per the regime analysis above.
    * `precomputedBuckets` only applies to the LSH branch (the cell branch
    * memoizes its quantizer fit instead — [[IvfIndex.assign]]). */
  def pairs(vecs: DataFrame, dim: Int, threshold: Double,
            precomputedBuckets: Option[HyperplaneLSH.BucketTable] = None): DataFrame =
    if (threshold >= LshMinThreshold)
      HyperplaneLSH.nearDupPairs(vecs, dim, threshold, precomputedBuckets)
    else
      SemDeDup.cellPairs(vecs, threshold = threshold)
}
