package graft.ann

/** Corpus-adaptive capacity rules — the round-14 scale-stress lesson
  * generalized: every fixed capacity knob (LSH bucket width, k-means cell
  * count) turns a linear operator quadratic once the corpus outgrows it,
  * and no driver-SF test can see it because small corpora keep the
  * structure sparse. Each rule here has a FLOOR that decides at every
  * driver test SF (≤ 2048 vectors), so adopting the adaptive default
  * changes no committed oracle hash — the rules only engage at scale.
  *
  * Two distinct regimes, two rules:
  *   - [[cellsForPairs]] (SemDeDup-style in-cell pair generation): pair
  *     cost is Σ cell² = N²/cells, so cells must grow ∝ N to hold
  *     occupancy — and the pair bill — constant. N/128 matches the
  *     SemDeDup paper's posture (~110k clusters at LAION scale).
  *     Centroid assignment (N·cells dots) becomes the next bottleneck at
  *     extreme N; the distributed Lloyd's fit (IvfIndex.fitDistributed)
  *     already keeps the FIT off the driver, and a coarse-quantized
  *     assignment would be the next rung if ever needed.
  *   - [[cellsForServing]] (IVF serving indexes): probe cost is
  *     nProbe·occupancy, build cost is assignment + sample-capped
  *     training, so FAISS's √N rule balances the two — cells ∝ √(N/8),
  *     occupancy grows as √N, and the train sample stays capped at
  *     65 536 regardless.
  *
  * Recall caveat for serving: a FIXED nProbe covers nProbe/cells of the
  * space, so as cells grow the coverage ratio shrinks — on CLUSTERED
  * corpora (the real-embedding case) that is exactly FAISS's trade and
  * recall holds at nProbe ≪ cells (IvfClusteredRecallSpec); on isotropic
  * data (IVF's worst case, like the synthetic test vectors) recall
  * declines with the ratio, and a deployment tunes (cells, nProbe)
  * jointly — raising nProbe buys recall at linear probe cost. The
  * registered queries pin nProbe = 8 for oracle determinism; the
  * defaults here favor throughput.
  */
object Adaptive {

  /** Floor for both rules — and the exact value at every driver SF. */
  val MinCells = 16

  /** Occupancy-constant cell count for in-cell PAIR generation:
    * max(16, ⌈N/128⌉). 2 048 → 16 (floor = rule, boundary exact). */
  def cellsForPairs(n: Long): Int =
    math.max(MinCells, math.ceil(n / 128.0).toInt)

  /** FAISS-style serving-index cell count: max(16, ⌈√(N/8)⌉).
    * 2 048 → √256 = 16 (floor = rule, boundary exact). */
  def cellsForServing(n: Long): Int =
    math.max(MinCells, math.ceil(math.sqrt(n / 8.0)).toInt)
}
