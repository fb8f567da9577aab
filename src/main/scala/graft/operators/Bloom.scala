package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership prefilter (Bloom 1970): `Hashes` independent
  * hash functions into a `Bits`-bit bitmap. A negative answer is always
  * correct (no false negatives); positives carry a bounded false-positive
  * rate of (1 - e^(-kn/m))^k.
  *
  * Why it earns a place next to the exact semi-join: at 100 TB the
  * holdout's distinct-shingle set can outgrow the broadcast threshold
  * (tens of GB), but its bloom bitmap at ~10 bits/element stays a few MB —
  * a plan-size literal. The corpus side is then prefiltered MAP-SIDE, and
  * only the bloom-passing sliver (true hits + the ε false positives)
  * reaches the exact shuffled join that removes the FPs. The composed
  * operator is therefore bit-identical to the exact semi-join — the bloom
  * never changes the answer, only the bytes shuffled — which is why the
  * registered `decontaminate` query (wired through
  * [[graft.text.Decontaminate.overlap]]'s contaminated-hit path) keeps the
  * exact DuckDB oracle and no cross-engine hash mirror is needed (the
  * bloom arithmetic cancels out end-to-end; xxhash64 is free to stay
  * Spark-native, unlike the md5 ascii-mix family the oracle-checked
  * sketches use). BloomSpec asserts both halves: results identical to the
  * unfiltered semi-join, and the bloom Filter sitting on the corpus side
  * of the plan before any exchange.
  */
object Bloom {

  /** 2^19 bits = 64 KiB bitmap: ~10 bits/element at 50k holdout shingles
    * (FP ≈ 0.4% with k=3); sized for the test corpus, a parameter at scale. */
  val Bits = 1 << 19
  val Hashes = 3

  private val Words = Bits / 64

  /** Bit position of item `t` under hash row `j` (xxhash64 seeded by j). */
  private def bitOf(j: Int, t: Column): Column =
    pmod(xxhash64(lit(j), t), lit(Bits.toLong))

  /** Build the bitmap from the values of `itemCol` via a distributed OR:
    * positions fold into per-word masks map-side (bit_or is idempotent, so
    * no distinct pass is needed), and the collect is bounded by the bitmap
    * itself — ≤ `Bits/64` (word, mask) rows no matter how many items — not
    * by the distinct-position count a collect-positions build would ship. */
  def build(items: DataFrame, itemCol: String): Array[Long] = {
    val masks = items
      .select(explode(array((0 until Hashes).map(j => bitOf(j, col(itemCol))): _*)).as("pos"))
      .select((col("pos") / lit(64L)).cast("int").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("pos"), lit(64L)).cast("int")).as("m"))
      .groupBy("w").agg(bit_or(col("m")).as("mask"))
      .collect()
    val words = new Array[Long](Words)
    masks.foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Membership test against a driver-built bitmap — pure codegen'd column
    * arithmetic over an array literal (no UDF, no broadcast variable: the
    * bitmap rides in the plan). */
  def mightContain(words: Array[Long], t: Column): Column = {
    val arr = typedLit(words)
    (0 until Hashes).map { j =>
      val b = bitOf(j, t)
      val word = element_at(arr, (b / lit(64L)).cast("int") + lit(1))
      val mask = call_function("shiftleft", lit(1L), pmod(b, lit(64L)).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
  }
}
