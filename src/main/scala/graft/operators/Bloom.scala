package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership prefilter (Bloom 1970): `Hashes` independent
  * hash functions into a power-of-two bitmap sized from the item count. A
  * negative answer is always correct (no false negatives); positives carry
  * a bounded false-positive rate of (1 - e^(-kn/m))^k.
  *
  * Why it earns a place next to the exact semi-join: at 100 TB the
  * holdout's distinct-shingle set can outgrow the broadcast threshold
  * (tens of GB), but its bloom bitmap at ~12 bits/element stays MBs —
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

  val Hashes = 3

  /** Floor 2^19 bits = 64 KiB (cheaper than one task's scheduling noise);
    * cap 2^27 bits = 16 MiB — still a sane plan literal, ≤1% FP up to
    * ~10.8M items. Past the cap the rate degrades gracefully (the exact
    * join still removes every FP; the prefilter just thins less). */
  val MinBits = 1 << 19
  val MaxBits = 1 << 27

  /** Power-of-two bitmap size targeting FP ≤1% at k=3 hashes:
    * (1-e^(-kn/m))^k = 0.01 solves to m ≈ 12.37·n, rounded up to the next
    * power of two (so the realized rate lands between ~0.1% and 1%). */
  def bitsFor(n: Long): Int = {
    val target = 12.37 * math.max(1L, n)
    var m = MinBits
    while (m < target && m < MaxBits) m <<= 1
    m
  }

  /** Bit position of item `t` under hash row `j` (xxhash64 seeded by j). */
  private def bitOf(j: Int, t: Column, bits: Int): Column =
    pmod(xxhash64(lit(j), t), lit(bits.toLong))

  /** Build the bitmap from the values of `itemCol`, sized by [[bitsFor]]
    * the item count, via a distributed OR: positions fold into per-word
    * masks map-side (bit_or is idempotent, so no distinct pass is needed),
    * and the collect is bounded by the bitmap itself — ≤ `bits/64`
    * (word, mask) rows no matter how many items — not by the
    * distinct-position count a collect-positions build would ship.
    *
    * EAGER: runs two Spark jobs (count + bit_or) at CALL time, i.e. at
    * plan-construction time of any query that embeds the bitmap —
    * plan-only tooling (explain/PlanDump) over such a query pays the
    * build. Callers composing the bitmap into repeatedly-constructed plans
    * should build once and reuse the array. Word/bit indices use shifts
    * (`>> 6`, `& 63`), never double division — exact at any bitmap size
    * (the div-vs-`/` hazard Tables.normalizeTs documents). */
  def build(items: DataFrame, itemCol: String): Array[Long] = {
    val bits = bitsFor(items.count())
    val masks = items
      .select(explode(array((0 until Hashes).map(j => bitOf(j, col(itemCol), bits)): _*)).as("pos"))
      .select(shiftright(col("pos"), 6).cast("int").as("w"),
        call_function("shiftleft", lit(1L), col("pos").bitwiseAND(lit(63L)).cast("int")).as("m"))
      .groupBy("w").agg(bit_or(col("m")).as("mask"))
      .collect()
    val words = new Array[Long](bits / 64)
    masks.foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Membership test against a driver-built bitmap — pure codegen'd column
    * arithmetic over an array literal (no UDF, no broadcast variable: the
    * bitmap rides in the plan). The bitmap size is recovered from the
    * word array, so build and probe cannot disagree on the modulus. */
  def mightContain(words: Array[Long], t: Column): Column = {
    val bits = words.length * 64
    require(Integer.bitCount(bits) == 1, s"bitmap must be a power of two: $bits bits")
    val arr = typedLit(words)
    (0 until Hashes).map { j =>
      val b = bitOf(j, t, bits)
      val word = element_at(arr, shiftright(b, 6).cast("int") + lit(1))
      val mask = call_function("shiftleft", lit(1L), b.bitwiseAND(lit(63L)).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
  }
}
