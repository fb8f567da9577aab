package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** MinHash + banded LSH near-duplicate detection — the scale path for
  * document dedup (exact Jaccard verifies only the LSH candidates):
  *
  *  1. shingle → 32-bit Murmur3 hash (deterministic across JVMs)
  *  2. k permutations h_i(x) = (a_i·x + b_i) mod p (fixed seeds) → signature
  *  3. signature split into b bands of r rows; docs sharing a band bucket
  *     (band_id, hash(band slice)) become candidates — a bucket equi-join,
  *     never all-pairs
  *  4. candidates exactly verified with [[Jaccard]]
  *
  * For Jaccard threshold t, P(candidate) = 1 − (1 − t^r)^b — with k=128,
  * b=32, r=4 the S-curve midpoint is ≈ (1/32)^(1/4) ≈ 0.42; pairs at
  * t ≥ 0.6 are found with probability > 0.999. At 100 TB every stage is a
  * shuffle on (band, bucket) keys; signature size is k·4 bytes per doc.
  */
object MinHashLSH {
  val NumHashes = 128
  val Bands = 32
  val RowsPerBand: Int = NumHashes / Bands
  private val Prime = 2147483647L // 2^31 - 1

  /** Deterministic permutation parameters from a fixed seed. */
  private val params: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumHashes)((rnd.nextInt(Int.MaxValue - 1).toLong + 1, rnd.nextInt(Int.MaxValue).toLong))
  }

  private val minhashUdf = udf { (shingles: Seq[String]) =>
    if (shingles == null || shingles.isEmpty) null
    else {
      val hashes = shingles.map(s => (MurmurHash3.stringHash(s) & 0xffffffffL)).toArray
      params.map { case (a, b) =>
        var m = Long.MaxValue
        var i = 0
        while (i < hashes.length) {
          val h = (a * hashes(i) + b) % Prime
          if (h < m) m = h
          i += 1
        }
        m
      }
    }
  }

  /** doc_id → (band, bucket) rows, from precomputed shingles. */
  def bandBuckets(sh: DataFrame): DataFrame = {
    val grouped = sh.groupBy("doc_id").agg(collect_list("shingle").as("shingles"))
    val sig = grouped.select(col("doc_id"), minhashUdf(col("shingles")).as("sig"))
      .where(col("sig").isNotNull)
    val bandCols = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        hash(slice(col("sig"), b * RowsPerBand + 1, RowsPerBand)).as("bucket"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate pairs from shared band buckets (bucket equi-join). */
  def candidates(docs: DataFrame): DataFrame =
    candidatesFromShingles(Jaccard.shingles(docs))

  def candidatesFromShingles(sh: DataFrame): DataFrame = {
    val bb = bandBuckets(sh)
    bb.as("a").join(bb.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** LSH candidates verified with exact Jaccard ≥ threshold. The verify
    * stage is candidate-restricted ([[Jaccard.pairsForCandidates]]): it
    * joins candidate pairs to their shingle sets — never the full-corpus
    * shingle self-join, which is exactly the quadratic job LSH exists to
    * avoid. Cost at 100 TB: signatures O(N·k), bucket join O(matches),
    * verify O(candidates × shingles/doc). */
  def nearDuplicates(docs: DataFrame, threshold: Double): DataFrame =
    nearDuplicatesFromShingles(Jaccard.shingles(docs), threshold)

  /** Variant over precomputed (persisted) shingles — see Jaccard.cachedShingles. */
  def nearDuplicatesFromShingles(sh: DataFrame, threshold: Double): DataFrame =
    Jaccard.pairsForCandidates(sh, candidatesFromShingles(sh), threshold)
      .select("doc_a", "doc_b", "jaccard")
}
