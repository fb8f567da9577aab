package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** 64-bit SimHash near-duplicate detection: each token hashes to 64 bits;
  * the fingerprint's bit i is 1 iff the sum of (±1 per token at bit i) is
  * positive. Near-dup candidates share one of four 16-bit bands (any pair
  * within Hamming distance 3 shares at least one band — pigeonhole), then
  * exact Hamming distance filters. Bucket equi-join, never all-pairs.
  */
object SimHash {
  private def hash64(s: String): Long = {
    val h1 = MurmurHash3.stringHash(s, 0x9747b28c).toLong
    val h2 = MurmurHash3.stringHash(s, 0x85ebca6b).toLong
    (h1 << 32) | (h2 & 0xffffffffL)
  }

  private val simhashUdf = udf { (tokens: Seq[String]) =>
    if (tokens == null || tokens.isEmpty) Option.empty[Long]
    else Some {
      val acc = new Array[Int](64)
      tokens.foreach { t =>
        val h = hash64(t)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
          i += 1
        }
      }
      var fp = 0L
      var i = 0
      while (i < 64) { if (acc(i) > 0) fp |= (1L << i); i += 1 }
      fp
    }
  }

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      simhashUdf(split(trim(col("text")), " ")).as("simhash"))

  /** Pairs within the given Hamming distance, found via 16-bit band buckets. */
  def nearDuplicates(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4 bands of 16 bits guarantee recall only for distance <= 3")
    val fp = fingerprints(docs).where(col("simhash").isNotNull)
    val banded = fp.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)).as("bucket"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bucket"))
    val hamming = bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming.as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
