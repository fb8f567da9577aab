package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-weighted epoch sampling — the data-mixing step of a training-data
  * pipeline: each source domain gets a sampling rate expressed in percent
  * (250 = 2.5 epochs: every doc appears twice and half appear a third time;
  * 25 = a quarter of the domain sampled once). Inclusion is decided by a
  * deterministic content-keyed bucket, so the mix is reproducible across
  * runs, engines and re-shardings, any shard can be recomputed
  * independently, and a doc's fate never depends on row order — the same
  * policy as the hash-based corpus_split, extended to fractional/over-unit
  * rates.
  *
  * Scale shape: one scan, a per-row `explode` of at most ceil(rate) copy
  * indices, no shuffle at all — the output is written straight back out
  * partitioned however the consumer wants. Integer-only keep logic
  * (copy_idx < rate/100 OR bucket < rate%100) keeps the decision bit-exact
  * on every engine.
  */
object Mixing {

  /** Deterministic bucket in [0, 100) keyed on document CONTENT (not id):
    * identical text always lands in the same bucket, so replicated docs are
    * sampled consistently. Derived from the first three hex chars of md5 —
    * cheap, codegen'd, and expressible identically in any SQL engine. */
  def contentBucket(text: Column): Column =
    pmod(
      ascii(substring(md5(text), 1, 1)) * 961 +
        ascii(substring(md5(text), 2, 1)) * 31 +
        ascii(substring(md5(text), 3, 1)),
      lit(100))

  /** Expand `docs` to its sampled copies: one output row per kept
    * (doc, copy_idx). `ratePct` is an integer-percent column (e.g. 250 for
    * 2.5 epochs); `text` feeds the content bucket. Guaranteed copies are
    * copy_idx < ratePct/100; the one probabilistic copy is kept iff
    * bucket < ratePct%100. */
  def sampleMix(docs: DataFrame, ratePct: Column, text: Column): DataFrame =
    docs
      .withColumn("rate_pct", ratePct.cast("int"))
      .withColumn("mix_bucket", contentBucket(text))
      .withColumn("copy_idx",
        explode(sequence(lit(0), expr("rate_pct div 100").cast("int"))))
      .where(col("copy_idx") < expr("rate_pct div 100") ||
        col("mix_bucket") < col("rate_pct") % 100)
}
