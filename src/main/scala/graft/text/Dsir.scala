package graft.text

import graft.sqlx.Exact
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every source
  * document by how much more likely its hashed n-gram bag is under the
  * target distribution than under the source distribution,
  * log w(x) = Σ_f c_f(x)·(ln p̂_target(f) − ln p̂_source(f)),
  * then select/resample by weight. The target here is the held-out
  * val+test shard — the same "what should training data look like" proxy
  * the decontamination passes use.
  *
  * Features are unigrams + bigrams hashed into [[Buckets]] buckets via an
  * md5-prefix mix (cross-engine reproducible, same family as the
  * `corpus_sample_mix` bucketing); hashing bounds the model at B counts
  * per distribution regardless of corpus size — the point of DSIR's
  * hashed features at 100 TB. Both distributions are add-0.5-smoothed
  * multinomials over buckets.
  *
  * Scale shape: the two count tables are ≤B rows (metadata), joined and
  * broadcast; scoring is one map-side broadcast join of the exploded
  * feature stream plus a per-doc aggregation — no corpus-sized shuffle
  * except the final groupBy(doc_id). Per-feature log-ratios are quantized
  * to 10 dp on both engines before the DECIMAL(25,10) exact sum (the
  * decSumP rule, as in [[Perplexity]]).
  */
object Dsir {

  val Buckets = 1024
  val Smoothing = 0.5
  /** r4(log_weight) above this selects the doc (0 = more target-like). */
  val SelectThreshold = 0.0

  /** Cross-engine bucket hash: integer mix of the first three md5 hex
    * chars' ascii codes, mod B. */
  private def bucketOf(f: Column): Column =
    ((ascii(substring(md5(f), 1, 1)) * lit(131) + ascii(substring(md5(f), 2, 1)))
      * lit(131) + ascii(substring(md5(f), 3, 1))) % lit(Buckets)

  /** (doc_id, n_feats, log_weight, is_selected) for every non-target doc. */
  def weights(docs: DataFrame, isTarget: Column): DataFrame = {
    val toks = docs.select(col("doc_id"), split(trim(col("text")), " ").as("w"))
    val uni = toks.select(col("doc_id"), explode(col("w")).as("f"))
    val bi = toks.where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1]))")).as("f"))
    val feats = uni.unionByName(bi)
      .select(col("doc_id"), bucketOf(col("f")).as("bucket"))

    val targetIds = docs.where(isTarget).select("doc_id")
    val tF = feats.join(targetIds, "doc_id")
    val sF = feats.join(targetIds, Seq("doc_id"), "left_anti")
    val p = tF.groupBy("bucket").agg(count(lit(1)).as("cp"))
    val q = sF.groupBy("bucket").agg(count(lit(1)).as("cq"))
    val tp = tF.agg(count(lit(1)).as("tp"))
    val tq = sF.agg(count(lit(1)).as("tq"))

    // ≤B-row ratio table; buckets unseen in the source are never scored
    val b = lit(Buckets).cast("double")
    val lr = log(
      ((coalesce(col("cp"), lit(0L)).cast("double") + lit(Smoothing)) /
        (col("tp").cast("double") + lit(Smoothing) * b)) /
        ((col("cq").cast("double") + lit(Smoothing)) /
          (col("tq").cast("double") + lit(Smoothing) * b)))
    val ratio = q.join(p, Seq("bucket"), "left")
      .crossJoin(broadcast(tp)).crossJoin(broadcast(tq))
      .select(col("bucket"), (round(lr, 10) + lit(0.0)).as("lr_q"))

    val slw = col("slw")
    sF.join(broadcast(ratio), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum(Exact.dec(col("lr_q"))).cast("double").as("slw"))
      .select(col("doc_id"), col("n_feats"),
        Exact.r4(slw).as("log_weight"),
        (Exact.r4(slw) > lit(SelectThreshold)).as("is_selected"))
  }
}
