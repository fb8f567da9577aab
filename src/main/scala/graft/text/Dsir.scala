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
  * Scale shape (round 14, single-pass): the exploded feature stream is
  * built ONCE — target membership rides along as a flag column (no
  * doc_id join at all) — persisted, and consumed by exactly two readers:
  * one conditional-count aggregation yielding BOTH distributions' bucket
  * counts (≤B rows; the totals fold from that table, not a second corpus
  * scan), and the scoring broadcast-join + groupBy(doc_id). Round 13's
  * shape re-evaluated the explode five times (tF→p, tF→tp, sF→q, sF→tq,
  * final join) — 6.45× its bench baseline and five passes over the
  * tokenized corpus at 100 TB; PlanAuditSpec now pins the single-subtree
  * shape. Per-feature log-ratios are quantized to 10 dp on both engines
  * before the DECIMAL(25,10) exact sum (the decSumP rule, as in
  * [[Perplexity]]).
  */
object Dsir {

  val Buckets = 1024
  val Smoothing = 0.5
  /** r4(log_weight) above this selects the doc (0 = more target-like). */
  val SelectThreshold = 0.0

  /** Cross-engine bucket hash: integer mix of the first three hex chars'
    * ascii codes, mod B. Takes the md5 COLUMN (hoisted by the caller to
    * one evaluation) rather than re-hashing per reference — the old shape
    * computed md5(f) three times and leaned on codegen subexpression
    * elimination to save it. */
  private def bucketOfHash(h: Column): Column =
    ((ascii(substring(h, 1, 1)) * lit(131) + ascii(substring(h, 2, 1)))
      * lit(131) + ascii(substring(h, 3, 1))) % lit(Buckets)

  /** Collision-proof cache key for the per-corpus memoized frames below:
    * the full 128-bit [[graft.sqlx.PlanFingerprint]] (canonicalized plan
    * + input-file metadata) when the corpus is file-backed — a 32-bit
    * plan hashCode (the round-14 shape) is exactly what the
    * SourceFingerprint scaladoc rejects for cache keys: one collision (or
    * the same plan over rewritten data) silently serves the wrong
    * persisted feature frame and therefore wrong DSIR weights. Non-file
    * corpora key on the plan OBJECT's identity — never shared across
    * distinct frames, so repeat calls on the SAME frame still memoize.
    * Identity means a GUARANTEED-unique id (an AtomicLong issued once per
    * plan via a weak map), not `System.identityHashCode`: identity hashes
    * are 32-bit and CAN collide between two live plan objects — the same
    * collision class this key exists to reject. The map keys on plan
    * EQUALITY, which is safe in the strong direction (equal analyzed
    * plans ⇒ equal leaves ⇒ identical data: LocalRelation equality
    * compares its rows, LogicalRDD compares RDD references) and holds
    * plans weakly so keying a frame never pins it for the session. */
  private val localIds =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[AnyRef, java.lang.Long]())
  private val nextLocalId = new java.util.concurrent.atomic.AtomicLong(0L)
  private def corpusKey(docs: DataFrame): String =
    graft.sqlx.PlanFingerprint.of(docs).getOrElse {
      val id = localIds.computeIfAbsent(
        docs.queryExecution.analyzed, _ => nextLocalId.incrementAndGet())
      s"local@$id"
    }

  /** (doc_id, n_feats, log_weight, is_selected) for every non-target doc. */
  def weights(docs: DataFrame, isTarget: Column): DataFrame = {
    val spark = docs.sparkSession
    // target membership is a per-doc predicate — carry it as a flag through
    // the explode instead of joining the feature stream back to a doc_id
    // list (round 13 paid two joins AND five re-evaluations of this subtree)
    val toks = docs.select(
      col("doc_id"), isTarget.as("is_t"), split(trim(col("text")), " ").as("w"))
    val uni = toks.select(col("doc_id"), col("is_t"), explode(col("w")).as("f"))
    val bi = toks.where(size(col("w")) >= 2)
      .select(col("doc_id"), col("is_t"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1]))")).as("f"))
    val feats = graft.sqlx.FrameCache.getOrElseUpdate(
      graft.sqlx.FrameCache.key(spark, "dsir-feats",
        corpusKey(docs), isTarget.toString))(
      uni.unionByName(bi)
        .select(col("doc_id"), col("is_t"),
          bucketOfHash(md5(col("f"))).as("bucket"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // ONE corpus-sized aggregation gives both distributions: per-bucket
    // conditional counts. The ≤B-row result is itself persisted so the
    // totals fold and the ratio filter both read the tiny table — never a
    // second aggregation over the corpus
    val counts = graft.sqlx.FrameCache.getOrElseUpdate(
      graft.sqlx.FrameCache.key(spark, "dsir-counts",
        corpusKey(docs), isTarget.toString))(
      feats.groupBy("bucket").agg(
        count(when(col("is_t"), lit(1))).as("cp"),
        count(when(!col("is_t"), lit(1))).as("cq"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val totals = counts.agg(sum("cp").as("tp"), sum("cq").as("tq"))

    // ≤B-row ratio table; buckets unseen in the source are never scored
    val b = lit(Buckets).cast("double")
    val lr = log(
      ((col("cp").cast("double") + lit(Smoothing)) /
        (col("tp").cast("double") + lit(Smoothing) * b)) /
        ((col("cq").cast("double") + lit(Smoothing)) /
          (col("tq").cast("double") + lit(Smoothing) * b)))
    val ratio = counts.where(col("cq") > 0)
      .crossJoin(broadcast(totals))
      .select(col("bucket"), (round(lr, 10) + lit(0.0)).as("lr_q"))

    val slw = col("slw")
    feats.where(!col("is_t"))
      .join(broadcast(ratio), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum(Exact.dec(col("lr_q"))).cast("double").as("slw"))
      .select(col("doc_id"), col("n_feats"),
        Exact.r4(slw).as("log_weight"),
        (Exact.r4(slw) > lit(SelectThreshold)).as("is_selected"))
  }
}
