package graft.text

import graft.Tables
import graft.sqlx.Exact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bigram language-model perplexity scoring — the CCNet-style corpus
  * quality filter (Wenzek et al. 2020: score each document under a
  * reference LM; high perplexity ⇒ far from the reference distribution ⇒
  * filter or down-weight). The reference repo has no LM scorer — this
  * extends its heuristic text-quality gates (cf. reference
  * transforms/transform_earnings_call_transcript_eda.py's length/EDA
  * checks, already ported as `text_quality`) to a statistical model, part
  * of the LLM-training-pipeline surface.
  *
  * The model is trained on the `corpus_split` train shard (doc_id % 20 <
  * 18 — the same deterministic hash split the rest of the pipeline uses)
  * and scores EVERY document, so held-out docs exercise the unseen-bigram
  * smoothing path. Add-0.5 smoothing: P(w2|w1) = (c(w1,w2) + 0.5) /
  * (c(w1·) + 0.5·V) where c(w1·) is w1's left-context count and V the
  * train vocabulary size (0.5 is exactly representable in binary, so the
  * arithmetic DAG is reproducible cross-engine).
  *
  * Scale shape (100 TB): the model tables are corpus-bounded aggregates —
  * bigram counts shrink map-side to distinct bigrams per partition, the
  * context table is vocab-sized, V is one row (broadcast). Scoring is two
  * shuffle equi-joins of the exploded bigram frame — (w1,w2) then (w1) —
  * followed by one per-doc aggregation; nothing driver-sized. The (w1)
  * join key is Zipf-skewed: at scale broadcast the context table when it
  * fits (vocab-sized, usually does) or enable AQE skew-join / salt via
  * graft.operators.SkewJoin; locally the plain join is used so the plan
  * stays oracle-comparable.
  *
  * Exactness: per-bigram log-probs are full-mantissa doubles, so they are
  * quantized to 10 dp (round) on BOTH engines before the DECIMAL(25,10)
  * exact sum — the decSumP rule (quantize first, then sum; a direct
  * double→decimal cast of full-mantissa values rounds differently across
  * engines).
  */
object Perplexity {

  val Smoothing = 0.5
  /** r4(avg_logprob) below this flags the doc as low-quality. */
  val LowQualityThreshold = -3.5

  def score(spark: SparkSession, dir: String): DataFrame =
    scoreDocs(Tables.documents(spark, dir))

  /** Same as [[score]] over an explicit documents frame (doc_id, text). */
  def scoreDocs(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), split(trim(col("text")), " ").as("w"))
    // adjacent-pair explode; guard size >= 2 (ANSI sequence(0,-1) walks
    // backwards) — 0- and 1-token docs have no bigrams and drop out
    val bg = toks.where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] as w1, w[i+1] as w2))")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val isTrain = col("doc_id") % 20 < 18

    val trainBg = bg.where(isTrain)
    val model = trainBg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val ctx = trainBg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocabN = toks.where(isTrain)
      .select(explode(col("w")).as("t"))
      .agg(countDistinct(col("t")).as("v"))

    val lp = log(
      (coalesce(col("c12"), lit(0L)).cast("double") + lit(Smoothing)) /
        (coalesce(col("c1"), lit(0L)).cast("double") + lit(Smoothing) * col("v").cast("double")))
    val avg = col("slp") / col("n_bigrams").cast("double")
    bg.join(model, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocabN)) // 1-row scalar
      .withColumn("lp_q", round(lp, 10) + lit(0.0))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(Exact.dec(col("lp_q"))).cast("double").as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        Exact.r4(avg).as("avg_logprob"),
        (Exact.r4(avg) < lit(LowQualityThreshold)).as("is_low_quality"))
  }
}
