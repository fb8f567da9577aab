package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Cosine similarity search over the embedding table.
  *
  * `topK` is the brute-force baseline: broadcast the (small) query set and
  * score every (query, candidate) pair with a sequential-fold dot product
  * (codegen'd higher-order functions — no Scala UDF). Similarities are
  * quantized to 6dp so ranking is deterministic across engines; rank ties
  * break by vec_id. The scale path is [[HyperplaneLSH]] (bucketed candidate
  * generation) — brute force is O(Q·N·d) and only correct when Q is small
  * enough to broadcast.
  *
  * `thresholdPairs` is the embedding near-dup operator (all pairs ≥ τ); the
  * exact variant is quadratic and exists as the oracle-checkable baseline,
  * with the LSH variant as the production path.
  */
object Cosine {
  /** Sequential left-fold dot product (index order — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a); val nb = norm(b)
    when(na =!= 0.0 && nb =!= 0.0, d / (na * nb))
  }

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"), col("label"))

  /** Codegen'd cosine from precomputed norms (the pair loop is the hot path:
    * graft.functions.DotProduct keeps it in whole-stage codegen). */
  private def fastCos(spark: SparkSession, a: Column, na: Column, b: Column, nb: Column): Column =
    when(na =!= 0.0 && nb =!= 0.0,
      graft.functions.GraftFunctions.dot(spark, a, b) / (na * nb))

  private def withNorm(spark: SparkSession, e: DataFrame): DataFrame =
    e.withColumn("nrm", sqrt(graft.functions.GraftFunctions.dot(spark, col("emb"), col("emb"))))

  /** Shared broadcast-query ranking pipeline behind [[topK]] and
    * [[hardNegatives]]: one body owns the scoring DAG (norms, 6-dp
    * quantization, tie-break) so the two operators cannot drift. */
  private def rankedNeighbors(spark: SparkSession, dir: String, k: Int, queryMod: Int,
                              negativesOnly: Boolean): DataFrame = {
    val e = withNorm(spark, embeddings(spark, dir))
    val q = e.where(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"),
        col("nrm").as("qnrm"), col("label").as("qlabel"))
    // same serial-stream fix as thresholdPairs: the corpus side reads as
    // one file, so the |corpus|·|queries| score loop otherwise runs in a
    // single task; spreading it across the session's cores changes
    // nothing about the scored set
    val base = e.repartition(spark.sparkContext.defaultParallelism)
      .crossJoin(broadcast(q))
    val filtered =
      if (negativesOnly) base.where(col("label") =!= col("qlabel"))
      else base.where(col("vec_id") =!= col("query_id"))
    val scoredCols =
      Seq(col("query_id"), col("vec_id")) ++
        (if (negativesOnly) Seq(col("label").as("neg_label")) else Nil) :+
        round(fastCos(spark, col("qemb"), col("qnrm"), col("emb"), col("nrm")), 6).as("cosine")
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    filtered.select(scoredCols: _*)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Top-k neighbours for query vectors (vec_id % queryMod == 0), self
    * excluded. */
  def topK(spark: SparkSession, dir: String, k: Int = 10, queryMod: Int = 100): DataFrame =
    rankedNeighbors(spark, dir, k, queryMod, negativesOnly = false)

  /** Hard-negative mining for contrastive training: for each query vector
    * the k most-similar vectors with a DIFFERENT label — the negatives that
    * actually teach a retrieval model (same broadcast-query plan as [[topK]],
    * the label inequality is a residual filter before ranking). */
  def hardNegatives(spark: SparkSession, dir: String, k: Int = 10, queryMod: Int = 100): DataFrame =
    rankedNeighbors(spark, dir, k, queryMod, negativesOnly = true)

  /** All pairs with cosine ≥ threshold (exact baseline for embedding
    * near-dup; LSH-bucketed variant in [[HyperplaneLSH]]). */
  def thresholdPairs(spark: SparkSession, dir: String, threshold: Double): DataFrame = {
    val e = withNorm(spark, embeddings(spark, dir))
    // The O(N²) pair loop is the anchor's SEMANTICS; its parallelism is
    // not. The corpus reads as one parquet file, so the broadcast
    // nested-loop join streamed exactly ONE task through all N²/2 pairs
    // (round-18 JobProf: 2.03 s of executor time in a 2.08 s single job).
    // Repartitioning the streamed side spreads the same pair count across
    // the session's cores — identical pair set, same broadcast build.
    val a = e.repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id").as("vec_a"), col("emb").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("emb").as("eb"), col("nrm").as("nb"))
    // broadcast made explicit so the REPARTITIONED side is always the
    // streamed one (the planner would otherwise pick a side by size
    // estimate and could stream the un-repartitioned side serially)
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(fastCos(spark, col("ea"), col("na"), col("eb"), col("nb")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
  }
}
