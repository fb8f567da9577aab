package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact n-gram Jaccard near-duplicate pairs via an inverted shingle index:
  * explode distinct word trigrams, equi-join on shingle (pairs only among
  * docs sharing ≥1 shingle — never an all-pairs cartesian), count
  * intersections, and compute |∩| / (|A| + |B| − |∩|).
  *
  * Two cost regimes:
  *  - standalone exact near-dup (`pairsFromShingles`): the shingle self-join
  *    is quadratic in per-shingle document frequency, so the 100 TB path
  *    caps hot shingles via `maxShingleDf` (a stopword-grade trigram shared
  *    by k docs alone contributes k·(k−1)/2 join rows; dropping shingles
  *    with df > cap bounds the fan-out at cap·|distinct shingles| while
  *    na/nb stay exact — only pairs whose overlap is entirely hot shingles
  *    can be missed). The cap defaults to off so the oracle check stays
  *    bit-exact at test SF.
  *  - LSH verify (`pairsForCandidates`): exact Jaccard computed only for
  *    LSH candidate pairs — cost proportional to candidates × shingles/doc,
  *    never to corpus². This is the verify stage [[MinHashLSH]] uses.
  */
object Jaccard {
  /** Distinct word-trigram shingle SET of a text column, as one array —
    * the per-row form a stream can compute without aggregation state;
    * [[shingles]] is its exploded table twin. */
  def shingleArray(text: Column): Column = {
    val w = split(trim(text), " ")
    val tri = when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))
    array_distinct(tri)
  }

  /** Distinct word-trigram shingles per document. */
  def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(shingleArray(col("text"))).as("shingle"))

  /** Memoized + persisted shingle index per (session, dir): the exact-pair
    * self-join reads it twice and the MinHash path reads it for signatures
    * AND verify — one explode instead of four. */
  def cachedShingles(spark: SparkSession, dir: String): DataFrame =
    graft.sqlx.FrameCache.getOrElseUpdate(graft.sqlx.FrameCache.key(spark, "shingles", dir))(
      shingles(Tables.documents(spark, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  def pairs(spark: SparkSession, dir: String, threshold: Double): DataFrame =
    graft.sqlx.FrameCache.getOrElseUpdate(
        graft.sqlx.FrameCache.key(spark, "jaccard", dir, threshold.toString))(
      pairsFromShingles(cachedShingles(spark, dir), threshold)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** |A∩B| → Jaccard ≥ threshold, given per-pair intersection counts and
    * per-doc shingle counts. */
  private def score(inter: DataFrame, counts: DataFrame, threshold: Double): DataFrame =
    inter
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "inter", "na", "nb", "jaccard")

  /** Exact pairs over the whole corpus via the inverted shingle index.
    * `maxShingleDf` drops shingles whose document frequency exceeds the cap
    * before the self-join (the hot set is tiny → broadcast anti-join);
    * na/nb remain exact full-set sizes. */
  def pairsFromShingles(sh: DataFrame, threshold: Double,
                        maxShingleDf: Option[Long] = None): DataFrame = {
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val joinable = maxShingleDf match {
      case Some(cap) =>
        val hot = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
          .where(col("df") > cap).select("shingle")
        sh.join(broadcast(hot), Seq("shingle"), "left_anti")
      case None => sh
    }
    val inter = joinable.as("a").join(joinable.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    score(inter, counts, threshold)
  }

  /** Incremental near-dup pairs: new-batch documents (`newIds`) against the
    * FULL corpus (existing + the batch itself), without recomputing the
    * corpus-wide pair set — the daily-increment form of [[pairsFromShingles]]
    * (same incremental contract as graft.etl.Watermarks' gated recompute).
    * One side of the inverted-index join is only the increment's shingles,
    * so cost is O(|increment shingles| × df), independent of how many
    * corpus-internal pairs exist. Emits (doc_a, doc_b) with doc_b in the
    * batch and doc_a either existing (any id) or an earlier batch doc
    * (doc_a < doc_b, so within-batch pairs appear once). */
  def pairsForIncrement(sh: DataFrame, newIds: DataFrame, threshold: Double): DataFrame = {
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // distinct: a duplicated id in newIds would duplicate shingle rows on
    // both join sides and silently inflate the intersection counts
    val ids = newIds.select(col("doc_id")).distinct()
    val shNew = sh.join(ids, "doc_id")
    val shAll = sh.join(ids.withColumn("_new", lit(true)), Seq("doc_id"), "left")
    val inter = shAll.as("a").join(shNew.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") =!= col("b.doc_id") &&
          (col("a._new").isNull || col("a.doc_id") < col("b.doc_id")))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    score(inter, counts, threshold)
  }

  /** Exact Jaccard restricted to candidate (doc_a < doc_b) pairs — the LSH
    * verify path. Joins candidates to doc_a's shingles (fan-out = shingles
    * per doc), then hash-joins on (doc_b, shingle) to count the overlap:
    * cost is O(candidates × shingles/doc), independent of corpus size. */
  def pairsForCandidates(sh: DataFrame, cand: DataFrame, threshold: Double): DataFrame = {
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shA = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("shingle"))
    val inter = cand.join(shA, "doc_a").join(shB, Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    score(inter, counts, threshold)
  }
}
