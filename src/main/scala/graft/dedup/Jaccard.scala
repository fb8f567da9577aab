package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact n-gram Jaccard near-duplicate pairs via an inverted shingle index:
  * explode distinct word trigrams, equi-join on shingle (pairs only among
  * docs sharing ≥1 shingle — never an all-pairs cartesian), count
  * intersections, and compute |∩| / (|A| + |B| − |∩|).
  *
  * This is the exact verifier used on MinHash-LSH candidates
  * ([[MinHashLSH]]); standalone it is also the oracle-checkable exact
  * near-dup operator. At 100 TB the shingle join is the scale risk — hot
  * shingles fan out quadratically — so production runs feed it LSH
  * candidates instead; the plan is asserted CartesianProduct-free in specs.
  */
object Jaccard {
  /** Distinct word-trigram shingles per document. */
  def shingles(docs: DataFrame): DataFrame = {
    val w = split(trim(col("text")), " ")
    val tri = when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"), explode(array_distinct(tri)).as("shingle"))
  }

  private val pairCache = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def pairs(spark: SparkSession, dir: String, threshold: Double): DataFrame =
    pairCache.getOrElseUpdate(s"${System.identityHashCode(spark)}:$dir:$threshold",
      pairsFromShingles(shingles(Tables.documents(spark, dir)), threshold)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  def pairsFromShingles(sh: DataFrame, threshold: Double): DataFrame = {
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "inter", "na", "nb", "jaccard")
  }
}
