package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact deduplication over the document corpus: hash-groupBy on a
  * normalized key — the standard first pass of an LLM training-data
  * pipeline. Two normalizations:
  *
  *  - `exact`: lower + trim + whitespace-collapse (byte-identical content)
  *  - `tokenset`: sorted distinct token bag (reorder-invariant content)
  *
  * One shuffle keyed by the 128-bit digest; the canonical representative is
  * min(doc_id) per group. At 100 TB the md5 key keeps the shuffle narrow
  * (16 bytes + id) regardless of document size.
  */
object Exact {
  def normalizedExact(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  def normalizedTokenSet(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(trim(text), " ")))))

  def dedup(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        normalizedExact(col("text")).as("exact_key"),
        normalizedTokenSet(col("text")).as("tokenset_key"))
    val we = Window.partitionBy("exact_key")
    val wt = Window.partitionBy("tokenset_key")
    d.withColumn("exact_canonical_id", min("doc_id").over(we))
      .withColumn("exact_group_size", count(lit(1)).over(we))
      .withColumn("tokenset_canonical_id", min("doc_id").over(wt))
      .withColumn("tokenset_group_size", count(lit(1)).over(wt))
      .withColumn("is_exact_dup", col("doc_id") =!= col("exact_canonical_id"))
      .withColumn("is_tokenset_dup", col("doc_id") =!= col("tokenset_canonical_id"))
  }
}
