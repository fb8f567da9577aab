package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing (concatenate-and-chunk) — the LLM-pretraining step that
  * turns a document corpus into fixed-size context windows: documents are
  * concatenated into one global token stream in `id` order and chopped
  * every `windowSize` tokens; each output row is one (document × window)
  * overlap, so downstream can both assemble windows (group by window_id)
  * and attribute tokens back to source documents.
  *
  * The only global state is each document's start offset in the stream — a
  * global cumulative sum, which must NOT become a single-partition window.
  * It is computed with a deterministic two-pass split: bucket by id range
  * (fixed-width buckets from the collected min/max — a value function of
  * the key, so re-execution cannot reshuffle rows the way a sampled
  * RangePartitioner could), collect per-bucket token sums (metadata-sized:
  * one row per bucket), and add the broadcast prefix offsets to a
  * per-bucket windowed cumsum. Both window and explode stay partitioned;
  * driver traffic is O(buckets), independent of corpus size.
  */
object Packing {

  /** One row per (doc, context window) overlap. `docs` needs an integral
    * `id` column (global concatenation order) and a token-count column.
    * Documents with zero tokens are dropped (they occupy no stream span).
    */
  def packWindows(docs: DataFrame, idCol: String, lenCol: String, windowSize: Int): DataFrame = {
    require(windowSize > 0, "windowSize must be positive")
    val src = docs
      .select(col(idCol).cast("long").as("doc_id"), col(lenCol).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
    val nBuckets = docs.sparkSession.sessionState.conf.numShufflePartitions
    val mm = src.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi")).head()
    if (mm.isNullAt(0)) return emptyResult(src)
    val lo = mm.getLong(0)
    val width = math.max(1L, (mm.getLong(1) - lo) / nBuckets + 1)

    val bucketed = src.withColumn("bucket", expr(s"(doc_id - $lo) DIV $width"))
    // pass 1: per-bucket token totals → prefix offsets (metadata-sized collect)
    val sums = bucketed.groupBy("bucket").agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = sums.map(_._1).zip(sums.map(_._2).scanLeft(0L)(_ + _)).toSeq
    val offsetDf = docs.sparkSession.createDataFrame(
      docs.sparkSession.sparkContext.parallelize(offsets.map(Row.fromTuple), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("offset", org.apache.spark.sql.types.LongType))))

    // pass 2: within-bucket exclusive cumsum + broadcast bucket offset
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val spans = bucketed.join(broadcast(offsetDf), "bucket")
      .withColumn("start_offset", col("offset") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("end_offset", col("start_offset") + col("n_tokens"))

    spans
      .withColumn("window_id", explode(sequence(
        expr(s"start_offset DIV $windowSize"),
        expr(s"(end_offset - 1) DIV $windowSize"))))
      .select(col("doc_id"), col("window_id"), col("start_offset"), col("n_tokens"),
        (least(col("end_offset"), (col("window_id") + 1) * windowSize)
          - greatest(col("start_offset"), col("window_id") * windowSize)).as("tokens_in_window"),
        (col("window_id") === expr(s"start_offset DIV $windowSize")).as("is_head"))
  }

  private def emptyResult(src: DataFrame): DataFrame =
    src.select(col("doc_id"), lit(0L).as("window_id"), lit(0L).as("start_offset"),
      col("n_tokens"), lit(0L).as("tokens_in_window"), lit(true).as("is_head"))
      .where(lit(false))
}
