package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming counterpart of the reference's incremental mode:
  * instead of the watermark-table polling loop
  * (transformation_watermark_manager.py), a streaming `events` source flows
  * through event-time windowed aggregation with a watermark (bounded state,
  * late data dropped deterministically) and watermark-scoped dedup.
  *
  * Works on any streaming DataFrame with (ts: timestamp, event_id, user_id,
  * event_type, value) — tested via MemoryStream; in production the source is
  * a Kafka/file stream of the same schema.
  */
object EventAggregates {
  /** Per (10-minute window, event_type) counts + exact decimal sums. */
  def windowedCounts(events: DataFrame, watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(25,10)")).cast("double").as("value_sum"),
        approx_count_distinct("user_id").as("approx_users"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("value_sum"), col("approx_users"))

  /** Exactly-once-per-event dedup bounded by the watermark. */
  def dedupedEvents(events: DataFrame, watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: each micro-batch broadcast-joins the STATIC
    * dimension (`dim`: user_id → segment) — no streaming state, no
    * stream-stream join semantics, the standard way to attach reference
    * data to a flow — then rolls up per (10-minute window, segment) under
    * the same watermark bound. At scale the dimension is the per-symbol
    * universe (tiny next to the event stream), exactly the broadcast shape
    * the batch queries use. */
  def enrichedSegmentCounts(events: DataFrame, dim: DataFrame,
                            watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .join(broadcast(dim), Seq("user_id"))
      .groupBy(window(col("ts"), "10 minutes"), col("segment"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(25,10)")).cast("double").as("value_sum"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("segment"), col("n_events"), col("value_sum"))
}
