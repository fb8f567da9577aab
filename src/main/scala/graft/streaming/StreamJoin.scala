package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the funnel/attribution shape the
  * reference computes batch-wise when it links signal days to later trade
  * exits (backtest_strategies.py:171-300 pairs entries with outcomes):
  * every conversion event joins back to the trigger events of the same user
  * that happened within a bounded look-back horizon.
  *
  * Spark-native semantics: BOTH inputs carry a watermark and the join
  * condition bounds conversion_ts to [trigger_ts, trigger_ts + horizon), so
  * Structured Streaming can size the join state exactly — a trigger row is
  * dropped from state once the conversion watermark passes its horizon, a
  * conversion row once the trigger watermark passes its timestamp. Without
  * the time bound the state would grow without limit; with it, state size is
  * O(events per horizon window), independent of stream length — the 100 TB /
  * unbounded-stream shape.
  *
  * The same function runs in batch (the watermark node is eliminated for
  * non-streaming children), which is how the oracle-checked batch mirror
  * `stream_join_attribution` shares this exact code path.
  */
object StreamJoin {

  /** Join `conversions` to the same-user `triggers` at most `horizonMinutes`
    * earlier (inclusive start, exclusive end). Inner join: unconverted
    * triggers drop out; a conversion can attribute to several triggers
    * inside the horizon (the downstream rollup picks last-touch/first-touch
    * — deterministically derivable from trigger_ts). */
  def attribution(triggers: DataFrame, conversions: DataFrame,
                  horizonMinutes: Int = 30,
                  watermarkDelay: String = "30 minutes"): DataFrame = {
    val t = triggers
      .select(col("event_id").as("trigger_id"), col("user_id"),
        col("ts").as("trigger_ts"), col("value").as("trigger_value"))
      .withWatermark("trigger_ts", watermarkDelay)
    val c = conversions
      .select(col("event_id").as("conversion_id"), col("user_id").as("_conv_user_id"),
        col("ts").as("conversion_ts"), col("value").as("conversion_value"))
      .withWatermark("conversion_ts", watermarkDelay)
    t.join(c,
        col("user_id") === col("_conv_user_id") &&
          col("conversion_ts") >= col("trigger_ts") &&
          col("conversion_ts") < col("trigger_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"))
      .drop("_conv_user_id")
  }
}
