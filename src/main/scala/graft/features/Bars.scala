package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OHLCV daily bar construction from the `events` stream (data mapping in
  * SURVEY.md §1.1 — `events` stands in for the reference's
  * raw.time_series_daily_adjusted table, db/schema/postgres_stock_db_schema.sql).
  *
  * open  = first `value` of the (symbol, day) ordered by (ts, event_id)
  * close = last  `value` ordered the same way
  * high/low = max/min, volume = row count.
  *
  * Single hash aggregation (partial map-side combine, one shuffle keyed by
  * (symbol_id, date)) using min_by/max_by over the unique (ts, event_id)
  * pair — no window pass, no second shuffle. All outputs are *selected*
  * (not arithmetically derived) values, so they are exact across engines.
  */
object Bars {
  def daily(events: DataFrame): DataFrame = {
    val tie = struct(col("ts"), col("event_id"))
    events
      .groupBy(col("user_id").as("symbol_id"), col("ts").cast("date").as("date"))
      .agg(
        min_by(col("value"), tie).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), tie).as("close"),
        count(lit(1)).as("volume")
      )
  }
}
