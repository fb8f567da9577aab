package graft.backtest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Daily recommendation scorer (trading_bot/daily_signal_scorer.py:32-288):
  * score and rank BUY signals for the next trading day by combining
  *
  *  1. the latest BUY signal per (symbol, strategy) within a lookback
  *     window (ref :57-100's `DISTINCT ON (symbol_id, trade_strategy) ...
  *     ORDER BY date DESC`, anchored to the data's max signal date instead
  *     of the wall clock so results are deterministic),
  *  2. the symbol's latest fundamental quality score (ref :102-138's
  *     `DISTINCT ON (symbol) ... ORDER BY fiscal_date_ending DESC`) gated at
  *     `MinQuality` (ref :238),
  *  3. a trade-success probability gated at a threshold (ref :258 — the
  *     registered queries attach either the trained GBT's probability or the
  *     deterministic sigmoid stand-in), and
  *  4. the composite ranking score (ref :266-270).
  *
  * Each step is one keyed window or broadcast join — no per-symbol loops,
  * no driver-side state: at 100 TB the latest-signal dedup is a single
  * shuffle on (symbol, strategy) and everything else broadcasts
  * (fundamentals/universe are per-symbol tables, tiny next to signals).
  */
object Recommend {
  /** Ref :305: how many days back to look for signals. */
  val LookbackDays = 3

  /** Ref :43: minimum fundamental quality score. */
  val MinQuality = 50.0

  /** Latest BUY signal per (symbol_id, trade_strategy) within
    * `lookbackDays` of the latest signal date, joined to signal-day
    * close/volume from `bars` (ref :72-89). */
  def latestBuySignals(signals: DataFrame, bars: DataFrame,
                       lookbackDays: Int = LookbackDays): DataFrame = {
    val buys = signals.where(col("buy_signal"))
    val latest = buys.agg(max(col("date")).as("_latest_date"))
    val w = Window.partitionBy("symbol_id", "trade_strategy").orderBy(col("date").desc)
    buys.join(broadcast(latest), col("date") >= date_sub(col("_latest_date"), lookbackDays))
      .drop("_latest_date")
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
      .join(bars.select(col("symbol_id"), col("date"), col("close"), col("volume")),
        Seq("symbol_id", "date"))
  }

  /** Latest quality-score row per symbol (ref :108-127). */
  def latestQuality(scores: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol_id").orderBy(col("fiscal_q").desc)
    scores.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  /** Composite ranking score (ref :266-270): probability 60%, signal
    * strength 20%, fundamental quality 20%. */
  def composite(prob: Column, strength: Column, quality: Column): Column =
    prob * 0.6 + strength / 100.0 * 0.2 + quality / 100.0 * 0.2
}
