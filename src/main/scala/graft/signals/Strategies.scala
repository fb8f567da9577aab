package graft.signals

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's 11 trading-signal strategies
  * (transform_trading_signals.py:221-801), re-expressed as lag/window + CASE
  * logic over the feature table — one window pass per strategy, partitioned
  * by symbol, instead of the reference's per-symbol Python iteration.
  *
  * Reference semantics preserved exactly: each strategy first drops rows
  * where its required features are null (null sets are per-symbol prefixes or
  * interior gaps; `prev` means the previous *surviving* row, which is what
  * pandas dropna-then-iterate does), then evaluates buy/else-if-sell on
  * (prev, curr) pairs. Output schema matches the reference's signal record:
  * (symbol_id, date, buy_signal, sell_signal, trade_strategy,
  * signal_strength).
  */
object Strategies {
  private val BySymbol = Window.partitionBy("symbol_id").orderBy("date")

  private def emit(df: DataFrame, name: String, buy: Column, sell: Column,
                   buyStrength: Column, sellStrength: Column): DataFrame = {
    val isBuy = when(buy, true).otherwise(false)
    val isSell = when(!isBuy && sell, true).otherwise(false)
    df.withColumn("buy_signal", isBuy)
      .withColumn("sell_signal", isSell)
      .where(col("buy_signal") || col("sell_signal"))
      .withColumn("trade_strategy", lit(name))
      .withColumn("signal_strength",
        when(col("buy_signal"), buyStrength).otherwise(sellStrength))
      .select("symbol_id", "date", "buy_signal", "sell_signal", "trade_strategy", "signal_strength")
  }

  private def capped(c: Column): Column = least(lit(100.0), c)

  /** EMA 8/21 crossover (ref :221). */
  def emaCrossover(f: DataFrame): DataFrame = {
    val d = f.where(col("ohlcv_ema_8").isNotNull && col("ohlcv_ema_21").isNotNull)
      .withColumn("p8", lag("ohlcv_ema_8", 1).over(BySymbol))
      .withColumn("p21", lag("ohlcv_ema_21", 1).over(BySymbol))
    val strength = capped(abs(col("ohlcv_ema_8") - col("ohlcv_ema_21")) / col("ohlcv_ema_21") * 100.0)
    emit(d, "ema_crossover",
      col("p8") <= col("p21") && col("ohlcv_ema_8") > col("ohlcv_ema_21"),
      col("p8") >= col("p21") && col("ohlcv_ema_8") < col("ohlcv_ema_21"),
      strength, strength)
  }

  /** RSI mean reversion: cross above 30 / below 70 (ref :269). */
  def rsiMeanReversion(f: DataFrame): DataFrame = {
    val d = f.where(col("ohlcv_rsi_14").isNotNull)
      .withColumn("prsi", lag("ohlcv_rsi_14", 1).over(BySymbol))
    emit(d, "rsi_mean_reversion",
      col("prsi") <= 30.0 && col("ohlcv_rsi_14") > 30.0,
      col("prsi") >= 70.0 && col("ohlcv_rsi_14") < 70.0,
      col("ohlcv_rsi_14"), lit(100.0) - col("ohlcv_rsi_14"))
  }

  /** RSI crossing with extreme-zone confirmation (ref :315). The zone state
    * machine reduces to pure lag logic: the buy branch fires iff the previous
    * bar was ≤30 (which set the oversold zone) and the current bar re-enters
    * (30, 70); symmetrically for sells — proven by case analysis on the
    * reference's if/elif chain. */
  def rsiCrossing(f: DataFrame): DataFrame = {
    val d = f.where(col("ohlcv_rsi_14").isNotNull)
      .withColumn("prsi", lag("ohlcv_rsi_14", 1).over(BySymbol))
    val r = col("ohlcv_rsi_14")
    emit(d, "rsi_crossing",
      col("prsi") <= 30.0 && r > 30.0 && r < 70.0,
      col("prsi") >= 70.0 && r < 70.0 && r > 30.0,
      r, lit(100.0) - r)
  }

  /** MACD histogram zero-cross reversal (ref :386). */
  def macdReversal(f: DataFrame): DataFrame = {
    val d = f.where(col("ohlcv_macd_histogram").isNotNull)
      .withColumn("ph", lag("ohlcv_macd_histogram", 1).over(BySymbol))
    val strength = capped(abs(col("ohlcv_macd_histogram")) * 10.0)
    emit(d, "macd_histogram_reversal",
      col("ph") <= 0.0 && col("ohlcv_macd_histogram") > 0.0,
      col("ph") >= 0.0 && col("ohlcv_macd_histogram") < 0.0,
      strength, strength)
  }

  /** Bollinger band breakout (ref :432). */
  def bollingerBreakout(f: DataFrame): DataFrame = {
    val d = f.where(col("close").isNotNull && col("ohlcv_bb_upper").isNotNull && col("ohlcv_bb_lower").isNotNull)
      .withColumn("pc", lag("close", 1).over(BySymbol))
      .withColumn("pu", lag("ohlcv_bb_upper", 1).over(BySymbol))
      .withColumn("pl", lag("ohlcv_bb_lower", 1).over(BySymbol))
    emit(d, "bollinger_breakout",
      col("pc") <= col("pu") && col("close") > col("ohlcv_bb_upper"),
      col("pc") >= col("pl") && col("close") < col("ohlcv_bb_lower"),
      capped((col("close") - col("ohlcv_bb_upper")) / col("ohlcv_bb_upper") * 100.0),
      capped((col("ohlcv_bb_lower") - col("close")) / col("ohlcv_bb_lower") * 100.0))
  }

  /** Volume spike with price confirmation (ref :483). */
  def volumeSpike(f: DataFrame): DataFrame = {
    val d = f.where(col("close").isNotNull && col("volume").isNotNull && col("ohlcv_volume_sma_20").isNotNull)
      .where(col("ohlcv_volume_sma_20") =!= 0.0)
      .withColumn("pc", lag("close", 1).over(BySymbol))
      .withColumn("vr", col("volume").cast("double") / col("ohlcv_volume_sma_20"))
      .withColumn("pchg", (col("close") - col("pc")) / col("pc") * 100.0)
    val strength = capped(col("vr") * 10.0)
    emit(d, "volume_spike",
      col("vr") > 2.0 && col("pchg") > 2.0,
      col("vr") > 2.0 && col("pchg") < -2.0,
      strength, strength)
  }

  /** Williams %R extreme recovery (ref :538). */
  def williamsExtremes(f: DataFrame): DataFrame = {
    val d = f.where(col("ohlcv_willr_14").isNotNull)
      .withColumn("pw", lag("ohlcv_willr_14", 1).over(BySymbol))
    val strength = capped(abs(col("ohlcv_willr_14") + 50.0) * 2.0)
    emit(d, "williams_extremes",
      col("pw") <= -80.0 && col("ohlcv_willr_14") > -80.0,
      col("pw") >= -20.0 && col("ohlcv_willr_14") < -20.0,
      strength, strength)
  }

  /** MA ribbon alignment (ref :584). Ladder configurable (reference default
    * 5/10/20/50; driver testdata histories are 30 bars so the registered
    * query uses 3/5/10/20 — same semantics, documented in SURVEY.md §2). */
  def maRibbon(f: DataFrame, periods: Seq[Int] = Seq(5, 10, 20, 50)): DataFrame = {
    val smas = periods.map(p => col(s"ohlcv_sma_$p"))
    val d = f.where(smas.map(_.isNotNull).reduce(_ && _) && col("close").isNotNull)
    val chainUp = (col("close") +: smas).sliding(2).map { case Seq(a, b) => a > b }.reduce(_ && _)
    val chainDown = (col("close") +: smas).sliding(2).map { case Seq(a, b) => a < b }.reduce(_ && _)
    val longest = smas.last
    emit(d, "ma_ribbon", chainUp, chainDown,
      capped((col("close") - longest) / longest * 100.0),
      capped((longest - col("close")) / longest * 100.0))
  }

  /** 20-day high/low price breakout (ref :631) — requires withHighLow. */
  def priceBreakout(f: DataFrame, p: Int = 20): DataFrame = {
    val d = f.where(col(s"high_$p").isNotNull && col(s"low_$p").isNotNull)
      .withColumn("phh", lag(s"high_$p", 1).over(BySymbol))
      .withColumn("pll", lag(s"low_$p", 1).over(BySymbol))
    emit(d, "price_breakout",
      col("high") > col("phh"),
      col("low") < col("pll"),
      capped((col("high") - col("phh")) / col("phh") * 100.0),
      capped((col("pll") - col("low")) / col("pll") * 100.0))
  }

  /** RSI divergence at local price extremes (ref :683): centered rolling(5)
    * extremes, then consecutive-extreme comparison — two chained window
    * passes, still one shuffle (same partitioning). */
  def rsiDivergence(f: DataFrame): DataFrame = {
    val d = f.where(col("close").isNotNull && col("ohlcv_rsi_14").isNotNull)
      .withColumn("w_min", min("close").over(BySymbol.rowsBetween(-2, 2)))
      .withColumn("w_max", max("close").over(BySymbol.rowsBetween(-2, 2)))
      .withColumn("w_cnt", count("close").over(BySymbol.rowsBetween(-2, 2)))
    val lows = d.where(col("w_cnt") === 5 && col("w_min") === col("close"))
      .withColumn("pp", lag("close", 1).over(BySymbol))
      .withColumn("pr", lag("ohlcv_rsi_14", 1).over(BySymbol))
    val highs = d.where(col("w_cnt") === 5 && col("w_max") === col("close"))
      .withColumn("pp", lag("close", 1).over(BySymbol))
      .withColumn("pr", lag("ohlcv_rsi_14", 1).over(BySymbol))
    val buys = emit(lows, "rsi_divergence",
      col("close") < col("pp") && col("ohlcv_rsi_14") > col("pr"), lit(false),
      capped(col("ohlcv_rsi_14") - col("pr")), lit(0.0))
    val sells = emit(highs, "rsi_divergence",
      lit(false), col("close") > col("pp") && col("ohlcv_rsi_14") < col("pr"),
      lit(0.0), capped(col("pr") - col("ohlcv_rsi_14")))
    buys.unionByName(sells)
  }

  /** Trend following composite (ref :754): price above long SMA + EMA 8>21 +
    * RSI>50. `smaPeriod` configurable (reference 50; registered query 20 for
    * the 30-bar testdata histories). */
  def trendFollowing(f: DataFrame, smaPeriod: Int = 50): DataFrame = {
    val s = col(s"ohlcv_sma_$smaPeriod")
    val d = f.where(col("close").isNotNull && s.isNotNull &&
      col("ohlcv_ema_8").isNotNull && col("ohlcv_ema_21").isNotNull && col("ohlcv_rsi_14").isNotNull)
    val r = col("ohlcv_rsi_14")
    emit(d, "trend_following",
      col("close") > s && col("ohlcv_ema_8") > col("ohlcv_ema_21") && r > 50.0,
      col("close") < s && col("ohlcv_ema_8") < col("ohlcv_ema_21") && r < 50.0,
      capped(r), capped(lit(100.0) - r))
  }

  /** All strategies unioned into the reference's transforms.trading_signals
    * shape (ref process_symbol). */
  def all(f: DataFrame, ribbonPeriods: Seq[Int] = Seq(5, 10, 20, 50), trendSma: Int = 50): DataFrame =
    Seq(emaCrossover(f), rsiMeanReversion(f), rsiCrossing(f), macdReversal(f),
      bollingerBreakout(f), volumeSpike(f), williamsExtremes(f),
      maRibbon(f, ribbonPeriods), priceBreakout(f), rsiDivergence(f),
      trendFollowing(f, trendSma)).reduce(_ unionByName _)
}
