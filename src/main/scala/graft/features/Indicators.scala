package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sqlx.Exact._

/** Frame-expressible technical indicators over daily bars — the windowed half
  * of the reference's feature engineering
  * (transform_time_series_daily_adjusted.py:160-358). The recursive half
  * (EMA/RSI/MACD/ATR) lives in [[Recursive]].
  *
  * Everything is a window function over `partitionBy(symbol_id).orderBy(date)`
  * — one shuffle keyed by symbol for the whole ladder, never a global window,
  * so the pass scales linearly with symbols × history. Rolling semantics match
  * pandas `rolling(p)` (min_periods = p → null until p rows exist).
  */
object Indicators {
  private val BySymbol = Window.partitionBy("symbol_id").orderBy("date")
  private def last(p: Int) = BySymbol.rowsBetween(-(p - 1), 0)

  val SmaPeriods: Seq[Int] = Seq(5, 10, 20, 50)

  private def nz(den: Column, expr: Column): Column = when(den =!= 0.0, expr)

  /** SMA ladder + close/SMA ratios (ref :160-187). The ladder is
    * configurable like the reference's YAML `ma_periods`. */
  def withSma(bars: DataFrame, periods: Seq[Int] = SmaPeriods): DataFrame = {
    val rn = row_number().over(BySymbol)
    val withRn = bars.withColumn("rn", rn)
    periods.foldLeft(withRn) { (df, p) =>
      val sma = when(col("rn") >= p, decSum(col("close"), last(p)) / p)
      df.withColumn(s"ohlcv_sma_$p", sma)
        .withColumn(s"ohlcv_sma_${p}_ratio", nz(col(s"ohlcv_sma_$p"), col("close") / col(s"ohlcv_sma_$p")))
    }
  }

  /** Bollinger(20, 2): mid/upper/lower + width and %B position (ref :299-315).
    * Sample stddev (ddof=1) from exact decimal Σx and Σx² so both engines
    * compute the identical double. */
  def withBollinger(df: DataFrame, p: Int = 20, k: Double = 2.0): DataFrame = {
    val s1 = decSum(col("close"), last(p))
    val s2 = decSum(col("close") * col("close"), last(p))
    val n = lit(p.toDouble)
    val variance = (s2 - s1 * s1 / n) / lit((p - 1).toDouble)
    val std = sqrt(when(variance > 0.0, variance).otherwise(0.0))
    val mid = s1 / n
    val valid = col("rn") >= p
    df.withColumn("ohlcv_bb_middle", when(valid, mid))
      .withColumn("ohlcv_bb_upper", when(valid, mid + lit(k) * std))
      .withColumn("ohlcv_bb_lower", when(valid, mid - lit(k) * std))
      .withColumn("ohlcv_bb_width",
        nz(col("ohlcv_bb_middle"), (col("ohlcv_bb_upper") - col("ohlcv_bb_lower")) / col("ohlcv_bb_middle")))
      .withColumn("ohlcv_bb_position",
        nz(col("ohlcv_bb_upper") - col("ohlcv_bb_lower"),
          (col("close") - col("ohlcv_bb_lower")) / (col("ohlcv_bb_upper") - col("ohlcv_bb_lower"))))
  }

  /** Rate of change over p days, in percent (ref :254-257). */
  def withRoc(df: DataFrame, periods: Seq[Int] = Seq(10, 20)): DataFrame =
    periods.foldLeft(df) { (d, p) =>
      val prev = lag(col("close"), p).over(BySymbol)
      d.withColumn(s"ohlcv_roc_$p", nz(prev, (col("close") - prev) / prev * 100.0))
    }

  /** Williams %R(14) (ref :259-263). */
  def withWillr(df: DataFrame, p: Int = 14): DataFrame = {
    val hh = max(col("high")).over(last(p))
    val ll = min(col("low")).over(last(p))
    df.withColumn(s"ohlcv_willr_$p",
      when(col("rn") >= p, nz(hh - ll, (hh - col("close")) / (hh - ll) * -100.0)))
  }

  /** Volume SMA 20/50 + current/SMA20 ratio (ref :352-358). Volume is integral
    * so the window sums are exact. */
  def withVolume(df: DataFrame): DataFrame = {
    val out = Seq(20, 50).foldLeft(df) { (d, p) =>
      d.withColumn(s"ohlcv_volume_sma_$p",
        when(col("rn") >= p, sum(col("volume")).over(last(p)).cast("double") / p))
    }
    out.withColumn("ohlcv_volume_ratio",
      nz(col("ohlcv_volume_sma_20"), col("volume").cast("double") / col("ohlcv_volume_sma_20")))
  }

  /** Chaikin Money Flow(20) + Accumulation/Distribution line (ref :344-350):
    * money-flow multiplier ((c−l)−(h−c))/(h−l), 0 on flat bars; the money
    * flow volume is quantized to 6dp so its running/window sums are exact
    * across engines (SURVEY §6). */
  def withCmfAd(df: DataFrame, p: Int = 20): DataFrame = {
    val mfm = when(col("high") - col("low") =!= 0.0,
      ((col("close") - col("low")) - (col("high") - col("close"))) / (col("high") - col("low")))
      .otherwise(0.0)
    val mfv = round(mfm * col("volume").cast("double"), 6)
    val volSum = sum(col("volume")).over(last(p)).cast("double")
    df.withColumn("mfv6", mfv)
      .withColumn(s"ohlcv_cmf",
        when(col("rn") >= p && volSum =!= 0.0,
          decSumP(col("mfv6"), last(p), 30, 12) / volSum))
      .withColumn("ohlcv_ad",
        sum(col("mfv6").cast(org.apache.spark.sql.types.DecimalType(30, 12)))
          .over(BySymbol.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .drop("mfv6")
  }

  /** On-balance volume: cumulative signed volume, exact integer running sum
    * (ref :338). First bar counts positive. */
  def withObv(df: DataFrame): DataFrame = {
    val prev = lag(col("close"), 1).over(BySymbol)
    val signed = when(prev.isNull, col("volume"))
      .when(col("close") > prev, col("volume"))
      .when(col("close") < prev, -col("volume"))
      .otherwise(lit(0L))
    df.withColumn("ohlcv_obv", sum(signed).over(BySymbol.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** All windowed features in one pass (single shuffle: every window spec
    * shares partitionBy(symbol_id) ordering, so Catalyst plans one exchange +
    * one sort for the entire ladder). */
  def windowed(bars: DataFrame, smaPeriods: Seq[Int] = SmaPeriods): DataFrame =
    withCmfAd(withObv(withVolume(withWillr(withRoc(withBollinger(withSma(bars, smaPeriods)))))))

  /** 20-day rolling high/low used by the price-breakout strategy
    * (transform_trading_signals.py:637-639). */
  def withHighLow(df: DataFrame, p: Int = 20): DataFrame =
    df.withColumn(s"high_$p", when(col("rn") >= p, max(col("high")).over(last(p))))
      .withColumn(s"low_$p", when(col("rn") >= p, min(col("low")).over(last(p))))
}
