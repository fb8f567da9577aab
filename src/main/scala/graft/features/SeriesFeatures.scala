package graft.features

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sqlx.Exact._

/** Commodity / economic-indicator time-series features
  * (transform_commodities.py:194-257, transform_economic_indicators.py:
  * 190-253 — the same family with different prefixes): rolling z-scores,
  * multi-horizon returns, return volatility, MA ratios, OLS trend slopes,
  * windowed RSI, cross-series daily pct-ranks, and flags.
  *
  * Data mapping (SURVEY.md §1.1): a "series" is an event_type; its daily
  * value is the day's mean event value quantized to 6dp. All rolling moments
  * are computed over integer micro-units (value·10⁶ as long) so every window
  * sum is exact 64-bit integer arithmetic — bit-identical across engines with
  * no decimal casts (which are lossy for scaled values beyond 2^53).
  * One aggregation + one window pass partitioned by series; daily ranks
  * partition by date.
  */
object SeriesFeatures {
  private val BySeries = Window.partitionBy("series").orderBy("date")
  private def frame(p: Int) = BySeries.rowsBetween(-(p - 1), 0)

  /** Daily series values for a set of event types (6dp). */
  def daily(spark: SparkSession, dir: String, types: Seq[String]): DataFrame = {
    val e = Tables.events(spark, dir).where(col("event_type").isin(types: _*))
    val c = count(lit(1))
    e.groupBy(col("event_type").as("series"), col("ts").cast("date").as("date"))
      .agg(round(sum(dec(col("value"))).cast("double") / c, 6).as("value"))
  }

  /** Exact windowed sum of a long column, as double. */
  private def lsum(c: Column, w: Int): Column = sum(c).over(frame(w)).cast("double")

  def features(spark: SparkSession, dir: String, types: Seq[String], prefix: String): DataFrame = {
    val base = daily(spark, dir, types)
      .withColumn("rn", row_number().over(BySeries))
      .withColumn("v6", round(col("value") * 1000000.0).cast("long"))

    def pc(k: Int): Column = {
      val prev = lag(col("value"), k).over(BySeries)
      round(when(prev =!= 0.0, (col("value") - prev) / prev), 6)
    }

    val withZ = Seq(21, 63, 252).foldLeft(base) { (d, w) =>
      val minP = math.max(2, w / 2)
      val n = least(col("rn"), lit(w)).cast("double")
      val s1 = lsum(col("v6"), w) / 1000000.0
      val s2 = lsum(col("v6") * col("v6"), w) / 1.0e12
      val mean = s1 / n
      val variance = (s2 - s1 * s1 / n) / (n - lit(1.0))
      val std = sqrt(when(variance > 0.0, variance).otherwise(0.0))
      d.withColumn(s"${prefix}_price_zscore_${w}d",
        when(col("rn") >= minP, (col("value") - mean) / (std + lit(1.0e-8))))
    }

    val withRet = withZ
      .withColumn(s"${prefix}_return_1d", pc(1))
      .withColumn(s"${prefix}_return_5d", pc(5))
      .withColumn(s"${prefix}_return_21d", pc(21))
      .withColumn("r6", round(col(s"${prefix}_return_1d") * 1000000.0).cast("long"))

    // volatility of daily returns: rolling(21/63, min 10/30); returns have a
    // leading null, so n = count of non-null returns in the frame
    val ret = col(s"${prefix}_return_1d")
    val withVol = Seq((21, 10), (63, 30)).foldLeft(withRet) { case (d, (w, minP)) =>
      val n = count(ret).over(frame(w)).cast("double")
      val s1 = lsum(col("r6"), w) / 1000000.0
      val s2 = lsum(col("r6") * col("r6"), w) / 1.0e12
      val variance = (s2 - s1 * s1 / n) / (n - lit(1.0))
      d.withColumn(s"${prefix}_volatility_${w}d",
        when(n >= minP, sqrt(when(variance > 0.0, variance).otherwise(0.0))))
    }

    def ma(w: Int, minP: Int): Column = {
      val n = least(col("rn"), lit(w)).cast("double")
      when(col("rn") >= minP, (lsum(col("v6"), w) / 1000000.0) / n)
    }
    val withMa = withVol
      .withColumn(s"${prefix}_ma5_ma21_ratio", ma(5, 3) / (ma(21, 10) + lit(1.0e-6)))
      .withColumn(s"${prefix}_ma21_ma63_ratio", ma(21, 10) / (ma(63, 30) + lit(1.0e-6)))

    // OLS trend slope over trailing w values, x = 0..n-1
    val withSlope = Seq(21, 63).foldLeft(withMa) { (d, w) =>
      val minP = math.max(2, w / 2)
      val nd = least(col("rn"), lit(w)).cast("double")
      val sy = lsum(col("v6"), w) / 1000000.0
      val sxy0 = lsum(col("rn") * col("v6"), w) / 1000000.0
      val start = (col("rn") - least(col("rn"), lit(w)) + 1).cast("double")
      val sxy = sxy0 - start * sy
      val sx = (nd - lit(1.0)) * nd / lit(2.0)
      val sxx = (nd - lit(1.0)) * nd * (lit(2.0) * nd - lit(1.0)) / lit(6.0)
      val denom = nd * sxx - sx * sx
      d.withColumn(s"${prefix}_trend_slope_${w}d",
        when(col("rn") >= minP && denom =!= 0.0, (nd * sxy - sx * sy) / denom))
    }

    // windowed RSI over returns (ref _calculate_rsi: rolling(14, min 7) means,
    // rs = g/(l+1e-6), rsi = 100 - 100/(1+rs); null returns count as 0)
    val g6 = when(col("r6") > 0, col("r6")).otherwise(lit(0L))
    val l6 = when(col("r6") < 0, -col("r6")).otherwise(lit(0L))
    val nR = least(col("rn"), lit(14)).cast("double")
    val avgG = (lsum(g6, 14) / 1000000.0) / nR
    val avgL = (lsum(l6, 14) / 1000000.0) / nR
    val rsi = lit(100.0) - (lit(100.0) / (lit(1.0) + avgG / (avgL + lit(1.0e-6))))
    val withRsi = withSlope.withColumn(s"${prefix}_rsi_14d", when(col("rn") >= 7, rsi))

    // cross-series daily pct ranks (pandas rank(pct=True) average method)
    def dayRank(v: Column): Column = {
      val part = Seq(col("date"))
      val cntLe = count(v).over(Window.partitionBy(part: _*).orderBy(v))
      val cntEq = count(v).over(Window.partitionBy(part :+ v: _*))
      val nTot = count(v).over(Window.partitionBy(part: _*))
      when(v.isNotNull, (cntLe - cntEq + (cntEq + lit(1)) / lit(2.0)) / nTot)
    }
    withRsi
      .withColumn(s"${prefix}_return_5d_rank", dayRank(col(s"${prefix}_return_5d")))
      .withColumn(s"${prefix}_return_21d_rank", dayRank(col(s"${prefix}_return_21d")))
      .withColumn(s"${prefix}_volatility_21d_rank", dayRank(col(s"${prefix}_volatility_21d")))
      .withColumn(s"${prefix}_sharp_move_flag",
        when(abs(col(s"${prefix}_price_zscore_21d")) > 2.0, 1).otherwise(0))
      .withColumn(s"${prefix}_high_volatility_flag",
        when(col(s"${prefix}_volatility_21d_rank") > 0.75, 1).otherwise(0))
      .drop("v6", "r6")
  }
}
