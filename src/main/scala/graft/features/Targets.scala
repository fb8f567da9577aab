package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forward-looking target variables for model training
  * (transform_time_series_daily_adjusted.py:363-413): percentage / log
  * forward returns, binary direction, ternary class (Down <-2%, Flat, Up >2%)
  * per horizon. Pure `lead` windows keyed by symbol — no extra shuffle when
  * chained after [[Indicators.windowed]] (same partitioning).
  *
  * Matches the reference's pandas edge semantics: direction is 0 (not null)
  * when the forward return is null ((NaN > 0) == False), ternary is null,
  * and the log return of a zero-price base falls back to ln(1) = 0.
  */
object Targets {
  private val BySymbol = Window.partitionBy("symbol_id").orderBy("date")

  val Horizons: Seq[Int] = Seq(5, 10, 20, 30, 40)

  def withTargets(df: DataFrame, horizons: Seq[Int] = Horizons): DataFrame =
    horizons.foldLeft(df) { (d, h) =>
      val future = lead(col("close"), h).over(BySymbol)
      val pct = when(col("close") =!= 0.0, (future - col("close")) / col("close"))
      val ratio = when(col("close") =!= 0.0, future / col("close"))
        .otherwise(when(future.isNotNull, lit(1.0)))
      d.withColumn(s"target_return_${h}d", pct)
        .withColumn(s"target_log_return_${h}d", log(ratio))
        .withColumn(s"target_direction_${h}d", when(pct > 0.0, 1).otherwise(0))
        .withColumn(s"target_ternary_${h}d",
          when(pct.isNull, lit(null).cast("int"))
            .when(pct <= -0.02, 0).when(pct <= 0.02, 1).otherwise(2))
    }
}
