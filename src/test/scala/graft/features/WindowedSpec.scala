package graft.features

import java.sql.Date
import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Golden-value spec for the windowed indicator family against pandas
  * (rolling(p) / rolling(p).std(ddof=1) / shift — the library the reference
  * uses, transform_time_series_daily_adjusted.py:160-413) on the same 40-bar
  * fixture as RecursiveSpec. */
class WindowedSpec extends SparkSpec {

  private val close = Array(101.69, 101.22, 101.26, 101.66, 100.88, 100.88, 100.88, 99.12, 100.14, 100.74, 100.12, 99.94, 100.45, 100.19, 99.94, 98.49, 99.05, 99.17, 99.44, 97.92, 99.57, 99.72, 99.34, 101.36, 101.32, 99.87, 99.46, 97.18, 98.22, 97.81, 97.07, 98.14, 96.49, 97.02, 94.96, 94.3, 93.09, 94.55, 96.32, 95.99)
  private val high = Array(102.53, 101.4, 101.83, 102.41, 102.59, 102.68, 101.26, 101.37, 100.41, 101.26, 102.03, 100.18, 100.55, 100.44, 100.07, 98.8, 100.48, 99.67, 99.53, 99.11, 99.94, 101.63, 99.44, 103.06, 101.7, 100.76, 100.65, 98.23, 98.52, 98.99, 98.57, 98.42, 96.6, 98.46, 96.46, 94.51, 93.42, 95.29, 96.51, 97.77)
  private val low = Array(101.04, 100.33, 100.84, 100.74, 100.68, 100.29, 100.58, 97.82, 98.61, 100.07, 99.57, 99.26, 100.44, 100.11, 99.27, 98.43, 96.79, 98.3, 99.1, 97.45, 98.71, 99.35, 98.95, 99.92, 100.83, 99.3, 98.03, 97.02, 96.5, 97.35, 96.78, 97.84, 95.43, 96.45, 93.73, 94.12, 93.07, 94.12, 95.67, 94.24)

  private val sma20Gold = Array(Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, 100.159, 100.053, 99.978, 99.882, 99.867, 99.889, 99.8385, 99.7675, 99.6705, 99.5745, 99.428, 99.2755, 99.1855, 98.9875, 98.829, 98.58, 98.3705, 98.0725, 97.8415, 97.6855, 97.589)
  private val bbuGold = Array(Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, 102.242448, 102.020998, 101.871664, 101.694966, 101.622066, 101.707419, 101.596121, 101.46155, 101.708006, 101.697978, 101.616213, 101.675522, 101.615414, 101.620448, 101.537722, 101.737161, 102.063421, 102.435618, 102.442668, 102.270007, 102.23358)
  private val willrGold = Array(Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, -51.234568, -56.378601, -86.213992, -61.629881, -59.59253, -55.008489, -78.435115, -46.946565, -44.083969, -51.335878, -27.113238, -27.751196, -50.877193, -57.416268, -93.779904, -73.780488, -80.030488, -91.310976, -75.0, -86.107471, -79.161206, -86.81672, -93.890675, -99.7998, -82.850521, -57.737321, -61.477573)
  private val roc10Gold = Array(Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, -1.543908, -1.264572, -0.799921, -1.445996, -0.9318, -2.369151, -1.814036, 0.050444, -0.699021, -2.799285, -0.549341, -0.220132, -1.105027, 1.167781, 1.380828, 1.401157, 0.413932, -2.006655, -1.22687, -0.112337, -2.510796, -1.584436, -2.868935, -4.281768, -6.277142, -5.57725, -6.404585, -2.706318, -1.934433, -1.86075)
  private val obvGold = Array(2L, -1L, 3L, 8L, 2L, 2L, 2L, 0L, 3L, 7L, 2L, -4L, 3L, 2L, 0L, -3L, 1L, 6L, 12L, 5L, 6L, 8L, 5L, 9L, 4L, -2L, -9L, -10L, -8L, -11L, -15L, -10L, -16L, -9L, -10L, -12L, -15L, -11L, -6L, -12L)
  private val ret5Gold = Array(-0.007965, -0.003359, -0.021134, -0.014952, -0.001388, -0.007534, -0.009318, 0.013418, 0.000499, -0.007941, -0.01628, -0.008905, -0.012743, -0.007486, -0.020212, 0.010966, 0.006764, 0.001714, 0.019308, 0.034722, 0.003013, -0.002607, -0.021744, -0.030979, -0.034643, -0.028036, -0.013272, -0.0071, -0.012217, -0.029138, -0.028536, -0.051457, -0.020106, -0.007215, 0.010847, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN)

  private lazy val rows = {
    import scala.jdk.CollectionConverters._
    val data = close.indices.map { i =>
      Row(1L, Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        high(i), low(i), close(i), ((i + 1) % 7 + 1).toLong)
    }.asJava
    val schema = StructType(Seq(
      StructField("symbol_id", LongType), StructField("date", DateType),
      StructField("high", DoubleType), StructField("low", DoubleType),
      StructField("close", DoubleType), StructField("volume", LongType)))
    val df = spark.createDataFrame(data, schema)
    Targets.withTargets(Indicators.windowed(df)).orderBy("date").collect()
  }

  private def check(col: String, gold: Array[Double], tol: Double = 1e-4): Unit =
    rows.zipWithIndex.foreach { case (r, i) =>
      val idx = r.fieldIndex(col)
      if (gold(i).isNaN) assert(r.isNullAt(idx), s"$col row $i: expected null, got ${r.get(idx)}")
      else assert(math.abs(r.getDouble(idx) - gold(i)) < tol,
        s"$col row $i: got ${r.getDouble(idx)}, want ${gold(i)}")
    }

  test("sma_20 matches pandas rolling(20).mean") { check("ohlcv_sma_20", sma20Gold) }
  test("bb_upper matches pandas rolling mean + 2*std(ddof=1)") { check("ohlcv_bb_upper", bbuGold) }
  test("willr_14 matches pandas-ta willr") { check("ohlcv_willr_14", willrGold) }
  test("roc_10 matches pandas pct_change(10)*100") { check("ohlcv_roc_10", roc10Gold) }
  test("target_return_5d matches pandas shift(-5) forward return") { check("target_return_5d", ret5Gold) }
  test("obv matches pandas-ta cumulative signed volume") {
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(r.fieldIndex("ohlcv_obv")) == obvGold(i), s"obv row $i")
    }
  }
}
