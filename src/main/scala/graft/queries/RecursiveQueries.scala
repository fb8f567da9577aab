package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.features.{Bars, Ewm, Recursive}
import graft.sqlx.Exact.{lit17, r4}
import OracleSql._

/** Recursive indicator queries (EMA/RSI/MACD/ATR). The DuckDB oracles are
  * recursive CTEs that step the *identical* recurrence in the identical IEEE
  * op order as [[graft.features.Recursive]] — β literals are printed with 17
  * significant digits so they parse back to the same double — giving
  * bit-identical values (and therefore identical 4-dp rounding) without any
  * tolerance. */
object RecursiveQueries {

  private def recursiveTable(s: SparkSession, d: String): DataFrame =
    Recursive.withRecursive(Bars.daily(Tables.events(s, d)))

  private def keyed(df: DataFrame, cols: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.select((Seq(col("symbol_id"), col("date")) ++ cols): _*)
      .orderBy("symbol_id", "date")

  /** WITH RECURSIVE prelude: bars + rn + the stepping join skeleton.
    * `inits` / `steps` are the extra state columns. */
  private def recCte(inits: String, steps: String): String =
    s"""WITH RECURSIVE $barsCte,
       |r AS (
       |  SELECT symbol_id, date, rn, high, low, close,
       |    $inits
       |  FROM b WHERE rn = 1
       |  UNION ALL
       |  SELECT b.symbol_id, b.date, b.rn, b.high, b.low, b.close,
       |    $steps
       |  FROM r JOIN b ON b.symbol_id = r.symbol_id AND b.rn = r.rn + 1
       |)""".stripMargin

  // ---------------------------------------------------------------- ema
  private val featEma = Q(
    (s, d) => keyed(recursiveTable(s, d),
      Recursive.EmaSpans.flatMap(p => Seq(
        r4(col(s"ohlcv_ema_$p")).as(s"ema_$p"),
        r4(col(s"ohlcv_ema_${p}_ratio")).as(s"ema_${p}_ratio"))) ++ Seq(
        col("ohlcv_ema_8_21_cross").as("ema_8_21_cross"),
        r4(col("ohlcv_ema_8_21_ratio")).as("ema_8_21_ratio"))), {
      val inits = Recursive.EmaSpans.map(p =>
        s"CAST(close AS DOUBLE) AS n$p, CAST(1.0 AS DOUBLE) AS d$p").mkString(",\n    ")
      val steps = Recursive.EmaSpans.map { p =>
        val b = lit17(Ewm.betaSpan(p))
        s"b.close + $b * r.n$p, 1.0 + $b * r.d$p"
      }.mkString(",\n    ")
      val outs = Recursive.EmaSpans.flatMap(p => Seq(
        rd(s"n$p/d$p", s"ema_$p"),
        rd(s"CASE WHEN n$p/d$p <> 0 THEN close/(n$p/d$p) END", s"ema_${p}_ratio"))) ++ Seq(
        s"CAST(CASE WHEN n8/d8 > n21/d21 THEN 1 ELSE 0 END AS INTEGER) AS ema_8_21_cross",
        rd("CASE WHEN n21/d21 <> 0 THEN (n8/d8)/(n21/d21) END", "ema_8_21_ratio"))
      s"""${recCte(inits, steps)}
         |SELECT symbol_id, date,
         |  ${outs.mkString(",\n  ")}
         |FROM r ORDER BY symbol_id, date""".stripMargin
    })

  // ---------------------------------------------------------------- rsi
  private val featRsi = Q(
    (s, d) => keyed(recursiveTable(s, d),
      Recursive.RsiPeriods.flatMap(p => Seq(
        r4(col(s"ohlcv_rsi_$p")).as(s"rsi_$p"),
        col(s"ohlcv_rsi_${p}_oversold").as(s"rsi_${p}_oversold"),
        col(s"ohlcv_rsi_${p}_overbought").as(s"rsi_${p}_overbought")))), {
      val inits = Recursive.RsiPeriods.map(p =>
        s"CAST(NULL AS DOUBLE) AS g$p, CAST(NULL AS DOUBLE) AS l$p").mkString(",\n    ")
      val steps = Recursive.RsiPeriods.map { p =>
        val b = lit17(Ewm.betaWilder(p))
        s"""CASE WHEN r.rn = 1 THEN greatest(b.close - r.close, 0.0)
           |         ELSE greatest(b.close - r.close, 0.0) + $b * r.g$p END,
           |    CASE WHEN r.rn = 1 THEN greatest(r.close - b.close, 0.0)
           |         ELSE greatest(r.close - b.close, 0.0) + $b * r.l$p END""".stripMargin
      }.mkString(",\n    ")
      val outs = Recursive.RsiPeriods.flatMap { p =>
        val rsi = s"CASE WHEN rn >= ${p + 1} AND g$p + l$p <> 0 THEN 100.0 * g$p / (g$p + l$p) END"
        Seq(rd(rsi, s"rsi_$p"),
          s"CAST(CASE WHEN ($rsi) < 30.0 THEN 1 ELSE 0 END AS INTEGER) AS rsi_${p}_oversold",
          s"CAST(CASE WHEN ($rsi) > 70.0 THEN 1 ELSE 0 END AS INTEGER) AS rsi_${p}_overbought")
      }
      s"""${recCte(inits, steps)}
         |SELECT symbol_id, date,
         |  ${outs.mkString(",\n  ")}
         |FROM r ORDER BY symbol_id, date""".stripMargin
    })

  // ---------------------------------------------------------------- macd
  private val featMacd = Q(
    (s, d) => keyed(recursiveTable(s, d), Seq(
      r4(col("ohlcv_macd")).as("macd"),
      r4(col("ohlcv_macd_signal")).as("macd_signal"),
      r4(col("ohlcv_macd_histogram")).as("macd_histogram"),
      col("ohlcv_macd_bullish").as("macd_bullish"))), {
      val b12 = lit17(Ewm.betaSpan(12)); val b26 = lit17(Ewm.betaSpan(26)); val b9 = lit17(Ewm.betaSpan(9))
      val macdStep =
        s"(b.close + $b12 * r.n12)/(1.0 + $b12 * r.d12) - (b.close + $b26 * r.n26)/(1.0 + $b26 * r.d26)"
      val inits =
        """CAST(close AS DOUBLE) AS n12, CAST(1.0 AS DOUBLE) AS d12,
          |    CAST(close AS DOUBLE) AS n26, CAST(1.0 AS DOUBLE) AS d26,
          |    CAST(0.0 AS DOUBLE) AS ns, CAST(1.0 AS DOUBLE) AS ds""".stripMargin
      val steps =
        s"""b.close + $b12 * r.n12, 1.0 + $b12 * r.d12,
           |    b.close + $b26 * r.n26, 1.0 + $b26 * r.d26,
           |    ($macdStep) + $b9 * r.ns, 1.0 + $b9 * r.ds""".stripMargin
      s"""${recCte(inits, steps)}
         |SELECT symbol_id, date,
         |  ${rd("n12/d12 - n26/d26", "macd")},
         |  ${rd("ns/ds", "macd_signal")},
         |  ${rd("(n12/d12 - n26/d26) - ns/ds", "macd_histogram")},
         |  CAST(CASE WHEN n12/d12 - n26/d26 > ns/ds THEN 1 ELSE 0 END AS INTEGER) AS macd_bullish
         |FROM r ORDER BY symbol_id, date""".stripMargin
    })

  // ---------------------------------------------------------------- atr
  private val featAtr = Q(
    (s, d) => keyed(recursiveTable(s, d),
      Recursive.AtrPeriods.flatMap(p => Seq(
        r4(col(s"ohlcv_atr_$p")).as(s"atr_$p"),
        r4(col(s"ohlcv_atr_${p}_pct")).as(s"atr_${p}_pct")))), {
      val trStep = "greatest(b.high - b.low, abs(b.high - r.close), abs(b.low - r.close))"
      val inits = Recursive.AtrPeriods.map(p =>
        s"CAST(high - low AS DOUBLE) AS na$p, CAST(1.0 AS DOUBLE) AS da$p").mkString(",\n    ")
      val steps = Recursive.AtrPeriods.map { p =>
        val b = lit17(Ewm.betaWilder(p))
        s"($trStep) + $b * r.na$p, 1.0 + $b * r.da$p"
      }.mkString(",\n    ")
      val outs = Recursive.AtrPeriods.flatMap { p =>
        val atr = s"CASE WHEN rn >= $p THEN na$p/da$p END"
        Seq(rd(atr, s"atr_$p"),
          rd(s"CASE WHEN close <> 0 THEN ($atr)/close*100.0 END", s"atr_${p}_pct"))
      }
      s"""${recCte(inits, steps)}
         |SELECT symbol_id, date,
         |  ${outs.mkString(",\n  ")}
         |FROM r ORDER BY symbol_id, date""".stripMargin
    })

  val all: Map[String, Q] = Map(
    "feat_ema" -> featEma,
    "feat_rsi" -> featRsi,
    "feat_macd" -> featMacd,
    "feat_atr" -> featAtr)
}
