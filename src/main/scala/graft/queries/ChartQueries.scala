package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.features.Bars
import graft.sqlx.Exact.r4
import OracleSql._

/** Chart data-prep queries — the queryable substance behind the reference's
  * plotting scripts (rendering itself is out of scope):
  *
  *  - `candlestick_prep` (charts/plot_candlesticks.py:16-134): per-symbol
  *    date-range OHLCV with the up/down volume-bar color and the
  *    quarter-start reference-line markers the chart draws.
  *  - `signal_viz_frame` (backtesting/visualize_signals_with_indicators.py:
  *    58-170): the price + indicator frame LEFT-joined to every strategy's
  *    buy/sell signals for the plot window — the reference's three
  *    per-symbol queries + pandas merges as one distributed join.
  *
  * Both pin a representative date window (the reference takes start/end as
  * CLI arguments); the candlestick scan prunes at the source (the events
  * predicate pushes to the parquet scan), while the viz frame filters after
  * feature computation — indicators need the full preceding history.
  */
object ChartQueries {

  private val RangeStart = "2024-01-10"
  private val RangeEnd = "2024-01-25"

  private val candlestickPrep = Q(
    (s, d) => {
      val w = Window.partitionBy(col("symbol_id"), year(col("date")), quarter(col("date")))
        .orderBy("date")
      // push the range predicate below the aggregation: bar date = event
      // date, so filtering events by ts date is exactly the bar-range filter
      // and reaches the parquet scan
      val events = Tables.events(s, d)
        .where(col("ts").cast("date").between(lit(RangeStart).cast("date"), lit(RangeEnd).cast("date")))
      Bars.daily(events)
        .withColumn("color", when(col("close") >= col("open"), lit("green")).otherwise(lit("red")))
        .withColumn("quarter_label",
          concat(year(col("date")).cast("string"), lit("-Q"), quarter(col("date")).cast("string")))
        .withColumn("is_quarter_start", row_number().over(w) === 1)
        .orderBy("symbol_id", "date")
    },
    s"""WITH $barsCte
       |SELECT symbol_id, date, open, high, low, close, volume,
       |  CASE WHEN close >= open THEN 'green' ELSE 'red' END AS color,
       |  CAST(year(date) AS VARCHAR) || '-Q' || CAST(quarter(date) AS VARCHAR) AS quarter_label,
       |  (row_number() OVER (PARTITION BY symbol_id, year(date), quarter(date) ORDER BY date) = 1) AS is_quarter_start
       |FROM b
       |WHERE date BETWEEN DATE '$RangeStart' AND DATE '$RangeEnd'
       |ORDER BY symbol_id, date""".stripMargin)

  private val signalVizFrame = Q(
    (s, d) => {
      val f = SignalQueries.signalFeatures(s, d)
      val px = f
        .where(col("date").between(lit(RangeStart).cast("date"), lit(RangeEnd).cast("date")))
        .select(col("symbol_id"), col("date"), col("open"), col("high"), col("low"),
          col("close"), col("volume"),
          r4(col("ohlcv_rsi_14")).as("rsi_14"),
          r4(col("ohlcv_willr_14")).as("willr_14"),
          r4(col("ohlcv_ema_8")).as("ema_8"),
          r4(col("ohlcv_ema_21")).as("ema_21"),
          r4(col("ohlcv_sma_20")).as("sma_20"),
          r4(col("ohlcv_macd")).as("macd"),
          r4(col("ohlcv_macd_signal")).as("macd_signal"),
          r4(col("ohlcv_macd_histogram")).as("macd_histogram"))
      val sigs = SignalQueries.allSignals(s, d)
        .withColumn("signal_strength", r4(col("signal_strength")))
      px.join(sigs, Seq("symbol_id", "date"), "left")
        .orderBy(col("symbol_id"), col("date"),
          col("trade_strategy").asc_nulls_first, col("buy_signal").asc_nulls_first)
    },
    s"""${SignalQueries.featCte},
       |sigall AS (
       |  ${SignalQueries.allScoredSubquery}
       |),
       |px AS (
       |  SELECT f.symbol_id, f.date, b2.open, f.high, f.low, f.close, f.volume,
       |    ${rd("f.rsi_14", "rsi_14")},
       |    ${rd("f.willr_14", "willr_14")},
       |    ${rd("f.ema_8", "ema_8")},
       |    ${rd("f.ema_21", "ema_21")},
       |    ${rd("f.sma_20", "sma_20")},
       |    ${rd("f.macd", "macd")},
       |    ${rd("f.macd_signal", "macd_signal")},
       |    ${rd("f.macd_histogram", "macd_histogram")}
       |  FROM feat f JOIN b b2 ON f.symbol_id = b2.symbol_id AND f.date = b2.date
       |  WHERE f.date BETWEEN DATE '$RangeStart' AND DATE '$RangeEnd'
       |)
       |SELECT px.*, s.buy_signal, s.sell_signal, s.trade_strategy, s.signal_strength
       |FROM px LEFT JOIN sigall s ON px.symbol_id = s.symbol_id AND px.date = s.date
       |ORDER BY px.symbol_id, px.date, s.trade_strategy ASC NULLS FIRST, s.buy_signal ASC NULLS FIRST""".stripMargin)

  /** Trade-marker overlay frame (backtesting/visualize_signals.py:152-260):
    * the completed backtest trades read back from the CSV handoff
    * (`get_completed_trades_for_symbol`, the cooldown-trades fallback at
    * :170-185) unpivoted into entry/exit marker rows and joined onto the
    * daily price frame — the reference's per-trade scatter lookup
    * (`price_df[price_df['date'] == trade['entry_date']]`, :245-260) as one
    * distributed join. Marker price is the bar close at the marker date
    * (markers whose date has no bar are dropped, exactly the reference's
    * behavior); color is the trade's P&L sign. The reference's plot window
    * is a CLI argument — the frame covers the full history and a consumer
    * slices its window.
    *
    * Scale shape: completed trades are tiny next to the price history, so
    * the marker side broadcasts into the bars join — no shuffle of the
    * price frame. */
  private val tradeOverlayFrame = Q(
    (s, d) => {
      val src = BacktestQueries.simulatedTrades(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft-backtest-trades-csv-${graft.sqlx.PathTag.of(d)}"
      graft.sources.CsvTables.write(src, path)
      val t = graft.sources.CsvTables.read(s, path, src.schema)
      def side(marker: String, dateCol: String) =
        t.select(col("symbol_id"), col("trade_strategy"), col("entry_date"),
          lit(marker).as("marker"), col(dateCol).as("marker_date"), col("pnl"))
      val markers = side("entry", "entry_date").unionByName(side("exit", "exit_date"))
      val bars = Bars.daily(Tables.events(s, d))
        .select(col("symbol_id"), col("date").as("marker_date"), col("close"))
      broadcast(markers).join(bars, Seq("symbol_id", "marker_date"))
        .select(col("symbol_id"), col("trade_strategy"), col("entry_date"),
          col("marker"), col("marker_date"), col("close").as("marker_price"),
          when(col("pnl") > 0, lit("green")).otherwise(lit("red")).as("color"),
          col("pnl"))
        .orderBy("symbol_id", "trade_strategy", "entry_date", "marker")
    },
    s"""${BacktestQueries.simCte},
       |mk AS (
       |  SELECT trade_strategy, symbol_id, entry_date, 'entry' AS marker,
       |         entry_date AS marker_date, pnl FROM trades_all
       |  UNION ALL
       |  SELECT trade_strategy, symbol_id, entry_date, 'exit',
       |         exit_date, pnl FROM trades_all
       |)
       |SELECT m.symbol_id, m.marker_date, m.trade_strategy, m.entry_date,
       |       m.marker, b2.close AS marker_price,
       |       CASE WHEN m.pnl > 0 THEN 'green' ELSE 'red' END AS color,
       |       m.pnl
       |FROM mk m JOIN b b2 ON b2.symbol_id = m.symbol_id AND b2.date = m.marker_date
       |ORDER BY m.symbol_id, m.trade_strategy, m.entry_date, m.marker""".stripMargin)

  val all: Map[String, Q] = Map(
    "candlestick_prep" -> candlestickPrep,
    "signal_viz_frame" -> signalVizFrame,
    "trade_overlay_frame" -> tradeOverlayFrame)
}
