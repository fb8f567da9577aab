package graft.queries

import org.apache.spark.sql.functions._
import graft.etl.{SymbolUniverse, Watermarks}
import graft.sqlx.Exact.r4
import OracleSql._

/** Incremental-ETL queries: watermark stale-symbol detection, the
  * symbol-universe upsert, and the end-to-end incremental feature run
  * (transformation_watermark_manager.py:198-325 feeding
  * transform_time_series_daily_adjusted.py:725 via run_daily_transform.py's
  * incremental mode). */
object EtlQueries {

  /** Watermark table + stale filter, shared by both oracle queries. */
  private val wmCte: String =
    s"""ld AS (
       |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_date_processed
       |  FROM orders GROUP BY 1
       |),
       |wm AS (
       |  SELECT c_custkey AS symbol_id,
       |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_custkey % 240 END AS last_run_age_hours,
       |    CAST(c_custkey % 5 AS INTEGER) AS consecutive_failures,
       |    c_mktsegment <> 'MACHINERY' AS transformation_eligible,
       |    CASE WHEN c_nationkey % 10 = 9 THEN 'Delisted' ELSE 'Active' END AS status,
       |    ld.last_date_processed
       |  FROM customer LEFT JOIN ld ON c_custkey = o_custkey
       |),
       |stale AS (
       |  SELECT * FROM wm
       |  WHERE transformation_eligible
       |    AND consecutive_failures < 3
       |    AND (last_run_age_hours IS NULL OR last_run_age_hours >= ${Watermarks.StalenessHours})
       |    AND (status = 'Active'
       |         OR (status = 'Delisted' AND (last_date_processed IS NULL OR last_date_processed < DATE '2000-01-01')))
       |)""".stripMargin

  private val watermarkStale = Q(
    (s, d) => Watermarks.staleSymbols(Watermarks.watermarkTable(s, d)),
    s"""WITH $wmCte
       |SELECT * FROM stale
       |ORDER BY last_run_age_hours DESC NULLS FIRST, symbol_id""".stripMargin)

  /** The reference's core operational loop, end-to-end: stale symbols gate
    * the feature recomputation. The stale list broadcasts and semi-joins the
    * event scan BEFORE any feature work, so an incremental run reads and
    * shuffles only stale symbols' rows — at 100 TB this is the difference
    * between a full rebuild and touching a few partitions. */
  private val watermarkIncrementalFeatures = Q(
    (s, d) => {
      val stale = Watermarks.staleSymbols(Watermarks.watermarkTable(s, d))
        .select(col("symbol_id"), col("last_run_age_hours"))
      val events = graft.Tables.events(s, d)
        .join(broadcast(stale.select(col("symbol_id").as("user_id"))), Seq("user_id"), "left_semi")
      val feats = graft.features.Indicators.windowed(graft.features.Bars.daily(events))
      feats.join(broadcast(stale), Seq("symbol_id"))
        .select(col("symbol_id"), col("date"), col("close"),
          r4(col("ohlcv_sma_20")).as("sma_20"),
          r4(col("ohlcv_roc_10")).as("roc_10"),
          col("last_run_age_hours"))
        .orderBy("symbol_id", "date")
    },
    s"""WITH $wmCte,
       |$barsCte,
       |f AS (
       |  SELECT symbol_id, date, close, rn,
       |    CASE WHEN rn >= 20 THEN ${decSum("close", 20)}/20 END AS sma_20,
       |    lag(close, 10) OVER ($bySymbol) AS prev10
       |  FROM b
       |)
       |SELECT f.symbol_id, f.date, f.close,
       |  ${rd("sma_20", "sma_20")},
       |  ${rd("CASE WHEN prev10 <> 0 THEN (f.close - prev10) / prev10 * 100.0 END", "roc_10")},
       |  w.last_run_age_hours
       |FROM f JOIN stale w ON f.symbol_id = w.symbol_id
       |ORDER BY f.symbol_id, f.date""".stripMargin)

  /** Watermark status rollup (check_watermarks.py:14-27): fresh vs stale
    * counts within the 48h horizon plus age extremes — one global aggregate
    * over the (tiny) watermark table. */
  private val watermarkStatus = Q(
    (s, d) => Watermarks.watermarkTable(s, d).agg(
      count(lit(1)).as("total_symbols"),
      sum(when(col("last_run_age_hours").isNotNull && col("last_run_age_hours") < 48, 1L)
        .otherwise(0L)).as("recent_48h"),
      sum(when(col("last_run_age_hours").isNull || col("last_run_age_hours") >= 48, 1L)
        .otherwise(0L)).as("stale_48h"),
      min(col("last_run_age_hours")).as("freshest_age_hours"),
      max(col("last_run_age_hours")).as("oldest_age_hours")),
    s"""WITH $wmCte
       |SELECT COUNT(*) AS total_symbols,
       |  CAST(SUM(CASE WHEN last_run_age_hours IS NOT NULL AND last_run_age_hours < 48 THEN 1 ELSE 0 END) AS BIGINT) AS recent_48h,
       |  CAST(SUM(CASE WHEN last_run_age_hours IS NULL OR last_run_age_hours >= 48 THEN 1 ELSE 0 END) AS BIGINT) AS stale_48h,
       |  MIN(last_run_age_hours) AS freshest_age_hours,
       |  MAX(last_run_age_hours) AS oldest_age_hours
       |FROM wm""".stripMargin)

  private val symbolUniverse = Q(
    (s, d) => SymbolUniverse.universe(s, d).orderBy("symbol_id"),
    """WITH base AS (
      |  SELECT c_custkey AS symbol_id, c_name AS symbol, c_mktsegment AS segment,
      |         c_acctbal AS acctbal, 1 AS version
      |  FROM customer
      |),
      |inc AS (
      |  SELECT symbol_id, symbol, segment, acctbal + 100.0 AS acctbal, 2 AS version
      |  FROM base WHERE symbol_id % 3 = 0
      |),
      |u AS (SELECT * FROM base UNION ALL SELECT * FROM inc),
      |r AS (SELECT *, row_number() OVER (PARTITION BY symbol_id ORDER BY version DESC) AS rnk FROM u)
      |SELECT symbol_id, symbol, segment, acctbal, version FROM r WHERE rnk = 1
      |ORDER BY symbol_id""".stripMargin)

  val all: Map[String, Q] = Map(
    "watermark_stale" -> watermarkStale,
    "watermark_status" -> watermarkStatus,
    "watermark_incremental_features" -> watermarkIncrementalFeatures,
    "symbol_universe" -> symbolUniverse)
}
