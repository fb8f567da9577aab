package graft.queries

import graft.etl.{SymbolUniverse, Watermarks}

/** Incremental-ETL queries: watermark stale-symbol detection and the
  * symbol-universe upsert (transformation_watermark_manager.py:198-325,
  * transform_load_symbol_universe.py:133). */
object EtlQueries {

  private val watermarkStale = Q(
    (s, d) => Watermarks.staleSymbols(Watermarks.watermarkTable(s, d)),
    s"""WITH ld AS (
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
       |)
       |SELECT * FROM wm
       |WHERE transformation_eligible
       |  AND consecutive_failures < 3
       |  AND (last_run_age_hours IS NULL OR last_run_age_hours >= ${Watermarks.StalenessHours})
       |  AND (status = 'Active'
       |       OR (status = 'Delisted' AND (last_date_processed IS NULL OR last_date_processed < DATE '2000-01-01')))
       |ORDER BY last_run_age_hours DESC NULLS FIRST, symbol_id""".stripMargin)

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
    "symbol_universe" -> symbolUniverse)
}
