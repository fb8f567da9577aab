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

  /** Durable-state roundtrip — the reference's operational cycle with the
    * persistence wired in (transformation_watermark_manager.py:272-325
    * UPDATEs its Postgres table; graft versions a parquet store): detect
    * stale symbols, mark a processed batch successful, COMMIT the updated
    * table through Watermarks.writeState, re-read the store as a restarted
    * session would, and re-run stale detection on the re-read. Processed
    * symbols (age reset to 0) drop out of the stale list only if the write
    * → read roundtrip preserved the update — the oracle computes the
    * post-update stale set from the raw tables directly, so any loss or
    * corruption in the store desyncs the hash. */
  private val watermarkRoundtrip = Q(
    (s, d) => {
      val wm = Watermarks.watermarkTable(s, d)
      val processed = Watermarks.staleSymbols(wm)
        .where(col("symbol_id") % 3 =!= 0).select("symbol_id")
      val updated = Watermarks.updateWatermarks(wm, processed, success = true)
      val root = s"${sys.props("java.io.tmpdir")}/graft-wm-store-${graft.sqlx.PathTag.of(d)}"
      Watermarks.writeState(updated, root)
      Watermarks.staleSymbols(Watermarks.readState(s, root))
    },
    s"""WITH $wmCte,
       |proc AS (SELECT symbol_id FROM stale WHERE symbol_id % 3 <> 0),
       |upd AS (
       |  SELECT symbol_id,
       |    CASE WHEN symbol_id IN (SELECT symbol_id FROM proc) THEN 0 ELSE last_run_age_hours END AS last_run_age_hours,
       |    CASE WHEN symbol_id IN (SELECT symbol_id FROM proc) THEN 0 ELSE consecutive_failures END AS consecutive_failures,
       |    transformation_eligible, status, last_date_processed
       |  FROM wm
       |)
       |SELECT symbol_id, last_run_age_hours, consecutive_failures,
       |       transformation_eligible, status, last_date_processed
       |FROM upd
       |WHERE transformation_eligible
       |  AND consecutive_failures < 3
       |  AND (last_run_age_hours IS NULL OR last_run_age_hours >= ${Watermarks.StalenessHours})
       |  AND (status = 'Active'
       |       OR (status = 'Delisted' AND (last_date_processed IS NULL OR last_date_processed < DATE '2000-01-01')))
       |ORDER BY last_run_age_hours DESC NULLS FIRST, symbol_id""".stripMargin)

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

  /** Pipeline status / gap analysis (rebuild_signals_from_scratch.py:32-108):
    * per-stage row counts, symbol counts and date ranges for raw bars →
    * indicator features → trading signals, plus the raw-vs-transform
    * staleness gap and its NEEDS_UPDATE/UP_TO_DATE verdict. Three 1-row
    * aggregates cross-joined — every side is scalar metadata, so the "join"
    * is three broadcasts regardless of table size. */
  private val pipelineStatus = Q(
    (s, d) => {
      val bars = graft.features.Bars.daily(graft.Tables.events(s, d))
      val feats = SignalQueries.signalFeatures(s, d)
      val sigs = SignalQueries.allSignals(s, d)
      val raw = bars.agg(
        count(lit(1)).as("raw_rows"), countDistinct(col("symbol_id")).as("raw_symbols"),
        min(col("date")).as("raw_min_date"), max(col("date")).as("raw_max_date"))
      val tr = feats.agg(
        count(lit(1)).as("feat_rows"), countDistinct(col("symbol_id")).as("feat_symbols"),
        min(col("date")).as("feat_min_date"), max(col("date")).as("feat_max_date"),
        count(col("ohlcv_ema_8")).as("feat_with_indicators"))
      val sg = sigs.agg(
        count(lit(1)).as("signal_rows"), countDistinct(col("symbol_id")).as("signal_symbols"),
        min(col("date")).as("signal_min_date"), max(col("date")).as("signal_max_date"),
        countDistinct(col("trade_strategy")).as("signal_strategies"))
      raw.crossJoin(tr).crossJoin(sg)
        .withColumn("gap_days",
          datediff(col("raw_max_date"), col("feat_max_date")).cast("long"))
        .withColumn("status",
          when(col("gap_days") > 0, "NEEDS_UPDATE").otherwise("UP_TO_DATE"))
    },
    s"""${SignalQueries.featCte},
       |sigall AS (
       |  ${SignalQueries.allFlagsSubquery}
       |),
       |r0 AS (
       |  SELECT COUNT(*) AS raw_rows, CAST(COUNT(DISTINCT symbol_id) AS BIGINT) AS raw_symbols,
       |         MIN(date) AS raw_min_date, MAX(date) AS raw_max_date
       |  FROM b
       |),
       |t0 AS (
       |  SELECT COUNT(*) AS feat_rows, CAST(COUNT(DISTINCT symbol_id) AS BIGINT) AS feat_symbols,
       |         MIN(date) AS feat_min_date, MAX(date) AS feat_max_date,
       |         CAST(COUNT(ema_8) AS BIGINT) AS feat_with_indicators
       |  FROM feat
       |),
       |s0 AS (
       |  SELECT COUNT(*) AS signal_rows, CAST(COUNT(DISTINCT symbol_id) AS BIGINT) AS signal_symbols,
       |         MIN(date) AS signal_min_date, MAX(date) AS signal_max_date,
       |         CAST(COUNT(DISTINCT trade_strategy) AS BIGINT) AS signal_strategies
       |  FROM sigall
       |)
       |SELECT r0.*, t0.*, s0.*,
       |  CAST(date_diff('day', feat_max_date, raw_max_date) AS BIGINT) AS gap_days,
       |  CASE WHEN date_diff('day', feat_max_date, raw_max_date) > 0
       |       THEN 'NEEDS_UPDATE' ELSE 'UP_TO_DATE' END AS status
       |FROM r0, t0, s0""".stripMargin)

  /** Date-partitioned event store: write events partitionBy(date) — the
    * reference's raw time-series table as a storage layout — then run the
    * incremental day-range rollup against the store. The scan reads ONLY
    * the three selected days' directories (PartitionedStoreSpec asserts
    * numPartitions == 3); at 100 TB this is the difference between an
    * incremental day job scanning three days and scanning years. */
  private val eventsDayScan = Q(
    (s, d) => {
      import graft.sqlx.Exact
      val path = s"${sys.props("java.io.tmpdir")}/graft-events-bydate-${graft.sqlx.PathTag.of(d)}"
      val ev = graft.Tables.events(s, d).withColumn("date", col("ts").cast("date"))
      graft.sources.PartitionedTables.write(ev, path, Seq("date"))
      graft.sources.PartitionedTables.read(s, path)
        .where(col("date").between(lit("2024-01-12").cast("date"), lit("2024-01-14").cast("date")))
        .groupBy("date", "event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          Exact.decSumAgg(col("value")).as("value_sum"))
        .orderBy("date", "event_type")
    },
    """SELECT CAST(ts AS DATE) AS date, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS value_sum
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-12' AND DATE '2024-01-14'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** Deterministic four-version changelog over the customer table — the
    * CDC fixture both cdc queries and their oracles replay: v1 inserts
    * every key, v2 updates every third (the SymbolUniverse upsert wave),
    * v3 DELETES every seventh, v4 updates every fifth — so keys divisible
    * by 35 exercise the delete-then-reinsert race (the later upsert wins)
    * and keys divisible by 7 but not 5 stay dead. Payload deltas are
    * dyadic (+100.0, +7.5): exact doubles on both engines. */
  private def cdcChanges(s: org.apache.spark.sql.SparkSession, d: String) = {
    val c = graft.Tables.customer(s, d)
    def wave(pred: org.apache.spark.sql.Column, delta: Double, op: String, v: Int) =
      c.where(pred).select(col("c_custkey").as("symbol_id"),
        col("c_name").as("symbol"), col("c_mktsegment").as("segment"),
        (col("c_acctbal") + lit(delta)).as("acctbal"),
        lit(op).as("op"), lit(v).as("version"))
    wave(lit(true), 0.0, "I", 1)
      .unionByName(wave(col("c_custkey") % 3 === 0, 100.0, "U", 2))
      .unionByName(c.where(col("c_custkey") % 7 === 0).select(
        col("c_custkey").as("symbol_id"),
        lit(null).cast("string").as("symbol"), lit(null).cast("string").as("segment"),
        lit(null).cast("double").as("acctbal"),
        lit("D").as("op"), lit(3).as("version")))
      .unionByName(wave(col("c_custkey") % 5 === 0, 7.5, "U", 4))
  }

  /** The changelog union as a DuckDB CTE `ch` — shared by both cdc oracles. */
  private val cdcChangesCte: String =
    """ch AS (
      |  SELECT c_custkey AS symbol_id, c_name AS symbol, c_mktsegment AS segment,
      |         c_acctbal + 0.0 AS acctbal, 'I' AS op, CAST(1 AS INTEGER) AS version
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_mktsegment, c_acctbal + 100.0, 'U', CAST(2 AS INTEGER)
      |  FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
      |         CAST(NULL AS DOUBLE), 'D', CAST(3 AS INTEGER)
      |  FROM customer WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_mktsegment, c_acctbal + 7.5, 'U', CAST(4 AS INTEGER)
      |  FROM customer WHERE c_custkey % 5 = 0
      |)""".stripMargin

  /** CDC latest-wins snapshot (graft.etl.Cdc.applyChanges, §2 #3b): one
    * key-partitioned window over the changelog — no snapshot join — with
    * DELETE semantics and the delete-then-reinsert race decided by
    * version order. */
  private val cdcApplySnapshot = Q(
    (s, d) => graft.etl.Cdc.applyChanges(cdcChanges(s, d), Seq("symbol_id"), "version", "op")
      .withColumnRenamed("op", "last_op")
      .withColumnRenamed("version", "applied_version")
      .orderBy("symbol_id"),
    s"""WITH $cdcChangesCte,
       |rk AS (
       |  SELECT ch.*, row_number() OVER (PARTITION BY symbol_id ORDER BY version DESC) AS rn
       |  FROM ch
       |)
       |SELECT symbol_id, symbol, segment, acctbal, op AS last_op, version AS applied_version
       |FROM rk WHERE rn = 1 AND op <> 'D'
       |ORDER BY symbol_id""".stripMargin)

  /** SCD Type-2 history (graft.etl.Cdc.scd2): every upsert becomes an
    * attribute interval closed by the NEXT change (deletes close without
    * opening); `valid_to IS NULL` marks current rows. */
  private val cdcScd2History = Q(
    (s, d) => graft.etl.Cdc.scd2(cdcChanges(s, d), Seq("symbol_id"), "version", "op")
      .select("symbol_id", "symbol", "segment", "acctbal",
        "valid_from", "valid_to", "is_current")
      .orderBy("symbol_id", "valid_from"),
    s"""WITH $cdcChangesCte,
       |iv AS (
       |  SELECT ch.*,
       |         lead(version) OVER (PARTITION BY symbol_id ORDER BY version) AS valid_to
       |  FROM ch
       |)
       |SELECT symbol_id, symbol, segment, acctbal,
       |       version AS valid_from, valid_to, valid_to IS NULL AS is_current
       |FROM iv WHERE op <> 'D'
       |ORDER BY symbol_id, valid_from""".stripMargin)

  /** Small-file compaction (graft.sources.Compaction, §2 #62c): stage the
    * events table as a deliberately FRAGMENTED date-partitioned store
    * (repartition(8) before partitionBy — eight parallel writers each drop
    * a file into every day they touch, the classic micro-batch-ingest
    * debris), then bin-pack it into a new generation with
    * targetRowsPerFile=2500. The output proves both compaction contracts
    * per day: content survives (rows + decimal value sum ≡ the raw table)
    * and the packed file count is exactly ceil(rows/target) — which is why
    * the file count is oracle-checkable from the raw data alone.
    * CompactionSpec additionally pins the before-state (fragmented days
    * really hold multiple files) and idempotence. */
  private val eventsCompaction = Q(
    (s, d) => {
      import graft.sqlx.Exact
      val tag = graft.sqlx.PathTag.of(d)
      val frag = s"${sys.props("java.io.tmpdir")}/graft-events-frag-$tag"
      val packed = s"${sys.props("java.io.tmpdir")}/graft-events-packed-$tag"
      val target = 2500L
      val ev = graft.Tables.events(s, d).withColumn("date", col("ts").cast("date"))
      graft.sources.PartitionedTables.write(ev.repartition(8), frag, Seq("date"))
      graft.sources.Compaction.compact(s, frag, packed, "date", target)
      val stats = graft.sources.PartitionedTables.read(s, packed)
        .groupBy("date")
        .agg(count(lit(1)).as("n_rows"),
          Exact.decSumAgg(col("value")).as("value_sum"))
      stats.join(
          broadcast(graft.sources.Compaction.fileCountsDf(s, packed, "date")
            .withColumn("date", col("date").cast("date"))),
          Seq("date"))
        .select("date", "n_rows", "n_files", "value_sum")
        .orderBy("date")
    },
    """SELECT CAST(ts AS DATE) AS date,
      |  COUNT(*) AS n_rows,
      |  CAST(CEIL(COUNT(*) / 2500.0) AS BIGINT) AS n_files,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS value_sum
      |FROM events
      |GROUP BY 1 ORDER BY 1""".stripMargin)

  /** The dependency-ordered daily pipeline run end-to-end
    * (graft.etl.Orchestrator — transforms/run_daily_transform.py:1-424):
    * plan() topologically orders the five reference stages (bars →
    * features → signals, with fundamentals and sentiment as independent
    * branches), run() executes them reusing upstream results, and the
    * registered output is the per-stage status report: topological
    * position, dependency list, and the stage's produced row count. The
    * oracle recomputes every stage's cardinality from raw parquet through
    * the SAME CTE chains the stage queries are checked against
    * (SignalQueries.featCte / allFlagsSubquery for the bar→signal spine,
    * FundamentalQueries.prelude for the statement grain, the document
    * (source, lang) grain for sentiment) — so the orchestration wiring,
    * not just each stage in isolation, is oracle-anchored. */
  private val pipelineDailyRun = Q(
    (s, d) => {
      val steps = graft.etl.Orchestrator.dailyPipeline
      val planned = graft.etl.Orchestrator.plan(steps)
      val results = graft.etl.Orchestrator.run(s, d, steps)
      val rows = planned.zipWithIndex.map { case (st, i) =>
        (i + 1, st.name, st.deps.sorted.mkString(","), results(st.name).count())
      }
      import s.implicits._
      rows.toDF("position", "step", "deps", "n_rows").orderBy("position")
    },
    s"""${SignalQueries.featCte},
       |sigall AS MATERIALIZED (
       |  ${SignalQueries.allFlagsSubquery}
       |),
       |${FundamentalQueries.prelude.stripPrefix("WITH ")}
       |SELECT * FROM (
       |  SELECT CAST(1 AS INTEGER) AS position, 'bars' AS step, '' AS deps,
       |         (SELECT COUNT(*) FROM b) AS n_rows
       |  UNION ALL
       |  SELECT 2, 'features', 'bars', (SELECT COUNT(*) FROM feat)
       |  UNION ALL
       |  SELECT 3, 'fundamentals', '', (SELECT COUNT(*) FROM fz)
       |  UNION ALL
       |  SELECT 4, 'sentiment', '',
       |         (SELECT COUNT(*) FROM (SELECT DISTINCT source, lang FROM documents))
       |  UNION ALL
       |  SELECT 5, 'signals', 'features', (SELECT COUNT(*) FROM sigall)
       |)
       |ORDER BY position""".stripMargin)

  /** The full table-maintenance TRANSACTION (graft.sources.TableMaintenance):
    * compact + re-harvest both skipping indexes + generation-pointer flip as
    * one entry point — closing the round-11 gap where compaction wrote a new
    * root but the stats/Bloom indexes still described the OLD files, so
    * skipping silently degraded to scan-everything. The staged store is
    * deliberately hostile to skipping: ingest debris written by 8 unclustered
    * writers, every file spanning the whole (user_id, day) range. maintain()
    * bin-packs it CLUSTERED by the z-value (tight per-file boxes),
    * re-harvests the min/max manifest and Bloom index over the new files,
    * and flips the pointer; the registered output is the box-pruned rollup
    * read through the CURRENT generation's own persisted manifest. Oracle =
    * the plain filtered GROUP BY over raw events (pruning is IO-only);
    * TableMaintenanceSpec pins that pruning is actually RESTORED by the
    * transaction (degraded before, skipping after, stale old manifest prunes
    * nothing). */
  private val eventsMaintenanceCycle = Q(
    (s, d) => {
      import graft.sqlx.Exact
      val tag = graft.sqlx.PathTag.of(d)
      val root = s"${sys.props("java.io.tmpdir")}/graft-events-maint-$tag"
      new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = graft.Tables.events(s, d).select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("day"))
      val mx = ev.agg(max("user_id").as("um"), max("day").as("dm"))
      val withZ = ev.crossJoin(broadcast(mx))
        .withColumn("zval", graft.operators.ZOrder.zValue(
          expr("CAST(user_id * 32 div (um + 1) AS INT)"),
          expr("CAST(day * 32 div (dm + 1) AS INT)"), 5))
        .drop("um", "dm")
      // gen 1: unclustered 8-writer ingest debris — worst case for boxes
      withZ.repartition(8)
        .write.parquet(graft.sources.TableMaintenance.dataPath(root, 1L))
      graft.sources.TableMaintenance.initGen(s, root, Seq("user_id", "day"), Seq("user_id"))
      graft.sources.TableMaintenance.maintain(
        s, root, "zval", 2500L, Seq("user_id", "day"), Seq("user_id"))
      val Array(um, dm) = mx.collect().head match {
        case r => Array(r.getLong(0), r.getInt(1).toLong)
      }
      graft.sources.TableMaintenance.readCurrentPruned(s, root,
          Seq(("user_id", (um / 5).toDouble, (um / 2).toDouble),
              ("day", (dm / 5).toDouble, (dm / 2).toDouble)),
          col("user_id").between(um / 5, um / 2) && col("day").between(dm / 5, dm / 2))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"), Exact.decSumAgg(col("value")).as("value_sum"))
        .orderBy("event_type")
    },
    """WITH ev AS (
      |  SELECT user_id, event_type, value,
      |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS INTEGER) AS day
      |  FROM events
      |),
      |mx AS (SELECT MAX(user_id) AS um, MAX(day) AS dm FROM ev)
      |SELECT event_type, COUNT(*) AS n_rows,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS value_sum
      |FROM ev CROSS JOIN mx
      |WHERE user_id BETWEEN um // 5 AND um // 2 AND day BETWEEN dm // 5 AND dm // 2
      |GROUP BY 1 ORDER BY 1""".stripMargin)

  /** Row-level forget ("right to be forgotten") on the maintained events
    * store (graft.sources.TableMaintenance.forget) — the deletion-vector
    * two-phase shape a 100 TB table needs for takedown/GDPR requests:
    * the forget request (every event of users user_id % 17 = 3) lands as
    * an O(delete-set) committed tombstone version touching NO data file;
    * every current-version read masks it immediately via a broadcast
    * anti-join; the next maintain() purges it physically and re-harvests
    * both skipping indexes, so the forgotten keys' Bloom probes prune
    * every file. The registered output is the same per-type rollup read
    * BOTH ways — 'masked' (tombstone-masked scan, pre-purge) and 'purged'
    * (post-maintenance physical read) — which must be identical: logical
    * erasure and physical erasure answer queries the same. Oracle = the
    * rollup over raw events minus the forgotten users, cross-joined with
    * the two stage labels. TombstoneSpec pins what the rollup can't show:
    * forget touches no bytes, purge empties the Bloom probe, readAsOf
    * keeps as-of semantics, and the second cycle completes physical
    * erasure (the vacuumed-generation timeline). */
  private val eventsForget = Q(
    (s, d) => {
      import graft.sqlx.Exact
      val tag = graft.sqlx.PathTag.of(d)
      val root = s"${sys.props("java.io.tmpdir")}/graft-events-forget-$tag"
      new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = graft.Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      ev.repartition(4)
        .write.parquet(graft.sources.TableMaintenance.dataPath(root, 1L))
      graft.sources.TableMaintenance.initGen(s, root, Seq("user_id"), Seq("user_id"))
      graft.sources.TableMaintenance.forget(s, root, "user_id",
        ev.where(col("user_id") % 17 === 3).select("user_id"))
      def rollup(df: org.apache.spark.sql.DataFrame, stage: String) =
        df.groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"), Exact.decSumAgg(col("value")).as("value_sum"))
          .withColumn("stage", lit(stage))
      val masked = rollup(graft.sources.TableMaintenance.readCurrent(s, root), "masked")
      graft.sources.TableMaintenance.maintain(
        s, root, "user_id", 50000L, Seq("user_id"), Seq("user_id"))
      val purged = rollup(graft.sources.TableMaintenance.readCurrent(s, root), "purged")
      masked.unionByName(purged)
        .select("stage", "event_type", "n_rows", "value_sum")
        .orderBy("stage", "event_type")
    },
    """WITH st AS (SELECT 'masked' AS stage UNION ALL SELECT 'purged')
      |SELECT st.stage, event_type, COUNT(*) AS n_rows,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS value_sum
      |FROM events CROSS JOIN st
      |WHERE user_id % 17 <> 3
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** MV maintenance under DELETES (graft.etl.MaterializedAgg.retract) —
    * the retraction half of incremental view maintenance: the invertible
    * aggregates (count, exact decimal sum) subtract the delete-set's
    * partials algebraically; MIN/MAX, which have no inverse, are
    * recomputed only for the BOUNDARY groups whose deleted rows touched
    * the stored extreme, via a semi-join-pruned pass over the remaining
    * base. The registered output is the finalized view after retracting
    * every event of users user_id % 17 = 3 from the initialized full
    * rollup; oracle = the plain GROUP BY over events minus those users —
    * retraction ≡ recompute bit-for-bit, the same MV contract as the
    * insert path. MaterializedAggSpec adds the boundary-recompute,
    * group-disappears and bad-batch-aborts properties. */
  /** The finalized rollup minus the forgotten users — the oracle for BOTH
    * retraction paths (batch [[mvDeleteRefresh]] and the streaming twin
    * in StreamingBatchQueries): one retraction or n delete micro-batches,
    * the view must equal this recompute. */
  private[queries] val mvEventsRollupMinusForgottenSql: String =
    s"""SELECT event_type, CAST(ts AS DATE) AS date,
       |  COUNT(*) AS n_rows,
       |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS value_sum,
       |  ${rnd("CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) / COUNT(value)", 4)} AS value_avg,
       |  MIN(value) AS value_min,
       |  MAX(value) AS value_max
       |FROM events
       |WHERE user_id % 17 <> 3
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val mvDeleteRefresh = Q(
    (s, d) => {
      val keys = Seq("event_type", "date")
      val tag = graft.sqlx.PathTag.of(d)
      val root = s"${sys.props("java.io.tmpdir")}/graft-mv-retract-$tag"
      val ev = graft.Tables.events(s, d).withColumn("date", col("ts").cast("date"))
      graft.etl.MaterializedAgg.writeInit(ev, keys, "value", root)
      val gone = col("user_id") % 17 === 3
      graft.etl.MaterializedAgg.retract(
        s, root, ev.where(gone), ev.where(!gone), keys, "value")
      graft.etl.MaterializedAgg.read(s, root, keys).orderBy("event_type", "date")
    },
    mvEventsRollupMinusForgottenSql)

  /** ONE takedown request driving EVERY derived store — the lifecycle a
    * real compliance delete runs, composed from the proven halves: the
    * same delete set (users user_id % 23 = 7) lands as tombstones on the
    * maintained base store (forget → maintain purge) AND as a retraction
    * on the materialized rollup (MaterializedAgg.retract), and the
    * registered output reads the SAME (event_type, date) audit from BOTH
    * surfaces — base-store scan and MV state — which must agree with each
    * other and with the oracle's raw-minus-forgotten recompute. Both
    * surfaces produce the exact decimal sum of the same surviving rows,
    * so their doubles are bit-identical by construction; a store the
    * request missed, or a retraction that drifted, breaks the hash. */
  private val forgetCascade = Q(
    (s, d) => {
      import graft.sqlx.Exact
      val tag = graft.sqlx.PathTag.of(d)
      val root = s"${sys.props("java.io.tmpdir")}/graft-forget-cascade-$tag"
      val rootMv = s"$root-mv"
      val fsys = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(root), true)
      val keys = Seq("event_type", "date")
      val ev = graft.Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          col("ts").cast("date").as("date"))
      // the base store and the MV are DIFFERENT stores: their staging and
      // their halves of the takedown have no happens-before edge, so each
      // pair runs concurrently (guide §2.6) — program order is preserved
      // WITHIN each store (write→init→forget→maintain; init→retract)
      val gone = col("user_id") % 23 === 7
      graft.sqlx.Par.run(
        () => {
          ev.repartition(4)
            .write.parquet(graft.sources.TableMaintenance.dataPath(root, 1L))
          graft.sources.TableMaintenance.initGen(s, root, Seq("user_id"), Seq("user_id"))
        },
        () => graft.etl.MaterializedAgg.writeInit(ev, keys, "value", rootMv))
      graft.sqlx.Par.run(
        () => {
          graft.sources.TableMaintenance.forget(s, root, "user_id",
            ev.where(gone).select("user_id"))
          graft.sources.TableMaintenance.maintain(
            s, root, "user_id", 50000L, Seq("user_id"), Seq("user_id"))
        },
        () => graft.etl.MaterializedAgg.retract(
          s, rootMv, ev.where(gone), ev.where(!gone), keys, "value"))
      val fromStore = graft.sources.TableMaintenance.readCurrent(s, root)
        .groupBy("event_type", "date")
        .agg(count(lit(1)).as("n_rows"), Exact.decSumAgg(col("value")).as("value_sum"))
        .withColumn("surface", lit("store"))
      val fromMv = graft.etl.MaterializedAgg.read(s, rootMv, keys)
        .select(col("event_type"), col("date"), col("n_rows"), col("value_sum"))
        .withColumn("surface", lit("view"))
      fromStore.unionByName(fromMv)
        .select("surface", "event_type", "date", "n_rows", "value_sum")
        .orderBy("surface", "event_type", "date")
    },
    """WITH su AS (SELECT 'store' AS surface UNION ALL SELECT 'view')
      |SELECT su.surface, event_type, CAST(ts AS DATE) AS date,
      |  COUNT(*) AS n_rows,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS value_sum
      |FROM events CROSS JOIN su
      |WHERE user_id % 23 <> 7
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)

  /** The FULL compliance cascade — "forget these documents EVERYWHERE",
    * one request driving all three derived surfaces a deployment serves
    * from: the maintained base store (TableMaintenance.forget → maintain
    * purge), the materialized per-source rollup (MaterializedAgg.retract),
    * and the ANN serving index (IvfPq.deleteFromIndex on the same ids).
    * The registered audit reads each surface back independently —
    * surviving per-source doc/char rollups from store and view, and the
    * serving index's actual membership (IvfPq.storedIds: count + id-sum of
    * the vec_ids still in the committed codes) — against ONE oracle
    * computing the same three projections from raw-minus-forgotten. A
    * surface the request missed, a retraction that drifted, or a delete
    * that left (or dropped) a vector breaks the hash. The per-surface
    * mechanics (tombstone masking, decimal-exact subtraction, cell-pruned
    * code rewrites, probe correctness post-delete) each keep their own
    * query/spec (`events_forget`, `mv_delete_refresh`, `ann_forget`);
    * this row witnesses the COMPOSITION. */
  private val forgetCascadeFull = Q(
    (s, d) => {
      val tag = graft.sqlx.PathTag.of(d)
      val root = s"${sys.props("java.io.tmpdir")}/graft-forget-full-$tag"
      val fsys = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(root), true)
      val docs = graft.Tables.documents(s, d).select("doc_id", "source", "n_chars")
      val emb = graft.Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      // stage the three serving surfaces from the same corpus, then apply
      // the takedown to each — the surfaces are INDEPENDENT stores, so
      // staging and the three request halves run concurrently (guide
      // §2.6); program order holds within each surface (write→init→
      // forget→maintain; init→retract; write→delete)
      val gone = col("doc_id") % 23 === 7
      graft.sqlx.Par.run(
        () => {
          docs.repartition(4)
            .write.parquet(graft.sources.TableMaintenance.dataPath(s"$root/store", 1L))
          graft.sources.TableMaintenance.initGen(
            s, s"$root/store", Seq("doc_id"), Seq("doc_id"))
        },
        () => graft.etl.MaterializedAgg.writeInit(
          docs, Seq("source"), "n_chars", s"$root/mv"),
        () => graft.ann.IvfPq.writeIndex(emb, s"$root/index", dim = 64))
      // ONE takedown request: documents (= vectors) with id % 23 = 7
      graft.sqlx.Par.run(
        () => {
          graft.sources.TableMaintenance.forget(
            s, s"$root/store", "doc_id", docs.where(gone).select("doc_id"))
          graft.sources.TableMaintenance.maintain(
            s, s"$root/store", "doc_id", 50000L, Seq("doc_id"), Seq("doc_id"))
        },
        () => graft.etl.MaterializedAgg.retract(
          s, s"$root/mv", docs.where(gone), docs.where(!gone), Seq("source"), "n_chars"),
        () => graft.ann.IvfPq.deleteFromIndex(
          s, s"$root/index", emb.where(col("vec_id") % 23 === 7).select("vec_id"),
          incrementId = 1L))
      // independent read-back of every surface
      val fromStore = graft.sources.TableMaintenance.readCurrent(s, s"$root/store")
        .groupBy(col("source").as("grp"))
        .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("payload_sum"))
        .withColumn("surface", lit("store"))
      val fromMv = graft.etl.MaterializedAgg.read(s, s"$root/mv", Seq("source"))
        .select(col("source").as("grp"), col("n_rows"),
          col("value_sum").cast("long").as("payload_sum"))
        .withColumn("surface", lit("view"))
      val fromIndex = graft.ann.IvfPq.storedIds(s, s"$root/index")
        .agg(count(lit(1)).as("n_rows"), sum(col("vec_id")).as("payload_sum"))
        .withColumn("grp", lit("_index"))
        .withColumn("surface", lit("index"))
      fromStore.unionByName(fromMv).unionByName(fromIndex)
        .select("surface", "grp", "n_rows", "payload_sum")
        .orderBy("surface", "grp")
    },
    """WITH surv AS (SELECT source, n_chars FROM documents WHERE doc_id % 23 <> 7),
      |st AS (SELECT 'store' AS surface, source AS grp, COUNT(*) AS n_rows,
      |              CAST(SUM(n_chars) AS BIGINT) AS payload_sum
      |       FROM surv GROUP BY 2),
      |vw AS (SELECT 'view' AS surface, source AS grp, COUNT(*) AS n_rows,
      |              CAST(SUM(n_chars) AS BIGINT) AS payload_sum
      |       FROM surv GROUP BY 2),
      |ix AS (SELECT 'index' AS surface, '_index' AS grp, COUNT(*) AS n_rows,
      |              CAST(SUM(vec_id) AS BIGINT) AS payload_sum
      |       FROM embeddings WHERE vec_id % 23 <> 7)
      |SELECT * FROM st UNION ALL SELECT * FROM vw UNION ALL SELECT * FROM ix
      |ORDER BY 1, 2""".stripMargin)

  /** Registered witness for the optimistic-concurrency protocol
    * (graft.sources.CommittedVersions — round 13's CAS commit, previously
    * spec-only): a deterministic conflict REPLAY of the exact two-writer
    * race ConcurrencySpec runs live. Writers A and B both read head v=1;
    * A commits v=2 and wins; B's CAS at the SAME version must lose with a
    * loud ConcurrentCommitException (recorded as the conflict row — if
    * the CAS ever let both win, the row disappears and the hash breaks);
    * B then re-reads the head, sees A's commit, and rebases at v=3. The
    * registered output is the chain READ BACK FROM DISK — version by
    * version, each payload row-counted from events — plus the loser
    * marker, so the oracle also witnesses one-winner-per-version: v=2
    * must hold exactly A's payload, never B's. */
  private val storeCommitChain = Q(
    (s, d) => {
      import s.implicits._
      val tag = graft.sqlx.PathTag.of(d)
      val base = s"${sys.props("java.io.tmpdir")}/graft-commit-chain-$tag"
      val root = s"$base/_current"
      val fsys = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(base), true)
      val ev = graft.Tables.events(s, d)
      // one-row driver-resident payloads: staged driver-side
      // (TinyParquet.write via publishRowsVersion) — five coalesce(1)
      // Spark jobs of pure fixed cost removed from the chain (round 18);
      // the CAS protocol under test is byte-for-byte the same rename
      def publish(writer: String, n: Long, v: Long) =
        graft.sources.CommittedVersions.publishRowsVersion(
          s, root, v, "commit-chain",
          Seq("writer" -> "string", "n" -> "long"), Seq(Seq[Any](writer, n)))
      publish("init", 0L, 1L)
      // both writers read the same head
      val head = graft.sources.CommittedVersions.latest(s, root).get
      val nA = ev.where(col("event_id") % 2 === 0).count()
      val nB = ev.where(col("event_id") % 2 === 1).count()
      // A commits first and wins v=2
      publish("a", nA, head + 1L)
      // B's CAS against its (now stale) head MUST lose loudly
      val conflict =
        try {
          publish("b", nB, head + 1L)
          Seq.empty[(Long, String, Long, Boolean)]
        } catch {
          case _: graft.sources.ConcurrentCommitException =>
            Seq((head + 1L, "b", nB, true))
        }
      // B re-reads the head (sees A's v=2) and rebases
      val head2 = graft.sources.CommittedVersions.latest(s, root).get
      publish("b", nB, head2 + 1L)
      // the committed chain, read back from disk — one-row payloads, read
      // driver-side (a Spark job per version before round 17)
      val chain = graft.sources.CommittedVersions.list(s, root).sorted.map { v =>
        val r = graft.sources.TinyParquet.rows(s, s"$root/v=$v").head
        (v, r.string("writer"), r.long("n"), false)
      }
      (chain ++ conflict).toDF("version", "writer", "n", "conflict")
        .orderBy("version", "writer")
    },
    """WITH ne AS (SELECT CAST(COUNT(*) FILTER (event_id % 2 = 0) AS BIGINT) AS na,
      |                  CAST(COUNT(*) FILTER (event_id % 2 = 1) AS BIGINT) AS nb
      |           FROM events)
      |SELECT CAST(1 AS BIGINT) AS version, 'init' AS writer,
      |       CAST(0 AS BIGINT) AS n, FALSE AS conflict FROM ne
      |UNION ALL SELECT 2, 'a', na, FALSE FROM ne
      |UNION ALL SELECT 2, 'b', nb, TRUE FROM ne
      |UNION ALL SELECT 3, 'b', nb, FALSE FROM ne
      |ORDER BY version, writer""".stripMargin)

  /** Schema evolution on a mixed-generation parquet store — the contract
    * every long-lived 100 TB table hits the week ingest adds a column:
    * old files lack it, new files carry it, and the store must stay
    * readable WITHOUT rewriting history. Staged here as two generations
    * of the events table appended under one root (gen 1 without
    * `value_bucket`, gen 2 with it — an integer derivation so the oracle
    * is hazard-free), read back with mergeSchema: the union schema
    * resolves, old-generation rows surface the new column as NULL (never
    * fabricated), and the rollup's null accounting proves exactly which
    * generation each row came from. Oracle = the same rollup from raw
    * events with the generation rule inlined. SchemaEvolutionSpec pins
    * the schema union, the null placement, and that the evolved store
    * needs no rewrite (gen-1 files byte-identical after the append). */
  private val eventsSchemaEvolution = Q(
    (s, d) => {
      import graft.sqlx.Exact
      val tag = graft.sqlx.PathTag.of(d)
      val root = s"${sys.props("java.io.tmpdir")}/graft-events-schevo-$tag"
      new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = graft.Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      ev.where(col("event_id") % 2 === 0)
        .write.parquet(s"$root/part=a")
      ev.where(col("event_id") % 2 === 1)
        .withColumn("value_bucket", (col("event_id") % 100).cast("int"))
        .write.parquet(s"$root/part=b")
      s.read.option("mergeSchema", "true").parquet(root)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("value_bucket")).as("n_with_bucket"),
          sum(col("value_bucket").cast("long")).as("bucket_sum"),
          Exact.decSumAgg(col("value")).as("value_sum"))
        .orderBy("event_type")
    },
    """SELECT event_type,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_bucket,
      |  CAST(SUM(CASE WHEN event_id % 2 = 1 THEN event_id % 100 END) AS BIGINT) AS bucket_sum,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS value_sum
      |FROM events
      |GROUP BY 1 ORDER BY 1""".stripMargin)

  /** Incremental materialized-view maintenance (graft.etl.MaterializedAgg):
    * the daily events rollup is stored as PARTIAL aggregate state bucketed
    * on the group-key hash; the increment (a deterministic 20% slice
    * standing in for today's ingest) folds in by merging partials and
    * rewriting ONLY the touched bucket partitions. The registered output
    * is the finalized view read back from the store after the refresh —
    * oracle = a plain GROUP BY over the whole table, because algebraic
    * partial states merge EXACTLY (counts/decimal sums add, min/max
    * combine), so incremental ≡ recompute bit-for-bit; that equality is
    * precisely the MV-maintenance contract. MaterializedAggSpec adds the
    * untouched-buckets-not-rewritten and multi-increment properties. */
  /** The finalized daily-events rollup as plain SQL — the oracle for BOTH
    * MV-maintenance paths (batch [[mvIncrementalRefresh]] and the
    * streaming twin in StreamingBatchQueries): however the view got there
    * (one merge, n micro-batches), the read must equal this recompute. */
  private[queries] val mvEventsRollupSql: String =
    s"""SELECT event_type, CAST(ts AS DATE) AS date,
       |  COUNT(*) AS n_rows,
       |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS value_sum,
       |  ${rnd("CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) / COUNT(value)", 4)} AS value_avg,
       |  MIN(value) AS value_min,
       |  MAX(value) AS value_max
       |FROM events
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val mvIncrementalRefresh = Q(
    (s, d) => {
      val keys = Seq("event_type", "date")
      val tag = graft.sqlx.PathTag.of(d)
      val root = s"${sys.props("java.io.tmpdir")}/graft-mv-events-$tag"
      val ev = graft.Tables.events(s, d).withColumn("date", col("ts").cast("date"))
      graft.etl.MaterializedAgg.writeInit(
        ev.where(col("event_id") % 10 < 8), keys, "value", root)
      graft.etl.MaterializedAgg.refresh(
        s, root, ev.where(col("event_id") % 10 >= 8), keys, "value")
      graft.etl.MaterializedAgg.read(s, root, keys).orderBy("event_type", "date")
    },
    mvEventsRollupSql)

  /** Min/max file-skipping scan (graft.sources.StatsManifest) — the IO
    * payoff of the [[eventsZorder]] layout: the events table is written
    * z-ordered (range-partitioned by the Morton value over scaled
    * (user_id, day) cells), a footer-stats manifest is harvested as a
    * metadata job, and a box-shaped predicate reads ONLY the files whose
    * min/max boxes intersect it, re-applying the exact predicate inside.
    * The box bounds derive from the data's own maxima (um/dm), so the
    * query is closed-form at every SF. Pruning is IO-only, never
    * correctness: the oracle is the plain filtered GROUP BY over the raw
    * table, and StatsManifestSpec pins that files really are skipped on
    * the z-ordered layout. */
  private val eventsSkippingScan = Q(
    (s, d) => {
      import graft.sqlx.Exact
      val tag = graft.sqlx.PathTag.of(d)
      val root = s"${sys.props("java.io.tmpdir")}/graft-events-zordered-$tag"
      val ev = graft.Tables.events(s, d).select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("day"))
      val mx = ev.agg(max("user_id").as("um"), max("day").as("dm"))
      ev.crossJoin(broadcast(mx))
        .withColumn("zval", graft.operators.ZOrder.zValue(
          expr("CAST(user_id * 32 div (um + 1) AS INT)"),
          expr("CAST(day * 32 div (dm + 1) AS INT)"), 5))
        .drop("um", "dm")
        .repartitionByRange(16, col("zval"))
        .write.mode("overwrite").parquet(root)
      val Array(um, dm) = mx.collect().head match {
        case r => Array(r.getLong(0), r.getInt(1).toLong)
      }
      val mf = graft.sources.StatsManifest.build(s, root, Seq("user_id", "day"))
      val hit = graft.sources.StatsManifest.readPruned(s, root, mf,
        Seq(("user_id", (um / 5).toDouble, (um / 2).toDouble),
            ("day", (dm / 5).toDouble, (dm / 2).toDouble)),
        col("user_id").between(um / 5, um / 2) && col("day").between(dm / 5, dm / 2))
      hit.groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"), Exact.decSumAgg(col("value")).as("value_sum"))
        .orderBy("event_type")
    },
    """WITH ev AS (
      |  SELECT user_id, event_type, value,
      |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS INTEGER) AS day
      |  FROM events
      |),
      |mx AS (SELECT MAX(user_id) AS um, MAX(day) AS dm FROM ev)
      |SELECT event_type, COUNT(*) AS n_rows,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS value_sum
      |FROM ev CROSS JOIN mx
      |WHERE user_id BETWEEN um // 5 AND um // 2 AND day BETWEEN dm // 5 AND dm // 2
      |GROUP BY 1 ORDER BY 1""".stripMargin)

  /** Metadata-only COUNT pushdown (graft.sources.StatsManifest.countPruned
    * — Snowflake/Iceberg's answer-it-from-the-manifest aggregation): on
    * the z-ordered layout a box predicate's INTERIOR files (box fully
    * inside the range, definite zero nulls) are counted from footer row
    * counts with zero data IO; only the boundary sliver is scanned with
    * the exact predicate. Three boxes of increasing width demonstrate the
    * split; the oracle is the plain filtered COUNT per box — pruning and
    * metadata counting are IO-only, never semantics. MetadataCountSpec
    * pins what the count can't show: the interior is genuinely nonempty
    * on this layout, boundary-only IO, and null-bearing predicate columns
    * disqualify metadata counting. */
  private val eventsMetadataCount = Q(
    (s, d) => {
      import s.implicits._
      val tag = graft.sqlx.PathTag.of(d)
      val root = s"${sys.props("java.io.tmpdir")}/graft-events-metacount-$tag"
      val ev = graft.Tables.events(s, d).select(
        col("event_id"), col("user_id"), col("value"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("day"))
      val mx = ev.agg(max("user_id").as("um"), max("day").as("dm"))
      ev.crossJoin(broadcast(mx))
        .withColumn("zval", graft.operators.ZOrder.zValue(
          expr("CAST(user_id * 32 div (um + 1) AS INT)"),
          expr("CAST(day * 32 div (dm + 1) AS INT)"), 5))
        .drop("um", "dm")
        .repartitionByRange(16, col("zval"))
        .write.mode("overwrite").parquet(root)
      val Array(um, dm) = mx.collect().head match {
        case r => Array(r.getLong(0), r.getInt(1).toLong)
      }
      val mf = graft.sources.StatsManifest.build(s, root, Seq("user_id", "day"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def boxCount(label: String, u0: Long, u1: Long, d0: Long, d1: Long): (String, Long) = {
        val (n, _, _) = graft.sources.StatsManifest.countPruned(s, root, mf,
          Seq(("user_id", u0.toDouble, u1.toDouble), ("day", d0.toDouble, d1.toDouble)))
        (label, n)
      }
      val out = Seq(
        boxCount("narrow", um / 5, um / 4, dm / 5, dm / 4),
        boxCount("mid", um / 5, um / 2, dm / 5, dm / 2),
        boxCount("wide", 0, 4 * um / 5, 0, 4 * dm / 5))
      mf.unpersist(false)
      out.toDF("box", "n_rows").orderBy("box")
    },
    """WITH ev AS (
      |  SELECT user_id,
      |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS INTEGER) AS day
      |  FROM events
      |),
      |mx AS (SELECT MAX(user_id) AS um, MAX(day) AS dm FROM ev)
      |SELECT 'narrow' AS box, COUNT(*) AS n_rows FROM ev CROSS JOIN mx
      |  WHERE user_id BETWEEN um // 5 AND um // 4 AND day BETWEEN dm // 5 AND dm // 4
      |UNION ALL
      |SELECT 'mid', COUNT(*) FROM ev CROSS JOIN mx
      |  WHERE user_id BETWEEN um // 5 AND um // 2 AND day BETWEEN dm // 5 AND dm // 2
      |UNION ALL
      |SELECT 'wide', COUNT(*) FROM ev CROSS JOIN mx
      |  WHERE user_id BETWEEN 0 AND 4 * um // 5 AND day BETWEEN 0 AND 4 * dm // 5
      |ORDER BY box""".stripMargin)

  /** Equality file-skipping via the per-file Bloom index
    * (graft.sources.BloomSkipIndex): the events table is written
    * hash-partitioned on event_id — the layout where every file spans the
    * whole user_id range, so [[eventsSkippingScan]]'s min/max boxes prune
    * NOTHING for a point probe; that is exactly the case the Bloom index
    * exists for. The probe user (um // 3, data-derived so closed-form at
    * every SF) resolves through the index to the few files whose bloom
    * bits cover it, and the exact equality is re-applied inside — false
    * positives cost IO, never rows. Oracle = the plain filtered rollup;
    * BloomSkipIndexSpec pins the pruning itself. */
  private val eventsPointLookup = Q(
    (s, d) => {
      import graft.sqlx.Exact
      val tag = graft.sqlx.PathTag.of(d)
      val root = s"${sys.props("java.io.tmpdir")}/graft-events-hashed-$tag"
      val ev = graft.Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      ev.repartition(16, col("event_id"))
        .write.mode("overwrite").parquet(root)
      val um = ev.agg(max("user_id")).head.getLong(0)
      val idx = graft.sources.BloomSkipIndex.build(s, root, Seq("user_id"))
      graft.sources.BloomSkipIndex.readPruned(s, root, idx, "user_id", lit(um / 3))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"), Exact.decSumAgg(col("value")).as("value_sum"))
        .orderBy("event_type")
    },
    """WITH mx AS (SELECT MAX(user_id) AS um FROM events)
      |SELECT event_type, COUNT(*) AS n_rows,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS value_sum
      |FROM events, mx WHERE user_id = um // 3
      |GROUP BY 1 ORDER BY 1""".stripMargin)

  /** Morton z-values over the two event scan dimensions (user_id, day) —
    * graft.operators.ZOrder: the clustering key an OPTIMIZE ZORDER-style
    * layout write range-partitions by so box-shaped (user × day) predicates
    * prune files from footer stats. Both dimensions are first scaled to the
    * SAME 5-bit budget (the rule ZOrder's scaladoc documents — raw
    * interleave of a wide dim with a narrow one degenerates to a
    * single-dim sort) using 1-row max aggregates broadcast like the other
    * EtlQueries scalars. Pure arithmetic end to end, oracle-exact;
    * ZOrderSpec demonstrates the layout benefit. */
  private val eventsZorder = Q(
    (s, d) => {
      val ev = graft.Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("day"))
      val mx = ev.agg(max("user_id").as("um"), max("day").as("dm"))
      ev.crossJoin(broadcast(mx))
        .select(col("event_id"), col("user_id"), col("day"),
          expr("CAST(user_id * 32 div (um + 1) AS INT)").as("u_cell"),
          expr("CAST(day * 32 div (dm + 1) AS INT)").as("d_cell"))
        .withColumn("zval",
          graft.operators.ZOrder.zValue(col("u_cell"), col("d_cell"), 5))
        .orderBy("event_id")
    },
    s"""WITH ev AS (
       |  SELECT event_id, user_id,
       |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS INTEGER) AS day
       |  FROM events
       |),
       |mx AS (SELECT MAX(user_id) AS um, MAX(day) AS dm FROM ev),
       |sc AS (
       |  SELECT event_id, user_id, day,
       |    CAST(user_id * 32 // (um + 1) AS INTEGER) AS u_cell,
       |    CAST(day * 32 // (dm + 1) AS INTEGER) AS d_cell
       |  FROM ev CROSS JOIN mx
       |)
       |SELECT event_id, user_id, day, u_cell, d_cell,
       |  CAST(${graft.operators.ZOrder.zValueSql("u_cell", "d_cell", 5)} AS BIGINT) AS zval
       |FROM sc ORDER BY event_id""".stripMargin)

  val all: Map[String, Q] = Map(
    "watermark_stale" -> watermarkStale,
    "watermark_roundtrip" -> watermarkRoundtrip,
    "events_zorder" -> eventsZorder,
    "watermark_status" -> watermarkStatus,
    "watermark_incremental_features" -> watermarkIncrementalFeatures,
    "symbol_universe" -> symbolUniverse,
    "pipeline_status" -> pipelineStatus,
    "events_day_scan" -> eventsDayScan,
    "events_compaction" -> eventsCompaction,
    "events_maintenance_cycle" -> eventsMaintenanceCycle,
    "events_forget" -> eventsForget,
    "mv_delete_refresh" -> mvDeleteRefresh,
    "forget_cascade" -> forgetCascade,
    "forget_cascade_full" -> forgetCascadeFull,
    "store_commit_chain" -> storeCommitChain,
    "pipeline_daily_run" -> pipelineDailyRun,
    "events_schema_evolution" -> eventsSchemaEvolution,
    "mv_incremental_refresh" -> mvIncrementalRefresh,
    "events_skipping_scan" -> eventsSkippingScan,
    "events_metadata_count" -> eventsMetadataCount,
    "events_point_lookup" -> eventsPointLookup,
    "cdc_apply_snapshot" -> cdcApplySnapshot,
    "cdc_scd2_history" -> cdcScd2History)
}
