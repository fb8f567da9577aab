package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.backtest.{Enrich, Metrics, Simulator}
import graft.etl.SymbolUniverse
import graft.features.Bars
import graft.signals.Strategies

/** Backtest queries: the stateful trade simulation + metrics register
  * rows-only (golden-tested on a hand-computed fixture in BacktestSpec);
  * the enrichment joins carry full mirrored oracles composed from the
  * quality-score prelude. */
object BacktestQueries {

  /** Signals (all 11 strategies, short-ladder config for 30-bar testdata
    * histories) joined with signal-day closes. */
  private def signalsWithClose(s: org.apache.spark.sql.SparkSession, d: String) = {
    val features = SignalQueries.signalFeatures(s, d) // memoized/persisted
    Strategies.all(features, ribbonPeriods = Seq(3, 5, 10, 20), trendSma = 20)
      .join(features.select(col("symbol_id"), col("date"), col("close")), Seq("symbol_id", "date"))
  }

  private val tradeCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.DataFrame]
  private def trades(s: org.apache.spark.sql.SparkSession, d: String) =
    tradeCache.getOrElseUpdate(s"${System.identityHashCode(s)}:$d",
      Simulator.simulate(signalsWithClose(s, d))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  private val backtestTrades = Q(
    (s, d) => trades(s, d).orderBy("trade_strategy", "symbol_id", "entry_date"), None)

  private val backtestMetrics = Q(
    (s, d) => Metrics.perStrategy(trades(s, d)).orderBy("trade_strategy"), None)

  // ---------------------------------------------------------------- enrichment
  private val tradesCte: String =
    """trades AS (
      |  SELECT o_custkey AS symbol_id, CAST(o_orderdate AS DATE) AS entry_date,
      |         CAST(MAX(o_orderkey) % 100 AS DOUBLE) AS signal_strength,
      |         'orders_flow' AS trade_strategy
      |  FROM orders GROUP BY 1, 2
      |)""".stripMargin

  private val scoresJoinCte: String =
    s"""f AS (
       |  SELECT symbol_id AS f_symbol_id, fiscal_q,
       |         fiscal_q + ${Enrich.PublicationLagDays} AS publication_date,
       |         (fiscal_q + ${Enrich.PublicationLagDays}) + ${Enrich.LookforwardDays} AS valid_until_date,
       |         CAST(ROUND(overall_quality_score, 4) AS DOUBLE) AS overall_quality_score,
       |         CAST(ROUND(balance_sheet_quality_score, 4) AS DOUBLE) AS balance_sheet_quality_score,
       |         CAST(ROUND(cash_flow_quality_score, 4) AS DOUBLE) AS cash_flow_quality_score,
       |         CAST(ROUND(income_statement_quality_score, 4) AS DOUBLE) AS income_statement_quality_score,
       |         is_high_quality, is_investment_grade, has_red_flags
       |  FROM scores
       |),
       |j AS (
       |  SELECT t.symbol_id, t.entry_date, t.trade_strategy, t.signal_strength,
       |         f.fiscal_q, f.publication_date, f.valid_until_date,
       |         f.overall_quality_score, f.balance_sheet_quality_score,
       |         f.cash_flow_quality_score, f.income_statement_quality_score,
       |         f.is_high_quality, f.is_investment_grade, f.has_red_flags,
       |         row_number() OVER (PARTITION BY t.symbol_id, t.entry_date, t.trade_strategy
       |                            ORDER BY f.publication_date DESC NULLS LAST) AS rnk
       |  FROM trades t LEFT JOIN f
       |    ON t.symbol_id = f.f_symbol_id
       |   AND f.publication_date <= t.entry_date
       |   AND t.entry_date < f.valid_until_date
       |),
       |enriched AS (SELECT * EXCLUDE (rnk) FROM j WHERE rnk = 1)""".stripMargin

  private def enrichedSpark(s: org.apache.spark.sql.SparkSession, d: String) =
    Enrich.joinFundamentals(Enrich.tradeEntries(s, d), graft.fundamentals.QualityScores.scores(s, d))

  private val tradesFundamentalsJoin = Q(
    (s, d) => enrichedSpark(s, d)
      .select("symbol_id", "entry_date", "trade_strategy", "signal_strength",
        "fiscal_q", "publication_date", "valid_until_date",
        "overall_quality_score", "balance_sheet_quality_score",
        "cash_flow_quality_score", "income_statement_quality_score",
        "is_high_quality", "is_investment_grade", "has_red_flags")
      .orderBy("symbol_id", "entry_date", "trade_strategy"),
    s"""${FundamentalQueries.scoresPrelude},
       |$tradesCte,
       |$scoresJoinCte
       |SELECT * FROM enriched
       |ORDER BY symbol_id, entry_date, trade_strategy""".stripMargin)

  private val tradesFilterThreshold = Q(
    (s, d) => Enrich.filterByPrediction(enrichedSpark(s, d)).orderBy("trade_strategy"),
    s"""${FundamentalQueries.scoresPrelude},
       |$tradesCte,
       |$scoresJoinCte,
       |p AS (
       |  SELECT *, ROUND(1.0 / (1.0 + exp(-(signal_strength - 50.0) / 20.0)), 6) AS success_probability
       |  FROM enriched
       |)
       |SELECT trade_strategy,
       |  COUNT(*) AS n_trades,
       |  CAST(CAST(SUM(CAST(signal_strength AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS sum_strength,
       |  CAST(SUM(CASE WHEN is_high_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_high_quality,
       |  CAST(SUM(CASE WHEN overall_quality_score IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_fundamentals
       |FROM p WHERE success_probability >= 0.6
       |GROUP BY trade_strategy ORDER BY trade_strategy""".stripMargin)

  private val signalScorer = Q(
    (s, d) => Enrich.dailyScores(enrichedSpark(s, d), SymbolUniverse.universe(s, d))
      .select("symbol_id", "symbol", "entry_date", "trade_strategy", "signal_strength",
        "overall_quality_score", "composite_score", "day_rank")
      .orderBy("entry_date", "day_rank"),
    s"""${FundamentalQueries.scoresPrelude},
       |$tradesCte,
       |$scoresJoinCte,
       |ubase AS (
       |  SELECT c_custkey AS symbol_id, c_name AS symbol, c_mktsegment AS segment,
       |         c_acctbal AS acctbal, 1 AS version
       |  FROM customer
       |),
       |uinc AS (
       |  SELECT symbol_id, symbol, segment, acctbal + 100.0 AS acctbal, 2 AS version
       |  FROM ubase WHERE symbol_id % 3 = 0
       |),
       |uu AS (SELECT * FROM ubase UNION ALL SELECT * FROM uinc),
       |ur AS (SELECT *, row_number() OVER (PARTITION BY symbol_id ORDER BY version DESC) AS rnk FROM uu),
       |universe AS (SELECT symbol_id, symbol FROM ur WHERE rnk = 1),
       |scored AS (
       |  SELECT e.*, u.symbol,
       |         e.signal_strength * 0.5 + COALESCE(e.overall_quality_score, 50.0) * 0.5 AS composite_score
       |  FROM enriched e LEFT JOIN universe u ON e.symbol_id = u.symbol_id
       |)
       |SELECT symbol_id, symbol, entry_date, trade_strategy, signal_strength,
       |       overall_quality_score, composite_score,
       |       CAST(row_number() OVER (PARTITION BY entry_date
       |            ORDER BY composite_score DESC, symbol_id) AS INTEGER) AS day_rank
       |FROM scored
       |ORDER BY entry_date, day_rank""".stripMargin)

  val all: Map[String, Q] = Map(
    "backtest_trades" -> backtestTrades,
    "backtest_metrics" -> backtestMetrics,
    "trades_fundamentals_join" -> tradesFundamentalsJoin,
    "trades_filter_threshold" -> tradesFilterThreshold,
    "signal_scorer" -> signalScorer)
}
