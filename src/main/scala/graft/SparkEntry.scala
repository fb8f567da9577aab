package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7. */
object SparkEntry {

  /** All registered operator queries (name → impl + optional DuckDB oracle). */
  def registry: Map[String, Q] =
    FeatureQueries.all ++ RecursiveQueries.all ++ SignalQueries.all ++
      FundamentalQueries.all ++ AggregateQueries.all ++ LlmQueries.all ++
      EtlQueries.all ++ BacktestQueries.all ++ StreamingBatchQueries.all ++
      MlQueries.all ++ ChartQueries.all ++ RecommendQueries.all ++
      BucketedQueries.all ++ CorpusOpsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's namesake output end-to-end: bars → windowed + recursive
    * features → all 11 signal strategies, joined back to signal-day bars. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val bars = graft.features.Bars.daily(graft.Tables.events(spark, dir))
    val features = graft.features.Recursive.withRecursive(
      graft.features.Indicators.withHighLow(
        graft.features.Indicators.windowed(bars, Seq(3, 5, 10, 20, 50))))
    graft.signals.Strategies.all(features, ribbonPeriods = Seq(3, 5, 10, 20), trendSma = 20)
      .join(bars, Seq("symbol_id", "date"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.run }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    *
    * Context-dependent oracles (`Q.oracleGen` — the model-scored queries
    * serialize the session's fitted GBT into the SQL) are resolved against
    * (spark, dir); a generator failure degrades that entry to the driver's
    * rows-only check rather than losing the whole dump. */
  def oracleSql(spark: SparkSession, dir: String): Map[String, String] =
    registry.flatMap { case (k, q) =>
      q.oracle.map(k -> _).orElse(
        q.oracleGen.flatMap(g => scala.util.Try(g(spark, dir)).toOption.map(k -> _)))
    }

  /** Driver-contract form: static oracles always; generated ones when an
    * active session exists (Verify publishes its sfDir via the
    * `graft.sf.dir` property before dumping). */
  def oracleSql: Map[String, String] =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
      case Some(s) =>
        oracleSql(s, sys.props.getOrElse("graft.sf.dir", "/root/testdata/sf0.001"))
      case None => registry.collect { case (k, Q(_, Some(sql), _)) => k -> sql }
    }
}
