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
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
