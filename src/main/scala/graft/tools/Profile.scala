package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: stage-level timings of the heavy memoized chains, to attribute
  * bench hot spots (first-touch costs land on whichever registered query
  * runs first alphabetically). Usage:
  * `sbt "runMain graft.tools.Profile /root/testdata/sf0.1"` */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.maxFields", "500")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    t("stmt-base") { graft.fundamentals.Statements.base(spark, d).count() }
    t("stmt-full-first") { graft.fundamentals.Statements.full(spark, d).count() }
    t("stmt-full-again") { graft.fundamentals.Statements.full(spark, d).count() }
    t("scores-first") { graft.fundamentals.QualityScores.scores(spark, d).count() }
    t("sigfeat-first") { graft.queries.SignalQueries.signalFeatures(spark, d).count() }
    t("strategies") { graft.signals.Strategies.all(
      graft.queries.SignalQueries.signalFeatures(spark, d),
      ribbonPeriods = Seq(3, 5, 10, 20), trendSma = 20).count() }
    t("simulate") { graft.SparkEntry.queries("backtest_trades")(spark, d).count() }
    t("metrics") { graft.SparkEntry.queries("backtest_metrics")(spark, d).count() }
    t("enriched-first") { graft.SparkEntry.queries("trades_fundamentals_join")(spark, d).count() }
    t("bot-orders") { graft.SparkEntry.queries("bot_order_candidates")(spark, d).count() }
    t("ann-ivf") { graft.SparkEntry.queries("ann_ivf")(spark, d).count() }
    t("jaccard-pairs") { graft.dedup.Jaccard.pairs(spark, d, 0.2).count() }
    t("ann-buckets") { graft.Tables.embeddings(spark, d).count() }
    spark.stop()
  }
}
