package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Transcript corpus EDA (transform_earnings_call_transcript_eda.py:33-146):
  * per-source frequency, average statement size, language spread and
  * pct-of-total via an unpartitioned window over the already-tiny grouped
  * result (the only safe place for a global window — grouped cardinality is
  * the number of sources, not rows). */
object TextAnalysis {
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  def eda(spark: SparkSession, dir: String): DataFrame = {
    // breadcrumb for log triage: every "No Partition Defined for Window
    // operation" warning a sweep emits traces back to this one declared
    // site (directly or via the queries composing eda) — without the line
    // the warnings read identically to an undeclared scale bug
    log.info("declared-small global window: per-source EDA aggregate, " +
      "cardinality = distinct sources (TextAnalysisSpec pins < 100)")
    val g = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        countDistinct(col("lang")).as("n_langs"))
    // declared-small: the unpartitioned window runs over the per-SOURCE
    // aggregate, whose cardinality is the number of distinct sources (tens,
    // independent of corpus rows) — TextAnalysisSpec pins that bound, so
    // the single-partition WindowExec warning this line triggers in a plan
    // audit is a false positive by construction
    g.withColumn("pct_of_total",
      col("n_docs").cast("double") / sum(col("n_docs")).over(Window.partitionBy()).cast("double"))
  }
}
