package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sqlx.Exact._

/** Earnings-call sentiment aggregation
  * (transform_earnings_sentiment_agg.py:52-125): classify each speaker title
  * into a role hierarchy via case-insensitive pattern match, then pivot-AVG
  * sentiment per (symbol, quarter) and role. Data mapping (SURVEY.md §1.1):
  * documents rows are transcript statements — source→symbol, lang→quarter,
  * title synthesized from doc_id, sentiment derived from n_chars.
  *
  * One hash aggregation; the classification is a codegen'd CASE chain over
  * an upper-cased title (no UDF).
  */
object SentimentAgg {
  val Titles: Seq[String] = Seq(
    "Chief Executive Officer", "Chief Financial Officer", "EVP of Operations",
    "Vice President, Engineering", "Research Analyst", "Conference Operator", "Founder")

  /** Statement-level table with synthesized title + sentiment. */
  def statements(spark: SparkSession, dir: String): DataFrame = {
    val titleExpr = Titles.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (t, i)) => when(col("doc_id") % 7 === i, t).otherwise(acc)
    }
    Tables.documents(spark, dir).select(
      col("source").as("symbol"),
      col("lang").as("quarter"),
      titleExpr.as("title"),
      ((col("n_chars") % 201 - 100) / 100.0).as("sentiment"))
  }

  /** Role hierarchy (ref :58-105), matched on UPPER(title). */
  def roleCategory(title: Column): Column = {
    val t = upper(title)
    def anyLike(ps: String*): Column = ps.map(p => t.like(s"%$p%")).reduce(_ || _)
    when(anyLike("CEO", "CHIEF EXECUTIVE", "CHAIRMAN", "CHAIR", "PRESIDENT"), "csuite")
      .when(anyLike("CFO", "CHIEF FINANCIAL"), "cfo")
      .when(anyLike("COO", "CTO", "CIO", "CMO", "CHIEF", "EVP", "SVP",
        "EXECUTIVE VICE PRESIDENT", "SENIOR VICE PRESIDENT"), "senior_exec")
      .when(anyLike("VICE PRESIDENT", "VP ", "DIRECTOR", "GENERAL COUNSEL",
        "SECRETARY", "TREASURER", "CONTROLLER"), "vp_director")
      .when(anyLike("ANALYST", "INVESTOR RELATIONS", "MANAGER"), "analyst_ir")
      .when(anyLike("MODERATOR", "OPERATOR", "CONFERENCE"), "external")
      .otherwise("other")
  }

  def aggregated(spark: SparkSession, dir: String): DataFrame = {
    val d = statements(spark, dir).withColumn("role", roleCategory(col("title")))
    def avgFor(cond: Column, name: String): Seq[Column] = {
      val c = sum(when(cond, 1L).otherwise(0L))
      val s = sum(when(cond, dec(col("sentiment")))).cast("double")
      Seq(when(c > 0, s / c).as(name))
    }
    val mgmt = col("role").isin("csuite", "cfo", "senior_exec")
    val aggs: Seq[Column] =
      avgFor(col("role") === "csuite", "sentiment_csuite") ++
        avgFor(col("role") === "cfo", "sentiment_cfo") ++
        avgFor(col("role") === "senior_exec", "sentiment_senior_exec") ++
        avgFor(col("role") === "vp_director", "sentiment_vp_director") ++
        avgFor(col("role") === "analyst_ir", "sentiment_analyst_ir") ++
        avgFor(mgmt, "sentiment_management_all") ++
        avgFor(col("role") =!= "external", "sentiment_overall") ++
        Seq(count(lit(1)).as("n_statements"),
          sum(when(mgmt, 1L).otherwise(0L)).as("n_management"))
    d.groupBy(col("symbol"), col("quarter")).agg(aggs.head, aggs.tail: _*)
  }
}
