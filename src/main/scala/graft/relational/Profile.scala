package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column table profiling — the ANALYZE/data-audit step a pipeline runs
  * before training or migration: row count, null count, distinct count,
  * min/max and mean per column, computed in ONE scan of the table (a single
  * aggregation over all columns' stat expressions, then a driver-side
  * unpivot of the one result row into per-column rows — the unpivot touches
  * metadata, never data).
  *
  * Distinct counts: `exact = true` uses COUNT(DISTINCT col) per column —
  * Spark plans N distinct aggregates via Expand (N× the scan into one
  * shuffle), which is the correct tool at audit time but heavy at 100 TB;
  * `exact = false` switches to approx_count_distinct (HLL++, one pass, no
  * Expand) — the scale default, spec-bounded within 5% of exact.
  *
  * Min/max keep native types per column class (numeric → double,
  * string → string, date/timestamp → date) rather than stringifying
  * everything: cross-engine float formatting is not canonical, typed values
  * are. The mean goes through DECIMAL(25,10) (graft.sqlx.Exact) so the
  * double is bit-identical to the DuckDB oracle after ROUND 4.
  */
object Profile {

  def table(df: DataFrame, tableName: String, exact: Boolean = true): DataFrame = {
    val fields = df.schema.fields.toSeq
    def distinctOf(c: Column): Column =
      if (exact) countDistinct(c) else approx_count_distinct(c, rsd = 0.02)
    val statCols: Seq[Column] = count(lit(1)).as("n_rows") +: fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(c).as(s"${f.name}__nonnull"),
        distinctOf(c).as(s"${f.name}__distinct"))
      val typed = f.dataType match {
        case _: NumericType => Seq(
          min(c).cast("double").as(s"${f.name}__min_num"),
          max(c).cast("double").as(s"${f.name}__max_num"),
          graft.sqlx.Exact.decSumAgg(c).as(s"${f.name}__sum"))
        case StringType => Seq(
          min(c).as(s"${f.name}__min_str"),
          max(c).as(s"${f.name}__max_str"))
        case DateType | TimestampType | TimestampNTZType => Seq(
          min(c).cast("date").as(s"${f.name}__min_date"),
          max(c).cast("date").as(s"${f.name}__max_date"))
        case _ => Nil
      }
      base ++ typed
    }
    // one scan; the 1-row result is checkpointed so the per-column selects
    // below re-read a materialized row instead of re-running the aggregate
    val row = df.agg(statCols.head, statCols.tail: _*).localCheckpoint()

    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val nullDt = lit(null).cast("date")
    val perColumn = fields.map { f =>
      val nn = col(s"${f.name}__nonnull")
      val (minN, maxN, mean) = f.dataType match {
        case _: NumericType => (
          col(s"${f.name}__min_num"), col(s"${f.name}__max_num"),
          graft.sqlx.Exact.r4(col(s"${f.name}__sum") / nn.cast("double")))
        case _ => (nullD, nullD, nullD)
      }
      val (minS, maxS) = f.dataType match {
        case StringType => (col(s"${f.name}__min_str"), col(s"${f.name}__max_str"))
        case _ => (nullS, nullS)
      }
      val (minDt, maxDt) = f.dataType match {
        case DateType | TimestampType | TimestampNTZType =>
          (col(s"${f.name}__min_date"), col(s"${f.name}__max_date"))
        case _ => (nullDt, nullDt)
      }
      row.select(
        lit(tableName).as("table_name"),
        lit(f.name).as("column_name"),
        lit(f.dataType.simpleString).as("data_type"),
        col("n_rows"),
        nn.as("n_nonnull"),
        (col("n_rows") - nn).as("n_nulls"),
        col(s"${f.name}__distinct").as("n_distinct"),
        minN.as("min_num"), maxN.as("max_num"), mean.as("mean"),
        minS.as("min_str"), maxS.as("max_str"),
        minDt.as("min_date"), maxDt.as("max_date"))
    }
    perColumn.reduce(_ unionByName _)
  }
}
