package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column table profiling — the ANALYZE/data-audit step a pipeline runs
  * before training or migration: row count, null count, distinct count,
  * min/max and mean per column. All non-distinct stats come from a single
  * aggregation over all columns' stat expressions; the one result row is
  * then unpivoted driver-side into per-column rows (the unpivot touches
  * metadata, never data).
  *
  * Distinct counts: `exact = true` is AUDIT-ONLY — it full-shuffles every
  * cell of the table as strings and exists to anchor the approx twin's
  * error bound at test SF; at 100 TB run `exact = false`
  * (`table_profile_approx`), the single-scan KMV sketch path. The audit mode
  * melts the table into (column, canonical value) pairs — an injective string encoding, so distinct-pair count =
  * COUNT(DISTINCT col) — and counts distinct pairs per column: map-side
  * partial dedup means the shuffle carries only distinct pairs, never the
  * N-aggregate Expand blow-up Spark plans for multi-column COUNT(DISTINCT)
  * (measured 6× slower than this shape at sf0.1). Exact mode therefore
  * costs two columnar scans (stats + melt); `exact = false` keeps one scan
  * with a KMV bottom-k sketch per column (graft.functions.Kmv, k=2048,
  * rsd ≈ 2.2%) — same one-pass mergeable posture as the HLL++ it replaced,
  * but deterministic md5 arithmetic, so the whole approx profile is
  * hash-checked against a DuckDB replay ([[kmvDistinctSql]]) instead of
  * bounds-checked; ProfileSpec still bounds the deviation vs exact within
  * 5% on every profiled table and scale factor. The sketch hashes a
  * CANONICAL string per type class ([[canonical]]/[[canonicalSql]]) —
  * engine-portable by construction: integers/NTZ-timestamps cast to
  * identical strings, doubles pin a DECIMAL(28,6) rendering (raw
  * double→string formatting differs between engines), instant timestamps
  * go through epoch micros.
  *
  * Min/max keep native types per column class (numeric → double,
  * string → string, date/timestamp → date) rather than stringifying
  * everything: cross-engine float formatting is not canonical, typed values
  * are. The mean goes through DECIMAL(25,10) (graft.sqlx.Exact) so the
  * double is bit-identical to the DuckDB oracle after ROUND 4.
  */
object Profile {

  /** Engine-portable canonical string for KMV hashing, per type class.
    * Must stay the byte-identical mirror of [[canonicalSql]]. Doubles add
    * 0.0 first (−0.0 → 0.0, same IEEE op both sides) then pin a
    * DECIMAL(28,6) rendering; TIMESTAMP (instant) canonicalizes through
    * epoch micros (string fraction-trimming differs between engines);
    * TIMESTAMP_NTZ/DATE cast to identical ISO strings. */
  def canonical(c: Column, dt: DataType): Column = dt match {
    case StringType => c
    case FloatType | DoubleType =>
      (c + lit(0.0)).cast(DecimalType(28, 6)).cast("string")
    case TimestampType => unix_micros(c).cast("string")
    case _ => c.cast("string")
  }

  /** DuckDB mirror of [[canonical]]. */
  def canonicalSql(c: String, dt: String): String = dt match {
    case "string" => c
    case "float" | "double" => s"CAST(CAST($c + 0.0 AS DECIMAL(28,6)) AS VARCHAR)"
    case "timestamp" => s"CAST(epoch_us($c) AS VARCHAR)"
    case _ => s"CAST($c AS VARCHAR)"
  }

  /** Per-column KMV distinct-estimate replay for the approx-profile oracle:
    * a scalar subquery ranking the column's distinct 52-bit hashes. */
  def kmvDistinctSql(table: String, c: String, dt: String, k: Int = graft.functions.Kmv.K): String =
    s"""(SELECT ${graft.functions.Kmv.estimateSql(k).replace("\n", " ")}
       |   FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn, COUNT(*) OVER () AS nd
       |         FROM (SELECT DISTINCT ${graft.functions.Kmv.hashSql(canonicalSql(c, dt))} AS hv
       |               FROM $table WHERE $c IS NOT NULL)))""".stripMargin

  def table(df: DataFrame, tableName: String, exact: Boolean = true): DataFrame = {
    val fields = df.schema.fields.toSeq
    // approx mode: the canonical-string build + md5 run as a codegen'd
    // PROJECTION (graft_hash52) feeding the aggregate — and that pass is
    // CPU-bound (11 md5s per row), so when the scan yields fewer splits
    // than 2× cores (a single test-SF parquet file ⇒ the whole sketch
    // pass serializes on one task — measured 2.1 s of md5 on one core at
    // sf0.1) it is repartitioned to 2× cores: exactly `cores` equal
    // tasks are the worst shape under co-tenant CPU steal (one stolen
    // core doubles the pass — the round-15 driver host read 5.4× its
    // floor at loadavg 12 while a quiet host read 1.1×), while 2× gives
    // the scheduler slack to rebalance around a slow core at a
    // negligible shuffle cost for a pass this small. Conditional on
    // purpose: at production scale the input splits already exceed the
    // threshold and the shuffle would be a pure pessimization.
    val src =
      if (exact) df
      else {
        val cores = df.sparkSession.sparkContext.defaultParallelism
        val splits = df.queryExecution.toRdd.getNumPartitions
        val wide = if (splits < 2 * cores) df.repartition(2 * cores) else df
        wide.select(col("*") +: fields.map { f =>
          graft.functions.Kmv.hash52Col(df.sparkSession,
            canonical(col(f.name), f.dataType)).as(s"__h52_${f.name}")
        }: _*)
      }
    // exact: melt → distinct (column, value) pairs → count per column;
    // 11 longs collected driver-side (metadata, independent of table size)
    val exactDistinct: Map[String, Long] =
      if (!exact) Map.empty
      else df.select(explode(array(fields.map { f =>
          // + 0.0 normalizes floating -0.0 → 0.0 before the string cast:
          // native COUNT(DISTINCT) treats them as one value but their
          // strings ("-0.0"/"0.0") differ
          val v = f.dataType match {
            case FloatType | DoubleType => col(f.name) + lit(0.0)
            case _ => col(f.name)
          }
          struct(lit(f.name).as("c"), v.cast("string").as("v"))
        }: _*)).as("p"))
        .select(col("p.c").as("c"), col("p.v").as("v"))
        .where(col("v").isNotNull)
        .distinct()
        .groupBy("c").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val statCols: Seq[Column] = count(lit(1)).as("n_rows") +: fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(count(c).as(s"${f.name}__nonnull")) ++
        (if (exact) Nil
         else Seq(graft.functions.Kmv.distinctCountHashed(
           df.sparkSession, col(s"__h52_${f.name}")).as(s"${f.name}__distinct")))
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
    // the 1-row stats result is checkpointed so the per-column selects
    // below re-read a materialized row instead of re-running the aggregate
    val row = src.agg(statCols.head, statCols.tail: _*).localCheckpoint()

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
        (if (exact) lit(exactDistinct.getOrElse(f.name, 0L))
         else col(s"${f.name}__distinct")).as("n_distinct"),
        minN.as("min_num"), maxN.as("max_num"), mean.as("mean"),
        minS.as("min_str"), maxS.as("max_str"),
        minDt.as("min_date"), maxDt.as("max_date"))
    }
    perColumn.reduce(_ unionByName _)
  }
}
