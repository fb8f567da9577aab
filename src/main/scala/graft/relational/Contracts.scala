package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-integrity data contracts — the analytics-side analog of the
  * reference schema's PK/uniqueness constraints (reference:
  * db/schema/postgres_stock_db_schema.sql — PRIMARY KEY and UNIQUE
  * declarations the warehouse DDL enforces, which a lake-side pipeline
  * must assert by query instead). One aggregation per table verifies, in
  * a single scan: row count, distinct key count (over fully-non-null
  * keys), rows with any NULL key column, and the composed `pk_ok`
  * verdict (key unique AND null-free).
  *
  * Scale shape: the only shuffle is the distinct on the KEY COLUMNS —
  * never whole rows — with map-side partial dedup, so the exchange
  * carries distinct keys. A PK check must be exact by definition (an
  * HLL± ε distinct count cannot certify uniqueness), so there is no
  * approx twin: exactness here costs one narrow-column distinct per
  * table, the same cost as building the key index the check simulates.
  */
object Contracts {

  /** Declared primary key per testdata table — the single source both the
    * Spark report and the DuckDB oracle SQL are generated from. */
  val keysByTable: Seq[(String, Seq[String])] = Seq(
    ("region", Seq("r_regionkey")),
    ("nation", Seq("n_nationkey")),
    ("customer", Seq("c_custkey")),
    ("supplier", Seq("s_suppkey")),
    ("part", Seq("p_partkey")),
    ("orders", Seq("o_orderkey")),
    ("lineitem", Seq("l_orderkey", "l_linenumber")),
    ("events", Seq("event_id")),
    ("documents", Seq("doc_id")),
    ("embeddings", Seq("vec_id")))

  /** All testdata tables with their declared primary keys. */
  def declared(spark: SparkSession, dir: String): Seq[(String, DataFrame, Seq[String])] = {
    import graft.Tables
    val load: Map[String, (SparkSession, String) => DataFrame] = Map(
      "region" -> Tables.region, "nation" -> Tables.nation,
      "customer" -> Tables.customer, "supplier" -> Tables.supplier,
      "part" -> Tables.part, "orders" -> Tables.orders,
      "lineitem" -> Tables.lineitem, "events" -> Tables.events,
      "documents" -> Tables.documents, "embeddings" -> Tables.embeddings)
    keysByTable.map { case (name, keys) => (name, load(name)(spark, dir), keys) }
  }

  /** One contract row for `df` under key `keys`:
    * (table_name, key_columns, n_rows, n_distinct_keys, n_null_key_rows,
    * pk_ok). The distinct key is a '|'-joined string of the key columns —
    * injective for the integer keys declared above — counted only over
    * rows whose key columns are all non-null (NULL keys are violations,
    * tallied separately, not distinct values). */
  def check(df: DataFrame, tableName: String, keys: Seq[String]): DataFrame = {
    val allNonNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val keyStr = concat_ws("|", keys.map(col(_).cast("string")): _*)
    df.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(when(allNonNull, keyStr)).as("n_distinct_keys"),
        count(when(!allNonNull, lit(1))).as("n_null_key_rows"))
      .select(
        lit(tableName).as("table_name"),
        lit(keys.mkString(",")).as("key_columns"),
        col("n_rows"), col("n_distinct_keys"), col("n_null_key_rows"),
        (col("n_null_key_rows") === 0L && col("n_distinct_keys") === col("n_rows"))
          .as("pk_ok"))
  }

  /** The full contract report: one row per declared table. */
  def report(spark: SparkSession, dir: String): DataFrame =
    declared(spark, dir)
      .map { case (name, df, keys) => check(df, name, keys) }
      .reduce(_ unionByName _)
      .orderBy("table_name")

  /** Declared foreign keys (child table, child col, parent table, parent
    * col) — the reference schema's REFERENCES edges over the testdata's
    * TPC-H core. Single source for the Spark report and the oracle. */
  val foreignKeys: Seq[(String, String, String, String)] = Seq(
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"))

  /** One row per declared FK: (child_table, fk_column, parent_table,
    * n_child_rows, n_null_fk_rows, n_orphans, fk_ok). Orphans = non-null
    * child keys with no parent — counted through a LEFT ANTI join against
    * the parent's DISTINCT key column, so the exchange carries only the
    * two key columns (the parent side collapses to distinct keys map-side;
    * at dimension-table scale the anti join broadcasts). NULL FKs are
    * tallied separately, not orphans — SQL FK semantics admit NULLs. */
  def fkReport(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables
    val load: Map[String, (SparkSession, String) => DataFrame] = Map(
      "region" -> Tables.region, "nation" -> Tables.nation,
      "customer" -> Tables.customer, "supplier" -> Tables.supplier,
      "part" -> Tables.part, "orders" -> Tables.orders,
      "lineitem" -> Tables.lineitem)
    foreignKeys.map { case (childT, fkCol, parentT, pkCol) =>
      val child = load(childT)(spark, dir)
      val parentKeys = load(parentT)(spark, dir).select(col(pkCol)).distinct()
      val orphans = child.where(col(fkCol).isNotNull)
        .join(parentKeys, col(fkCol) === col(pkCol), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      val counts = child.agg(
        count(lit(1)).as("n_child_rows"),
        count(when(col(fkCol).isNull, lit(1))).as("n_null_fk_rows"))
      counts.crossJoin(orphans).select(
        lit(childT).as("child_table"),
        lit(fkCol).as("fk_column"),
        lit(parentT).as("parent_table"),
        col("n_child_rows"), col("n_null_fk_rows"), col("n_orphans"),
        (col("n_orphans") === 0L).as("fk_ok"))
    }.reduce(_ unionByName _).orderBy("child_table", "fk_column")
  }
}
