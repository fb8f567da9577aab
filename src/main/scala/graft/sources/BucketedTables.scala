package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed parquet sink/source — the co-location primitive for 100 TB
  * pipelines.
  *
  * Writing a table `bucketBy(n, key)` pre-shuffles it ONCE at write time;
  * every later equi-join or aggregation on the bucket key then reads
  * bucket i of each side into the same task and plans NO exchange. For the
  * feature/fundamentals pipeline that means the per-symbol tables (bars,
  * features, scores, signals) are written bucketed by symbol_id and every
  * downstream symbol-keyed join in the daily run is shuffle-free — the
  * same role the reference's per-symbol database partitioning plays
  * (db_manager.py's symbol-keyed upserts), expressed as a storage layout
  * instead of a loop.
  *
  * `sortBy` additionally orders each bucket file on disk so sort-merge
  * joins skip their sort, and time-ordered scans ([[graft.plans.SortedGroupScan]]
  * consumers) start from already-ordered input.
  *
  * Spark only honours bucket metadata through the catalog, so this sink
  * goes through `saveAsTable` — at cluster scale that's the metastore;
  * locally it's the embedded catalog under `spark.sql.warehouse.dir`.
  */
object BucketedTables {

  /** Write `df` as a bucketed (and per-bucket sorted) parquet table.
    * Idempotent across JVM sessions: with the local in-memory catalog,
    * table REGISTRATIONS die with the JVM but warehouse DIRECTORIES
    * persist, so a fresh session's overwrite would hit
    * LOCATION_ALREADY_EXISTS on a directory no catalog entry owns —
    * clear any such orphaned location first. The delete is gated to the
    * in-memory catalog (whose warehouse dir this session owns) and to
    * unqualified names in the default database — on a real metastore
    * (hive catalog) the entry persists and Overwrite handles it, and a
    * qualified `db.table` would make the computed path wrong. */
  def write(df: DataFrame, table: String, bucketCols: Seq[String],
            numBuckets: Int, sortCols: Seq[String] = Nil,
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "bucketBy needs at least one column")
    require(!table.contains("."),
      s"BucketedTables.write takes an unqualified table name, got '$table'")
    val spark = df.sparkSession
    val inMemoryCatalog =
      spark.conf.get("spark.sql.catalogImplementation", "in-memory") == "in-memory"
    if (mode == SaveMode.Overwrite && inMemoryCatalog &&
        spark.catalog.currentDatabase == "default" &&
        !spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog, so
    * joins/aggs on the bucket key plan without an exchange). */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
