package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file Bloom index for EQUALITY file-skipping — the complement of
  * [[StatsManifest]]: min/max boxes prune range predicates on the
  * clustered dimensions, but an equality probe on a high-cardinality
  * column (point lookups on user/document/order ids) intersects almost
  * every file's [min, max] and min/max skips nothing. A small Bloom
  * filter per (file, column) answers "is this value definitely absent
  * from this file?" — Delta's Bloom filter index / Parquet's column
  * bloom, built here as an engine-level operator.
  *
  * Build is one distributed scan: each row contributes `NumHashes` bit
  * positions per indexed column (md5 text arithmetic — deterministic,
  * partitioning-independent, and the same `md5(value:i)` family every
  * derandomized operator here uses), rolled up per input file with
  * `collect_set`. The index rows are (file, column, set bit positions):
  * ≤ `NumBits` ints per file per column — manifest-scale metadata, stored
  * as a sorted array so membership tests are plain array_contains. Like
  * the stats manifest it is per-file independent: appends index only the
  * new files.
  *
  * Probe: a file survives only if ALL `NumHashes` positions of the probe
  * value are set (or the file has no index row for that column — never
  * prune on missing metadata). False positives cost IO, never
  * correctness: the exact predicate is re-applied inside the pruned
  * read. Sizing rule: fp ≈ (1 − e^(−k·n/m))^k — at the defaults
  * (m=8192 bits, k=4) a file of n=2000 distinct keys false-positives at
  * ~3%; production sizes m per file row count the same way Parquet's
  * bloom writer does. */
object BloomSkipIndex {

  val NumBits = 8192
  val NumHashes = 4

  /** Bit position i of a value: head-32 of md5("<value>:<i>") mod NumBits
    * (unsigned, so non-negative). Deterministic in any engine. */
  private def bitPos(value: Column, i: Int): Column =
    pmod(conv(substring(md5(concat(value.cast("string"), lit(s":$i"))), 1, 8), 16, 10)
      .cast("long"), lit(NumBits.toLong)).cast("int")

  private def positions(value: Column): Column =
    array((0 until NumHashes).map(i => bitPos(value, i)): _*)

  /** One index row per (file, column): the sorted set of bit positions the
    * file's non-null values hash to. Distributed: the scan maps each row
    * to k positions and the per-file rollup is a map-side-combinable
    * collect_set keyed by (file, column). */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    val src = spark.read.parquet(dir).withColumn("_file", input_file_name())
    cols.map { c =>
      src.where(col(c).isNotNull)
        .select(col("_file"), explode(positions(col(c))).as("p"))
        .groupBy("_file")
        .agg(sort_array(collect_set(col("p"))).as("bits"))
        .select(
          element_at(split(col("_file"), "/"), -1).as("file"),
          lit(c).as("column"), col("bits"))
    }.reduce(_ unionByName _)
  }

  /** Files that MIGHT contain `value` in `column`: every indexed file
    * whose bit set covers all k probe positions, plus files with no index
    * row for the column. Evaluated on the index frame; returns a
    * metadata-sized file list. */
  def prunedFiles(index: DataFrame, allFiles: Seq[String],
                  column: String, value: Column): Seq[String] = {
    val probe = positions(value)
    val hit = index.where(col("column") === column)
      .withColumn("keep",
        forall(probe, p => array_contains(col("bits"), p)))
    val indexed = hit.select("file", "keep").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    allFiles.filter(f => indexed.getOrElse(f, true)).sorted
  }

  /** Bloom-pruned point read: scan only the surviving files, re-applying
    * the exact equality inside (false positives filter away; pruning is
    * IO-only). */
  def readPruned(spark: SparkSession, dir: String, index: DataFrame,
                 column: String, value: Column): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = fs.listStatus(root).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName)
    val files = prunedFiles(index, all, column, value).map(f => s"$dir/$f")
    if (files.isEmpty) spark.read.parquet(dir).where(lit(false))
    else spark.read.parquet(files: _*).where(col(column) === value)
  }
}
