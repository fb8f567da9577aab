package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction for partitioned parquet tables — the maintenance
  * operator every incremental 100 TB ingest needs: micro-batch sinks,
  * per-trigger watermark runs and retried tasks each leave a few small
  * files per partition, and after months a day's directory holds hundreds
  * of KB-scale files whose open/footer overhead dominates scan cost (and
  * whose row groups are too small for effective predicate/stats pruning).
  *
  * Spark-native bin-packing: one shuffle keyed on the partition column so
  * each partition's rows land in exactly one writer task, then
  * `maxRecordsPerFile` splits that task's output into
  * ceil(rows / targetRowsPerFile) evenly-bounded files — the compacted
  * file count is a pure function of the data, which is what makes the
  * operator oracle-checkable. The rewrite goes to a NEW root (read and
  * overwrite of the same path in one job is unsafe in any engine); a real
  * deployment swaps the root atomically (rename / catalog pointer flip)
  * and vacuums the old generation after readers drain — on filesystems
  * without atomic rename that flip must go through the
  * [[CommittedVersions]] pointer CAS, whose per-filesystem guarantees
  * (and the object-store [[CommitArbiter]] seam) are in docs/COMMITS.md.
  *
  * At production scale targetRowsPerFile is derived from the target file
  * BYTES (128 MiB–1 GiB) over the table's measured bytes-per-row; the
  * row-count contract keeps the invariant engine-portable here. Listing
  * for [[fileCounts]] is driver-side but metadata-sized: one status call
  * per partition directory, the same order of work the commit protocol
  * already does. */
object Compaction {

  /** Rewrite `srcPath` (a `partitionCol`-partitioned parquet root) into
    * `dstPath` with each partition bin-packed to files of at most
    * `targetRowsPerFile` rows. */
  def compact(spark: SparkSession, srcPath: String, dstPath: String,
              partitionCol: String, targetRowsPerFile: Long): Unit = {
    spark.read.parquet(srcPath)
      .repartition(col(partitionCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .partitionBy(partitionCol)
      .parquet(dstPath)
  }

  /** (partition value, parquet file count) per partition directory of a
    * partitioned table root — Hadoop FS API, so the same listing works on
    * HDFS / object stores, not just local disk. */
  def fileCounts(spark: SparkSession, path: String, partitionCol: String): Seq[(String, Long)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$partitionCol="))
      .map { st =>
        val n = fs.listStatus(st.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        st.getPath.getName.stripPrefix(s"$partitionCol=") -> n.toLong
      }
      .sortBy(_._1)
  }

  /** [[fileCounts]] as a (partitionCol STRING, n_files BIGINT) frame. */
  def fileCountsDf(spark: SparkSession, path: String, partitionCol: String): DataFrame = {
    import spark.implicits._
    fileCounts(spark, path, partitionCol).toDF(partitionCol, "n_files")
  }
}
