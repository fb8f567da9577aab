package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** THE versioned-commit protocol, in one place: a `v=N` directory counts
  * as committed exactly when its `_SUCCESS` marker exists (Spark's job
  * committer writes it last), so a crashed mid-write version is invisible
  * and readers always resolve a complete state. Shared by every
  * versioned store in the engine — the watermark state
  * ([[graft.etl.Watermarks]]), the MV manifest
  * ([[graft.etl.MaterializedAgg]]) and the table-maintenance generation
  * pointer ([[TableMaintenance]]) — because three hand-rolled copies of a
  * crash-consistency scanner is how one copy quietly diverges (round-12
  * review finding). */
object CommittedVersions {

  def list(spark: SparkSession, root: String): Seq[Long] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v=") &&
        fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
  }

  def latest(spark: SparkSession, root: String): Option[Long] =
    list(spark, root).maxOption
}
