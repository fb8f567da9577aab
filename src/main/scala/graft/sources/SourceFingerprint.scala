package graft.sources

import org.apache.spark.sql.SparkSession

/** Content fingerprint of a source parquet table (per-file name + length +
  * mtime), used to key staged copies and memoized derived frames so that a
  * REGENERATED testdata tree at the same path invalidates them. The digest
  * is MD5 over the metadata string, not 32-bit `String.hashCode`: a 32-bit
  * hash collision between old and regenerated data would silently serve a
  * stale staged corpus — the exact failure the fingerprint exists to
  * prevent — while 128 bits make that practically impossible (same rule as
  * [[graft.functions.NearestCell]]'s content-keyed registration). */
object SourceFingerprint {

  /** Hex MD5 of the metadata of `dir/table.parquet` (file or directory of
    * part files). Empty/missing sources fingerprint the empty string, so
    * existence changes also invalidate. */
  def of(spark: SparkSession, dir: String, table: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts =
      if (!fs.exists(p)) Seq.empty
      else if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq.sortBy(_.getPath.getName)
      else Seq(fs.getFileStatus(p))
    val meta = parts.map(x => s"${x.getPath.getName}:${x.getLen}:${x.getModificationTime}")
      .mkString("|")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(meta.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
