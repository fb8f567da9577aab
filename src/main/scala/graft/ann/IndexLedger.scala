package graft.ann

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Applied-increment high-water mark for the stored ANN indexes — the
  * replay guard [[IvfIndex.appendToIndex]] / [[IvfPq.appendToIndex]] run
  * under. Appends are NOT idempotent (a replayed vec_id doubles its ADC
  * partials — the documented √2 score inflation with no error anywhere),
  * and orchestrators / `foreachBatch` re-deliver the last batch after a
  * crash; increment ids from one ingest stream are monotone and only the
  * last is replayed, so one mark file suffices (the
  * [[graft.etl.MaterializedAgg.refreshOnce]] discipline, single-writer). */
object IndexLedger {

  private def markPath(path: String) = new Path(s"$path/_applied_increment")

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def applied(spark: SparkSession, path: String): Long = {
    val f = fs(spark, path)
    val p = markPath(path)
    if (!f.exists(p)) -1L
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  def record(spark: SparkSession, path: String, incrementId: Long): Unit = {
    val out = fs(spark, path).create(markPath(path), true)
    try out.write(incrementId.toString.getBytes("UTF-8")) finally out.close()
  }

  /** A full rebuild starts a fresh increment history — writeIndex calls
    * this, else a rebuilt store would silently no-op the first replayed
    * increment id of the new stream. */
  def reset(spark: SparkSession, path: String): Unit = {
    fs(spark, path).delete(markPath(path), false)
    ()
  }
}
