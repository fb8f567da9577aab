package graft.sqlx

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Central registry for the memoized + persisted frames the query layer
  * shares (signal features, statements, scores, shingles, buckets, enriched
  * trades, feature table). One-shot mains never need to release them, but a
  * long-lived session processing many directories would otherwise
  * accumulate pinned storage — `clear()` unpersists and forgets everything
  * (safe mid-session: the next access rebuilds).
  */
object FrameCache {
  private val frames = TrieMap.empty[String, DataFrame]

  /** Session-scoped cache key. */
  def key(spark: SparkSession, parts: String*): String =
    (System.identityHashCode(spark).toString +: parts).mkString(":")

  def getOrElseUpdate(k: String)(build: => DataFrame): DataFrame =
    frames.getOrElseUpdate(k, build)

  /** Unpersist every cached frame and forget it — and drop the [[Memo]]
    * values derived from the same corpora (bucket tables holding these
    * frames, quantizer fits, counts), so one clear() resets the whole
    * derived-state layer together. */
  def clear(): Unit = {
    frames.values.foreach(df => try df.unpersist(false) catch { case _: Throwable => () })
    frames.clear()
    Memo.clear()
  }

  def size: Int = frames.size
}
