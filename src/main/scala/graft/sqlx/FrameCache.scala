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

  // Guaranteed-unique per-live-session ids (same discipline as Dsir's
  // local corpus keys, round 16): 32-bit identityHashCode CAN collide
  // between two live sessions, which would silently share cached frames
  // across sessions. Weak keys mean the id MAP never pins a session —
  // but a cached DataFrame strongly references its session, so a session
  // with any frame in `frames` stays reachable until clear().
  private val sessionIds =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Long]())
  private val nextSessionId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Session-scoped cache key. */
  def key(spark: SparkSession, parts: String*): String = {
    val sid = sessionIds.computeIfAbsent(spark, _ => nextSessionId.incrementAndGet())
    (s"s$sid" +: parts).mkString(":")
  }

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
