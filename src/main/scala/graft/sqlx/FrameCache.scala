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

  /** Close the DISK half of the session's derived-state lifecycle:
    * [[clear]] releases the in-memory layer (persisted frames, memoized
    * fits/counts), but the ~34 [[PathTag]]-keyed staged stores a session
    * accumulates under `java.io.tmpdir` — versioned watermark/MV/
    * maintenance stores, ANN index dirs, fitted-model dirs, stream
    * sources — previously had no vacuum at all and outlived the JVM.
    * This deletes every `graft-*` entry of tmpdir whose name carries a
    * tag THIS JVM minted (the PathTag registry), then [[clear]]s, so the
    * in-memory caches can never serve state whose backing files are
    * gone. Safe mid-session by the same contract as [[clear]]: every
    * store is built build-if-absent, so the next access rebuilds it from
    * the corpus ([[SessionStoresSpec]] pins rebuild-equivalence). Two
    * JVMs pointed at the same corpus dir share tags BY DESIGN (store
    * paths are deterministic functions of the corpus dir) — do not run
    * this while a second live session is mid-query on the same corpus.
    * Returns the deleted paths. */
  def clearSessionStores(): Seq[String] = {
    val tags = PathTag.mintedTags
    val tmp = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    val deleted =
      if (tags.isEmpty || !java.nio.file.Files.isDirectory(tmp)) Seq.empty[String]
      else {
        val entries = java.nio.file.Files.list(tmp)
        try {
          import scala.jdk.CollectionConverters._
          entries.iterator().asScala
            .filter { p =>
              val n = p.getFileName.toString
              n.startsWith("graft-") && tags.exists(n.contains)
            }
            .map { p => deleteRecursively(p); p.toString }
            .toList
        } finally entries.close()
      }
    clear()
    deleted.sorted
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val children = java.nio.file.Files.list(p)
      try children.iterator().asScala.foreach(deleteRecursively)
      finally children.close()
    }
    java.nio.file.Files.deleteIfExists(p)
    ()
  }
}
