package graft.sqlx

/** Collision-proof per-corpus-dir tag for session-staged store paths
  * (`/tmp/graft-*-$tag`): 48 bits of md5 over the dir string (6 bytes,
  * 12 hex chars — birthday-collision odds ~n²/2⁴⁹, vanishing for the
  * handful of corpus dirs a session ever touches, vs ~n²/2³³ for the
  * 32-bit hashCode this replaced).
  *
  * Replaces `Integer.toHexString(dir.hashCode)` (round 16): 32-bit
  * String.hashCode is the same collision class [[PlanFingerprint]] and
  * [[graft.sources.SourceFingerprint]] reject for memo keys — and store
  * paths ARE keys: one session can legitimately run the same registered
  * query over several corpus dirs (ScaleStress times every query on the
  * base corpus and the synthesized 10×/30×/100× corpora back-to-back),
  * and a tag collision would silently share a staged store, an ANN
  * index, or a fitted-model directory across different corpora. md5 here
  * costs nothing (once per query call, driver-side) and removes the
  * class. */
object PathTag {
  // tag -> corpus dir, every tag this JVM ever minted: the registry that
  // lets FrameCache.clearSessionStores() vacuum exactly this session's
  // staged /tmp/graft-* stores without touching anything else. Bounded by
  // the number of distinct corpus dirs a session touches (a handful).
  private val minted = scala.collection.concurrent.TrieMap.empty[String, String]

  def of(dir: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    minted.put(tag, dir)
    tag
  }

  /** Every tag minted by this JVM (see [[FrameCache.clearSessionStores]]). */
  private[graft] def mintedTags: Set[String] = minted.keySet.toSet
}
