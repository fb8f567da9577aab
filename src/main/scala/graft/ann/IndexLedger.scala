package graft.ann

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Applied-increment high-water mark for the stored ANN indexes — the
  * replay guard [[IvfIndex.appendToIndex]] / [[IvfPq.appendToIndex]] run
  * under. Appends are NOT idempotent (a replayed vec_id doubles its ADC
  * partials — the documented √2 score inflation with no error anywhere),
  * and orchestrators / `foreachBatch` re-deliver the last batch after a
  * crash; increment ids from one ingest stream are monotone and only the
  * last is replayed, so one high-water mark suffices (the
  * [[graft.etl.MaterializedAgg.refreshOnce]] discipline, single-writer).
  *
  * The mark is FILENAME-encoded: each applied id is an empty file
  * `_applied/inc-<id>`, and [[applied]] is the max parsed id. A file
  * create is all-or-nothing at the name level, so there is no
  * partial-content corruption window at all — the hazard a truncate-then-
  * write scalar file has (crash mid-write ⇒ empty file ⇒ every later
  * parse throws and the store wedges until hand repair). Old mark files
  * beyond the newest few are pruned opportunistically on record. */
object IndexLedger {

  private def dirPath(path: String) = new Path(s"$path/_applied")

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ids(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val d = dirPath(path)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("inc-"))
      .flatMap(n => n.stripPrefix("inc-").toLongOption)
  }

  def applied(spark: SparkSession, path: String): Long =
    ids(spark, path).maxOption.getOrElse(-1L)

  def record(spark: SparkSession, path: String, incrementId: Long): Unit = {
    val f = fs(spark, path)
    f.mkdirs(dirPath(path))
    f.create(new Path(dirPath(path), s"inc-$incrementId"), true).close()
    // prune superseded marks (keep a small tail for post-mortems)
    ids(spark, path).sorted.dropRight(4).foreach { i =>
      f.delete(new Path(dirPath(path), s"inc-$i"), false)
    }
  }

  /** Recover from the one crash window the append protocol leaves: between
    * [[record]] and the commit-marker re-create. The ledger mark is written
    * strictly AFTER the data append, so a missing marker with the ledger
    * head EQUAL to the replayed id certifies a fully-landed, internally
    * consistent append — recreate the marker and treat the retry as the
    * replay no-op it is, instead of wedging the store into a full
    * writeIndex rebuild. The certificate is deliberately narrow (review
    * finding — the old `incrementId <= applied` over-certified):
    *   - only `incrementId == applied` qualifies: replaying an OLDER id
    *     while the marker is down says a LATER append (id > applied, not
    *     yet recorded) crashed mid-data — the store really is half-written
    *     and must stay loud;
    *   - only with the mutation lock FREE: a held lock means a live rival
    *     is mid-append (it dropped the marker itself) — resurrecting the
    *     marker under it would serve its half-written files as committed.
    * Returns true when it recovered (caller returns false = "already
    * applied"). */
  def recoverMarker(spark: SparkSession, path: String, incrementId: Long,
                    fsMarker: (org.apache.hadoop.fs.FileSystem, Path)): Boolean = {
    val (f, marker) = fsMarker
    if (!f.exists(marker) && incrementId == applied(spark, path)) {
      val lock = lockPath(path)
      // lock absent: the holder crashed on the exception path (finally
      // released) — recover. Lock present but STALE: the holder was
      // kill-9'd between record and marker re-create (the finally never
      // ran — the common crash this recovery exists for); a live append
      // finishes in seconds, so an hour-old lock certifies death — break
      // it and recover. Lock present and fresh: assume a live rival
      // mid-append of a later id — do NOT resurrect the marker under it;
      // "already applied" (false) is accurate, and the store self-heals
      // when the rival finishes (or this path fires once the lock ages).
      val fresh = f.exists(lock) &&
        f.getFileStatus(lock).getModificationTime >
          System.currentTimeMillis() - LockStaleMs
      if (!fresh) {
        if (f.exists(lock)) f.delete(lock, false)
        f.create(marker, true).close()
        true
      } else false
    } else false
  }

  /** Mutation-lock staleness horizon for [[recoverMarker]]'s self-heal and
    * [[requireNoCrashedMutation]]'s loudness: real appends hold the lock
    * for seconds. Test/ops hook. */
  private[graft] var LockStaleMs: Long = 60L * 60 * 1000

  /** Loud gate for the replay paths (review finding — the pre-lock
    * requireCommitted used to provide this): a missing commit marker with
    * NO live mutation in flight (lock absent, or present but stale) means
    * a crashed half-append — a replayed OLDER id must fail loudly here,
    * not return a silent "already applied" on a store every probe will
    * refuse. A fresh lock means a rival is legitimately mid-append; the
    * ledger check that follows stays accurate. */
  def requireNoCrashedMutation(spark: SparkSession, path: String,
                               fsMarker: (org.apache.hadoop.fs.FileSystem, Path)): Unit = {
    val (f, marker) = fsMarker
    if (!f.exists(marker)) {
      val lock = lockPath(path)
      val fresh = f.exists(lock) &&
        f.getFileStatus(lock).getModificationTime >
          System.currentTimeMillis() - LockStaleMs
      require(fresh,
        s"$path has no _index_commit marker and no live mutation holds the " +
          "lock: a previous append crashed half-written — rebuild with " +
          "writeIndex (breakMutationLock first if the stale lock remains)")
    }
  }

  /** A full rebuild starts a fresh increment history — writeIndex calls
    * this, else a rebuilt store would silently no-op the first replayed
    * increment id of the new stream. */
  def reset(spark: SparkSession, path: String): Unit = {
    fs(spark, path).delete(dirPath(path), true)
    ()
  }

  // ------------------------------------------------------------ mutation lock

  private def lockPath(path: String) = new Path(s"$path/_mutating")

  /** Writer mutual exclusion for the index stores (round 13): every
    * mutation (writeIndex rebuild, appendToIndex) runs under an
    * exclusive-create `_mutating` lock, so two concurrent mutators can
    * never interleave parquet appends into the same cell dirs — the
    * loser fails LOUDLY here (ConcurrentCommitException) instead of
    * silently corrupting ADC partials. Appends have no "recompute from
    * the new head" notion (they are order-independent data adds), so the
    * right semantics is a lock, not a version CAS — the ledger's
    * increment ids stay the idempotence key WITHIN the single winning
    * stream.
    *
    * Crash recovery: a holder that dies leaves the lock on disk, and a
    * filesystem cannot distinguish dead from slow — so the lock is never
    * auto-broken. `lock present + _index_commit present` = the store is
    * consistent (the holder died outside the data window, or is about to
    * finish); `lock present + marker absent` = possibly half-mutated.
    * Either way the operator confirms no mutator is running, then
    * [[breakMutationLock]] + (if the marker is absent and the ledger does
    * NOT certify the increment — see [[recoverMarker]]) a writeIndex
    * rebuild. */
  def acquireMutationLock(spark: SparkSession, path: String, op: String): Unit =
    if (!graft.sources.CommittedVersions.tryCreateExclusive(
          spark, lockPath(path).toString))
      throw new graft.sources.ConcurrentCommitException(
        s"$op: another mutation holds ${lockPath(path)} — concurrent index " +
          "mutators are rejected, not interleaved. If the holder crashed, " +
          "confirm nothing is running, then IndexLedger.breakMutationLock " +
          "(+ writeIndex rebuild if the commit marker is absent and the " +
          "ledger does not certify the increment).")

  def releaseMutationLock(spark: SparkSession, path: String): Unit = {
    fs(spark, path).delete(lockPath(path), false)
    ()
  }

  /** Operator-invoked stale-lock removal after a crashed mutator — see
    * [[acquireMutationLock]] for the safety precondition (no live
    * mutator; a lease/heartbeat would automate this, at the cost of
    * wall-clock coupling a zero-egress library shouldn't hardcode). */
  def breakMutationLock(spark: SparkSession, path: String): Unit =
    releaseMutationLock(spark, path)
}
