package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The table-maintenance TRANSACTION: compaction, skipping-index
  * re-harvest, and generation flip as ONE entry point — the loop real
  * table formats (Delta OPTIMIZE, Iceberg rewrite_data_files +
  * rewrite_manifests) close and round 11 left open: [[Compaction.compact]]
  * wrote a new generation root but nothing re-harvested
  * [[StatsManifest]] / [[BloomSkipIndex]] for it, so the conservative-keep
  * rule kept results correct while skipping silently degraded to
  * scan-everything on the compacted table.
  *
  * Store layout:
  * {{{
  *   root/gen=G/data/part-....parquet   the generation's data files
  *   root/gen=G/_stats/                 persisted min/max footer manifest
  *   root/gen=G/_bloom/                 persisted per-file Bloom index
  *   root/_current/v=N/                 one-row pointer (gen G), committed
  *                                      by its _SUCCESS marker
  * }}}
  *
  * The pointer flip is the commit: data + both indexes are fully written
  * under the NEW generation before the pointer version appears, so a crash
  * anywhere leaves the previous generation (and its indexes) live and
  * consistent — same versioned-commit discipline as
  * [[graft.etl.Watermarks.writeState]] and the
  * [[graft.etl.MaterializedAgg]] manifest. Readers resolve the current
  * generation through the pointer and always see data WITH the indexes
  * harvested from exactly those files — an index can never be paired with
  * a generation it didn't scan.
  *
  * At 100 TB each piece keeps its documented cost: the compaction rewrite
  * is the data-sized job (clustered by the scan dimension so footer boxes
  * stay tight), both harvests are metadata jobs (footer reads / one
  * aggregation pass), the pointer is one row. Old generations are retained
  * for lagging readers ([[RetainGens]]) and vacuumed after.
  */
object TableMaintenance {

  /** Generations kept beyond the current one (lagging-reader grace). */
  val RetainGens = 1

  /** Unreferenced generations younger than this survive vacuum — a fresh
    * below-head orphan may be a LIVE rival's claimed in-flight compaction
    * (MaterializedAgg.OrphanAgeMs documents the full rationale; Delta's
    * VACUUM retention window is the same idea). Test/ops hook. */
  private[graft] var OrphanAgeMs: Long = 60L * 60 * 1000

  def dataPath(root: String, gen: Long): String = s"$root/gen=$gen/data"
  private def statsPath(root: String, gen: Long) = s"$root/gen=$gen/_stats"
  private def bloomPath(root: String, gen: Long) = s"$root/gen=$gen/_bloom"

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointerVersions(spark: SparkSession, root: String): Seq[Long] =
    CommittedVersions.list(spark, s"$root/_current")

  /** (pointer version, generation) at the committed head — the single
    * resolution shared by [[currentGen]] and [[maintain]] (which needs the
    * VERSION too, to CAS its commit against the head it read). */
  def head(spark: SparkSession, root: String): (Long, Long) = {
    val v = pointerVersions(spark, root).maxOption.getOrElse(
      sys.error(s"no committed generation pointer under $root"))
    (v, spark.read.parquet(s"$root/_current/v=$v").head().getLong(0))
  }

  /** The committed current generation. */
  def currentGen(spark: SparkSession, root: String): Long = head(spark, root)._2

  /** Harvest BOTH skipping indexes over generation `gen`'s data dir,
    * persist them beside it, and flip the pointer — the commit half shared
    * by [[initGen]] and [[maintain]]. Everything lands before the pointer
    * version's `_SUCCESS`, so the flip is all-or-nothing. */
  /** Concurrency (round 13): the pointer flip is a check-and-fail CAS at
    * `v = basedOnVersion + 1`, where `basedOnVersion` is the pointer
    * version the caller READ AT THE START of its cycle — not re-read at
    * commit time, which would let a maintainer that compacted a
    * superseded generation slide in at head+1 and flip the table
    * BACKWARD with no conflict ever raised (review finding). Conflict
    * rule: if a rival committed basedOnVersion+1 first, this maintainer's
    * input generation is stale and it is REJECTED with a loud
    * ConcurrentCommitException — its claimed gen dir is an unreferenced
    * orphan a later maintain() vacuums. Re-read currentGen and re-run. */
  def commitGen(spark: SparkSession, root: String, gen: Long,
                statsCols: Seq[String], bloomCols: Seq[String],
                basedOnVersion: Long): Unit = {
    import spark.implicits._
    StatsManifest.build(spark, dataPath(root, gen), statsCols)
      .coalesce(1).write.mode("overwrite").parquet(statsPath(root, gen))
    BloomSkipIndex.build(spark, dataPath(root, gen), bloomCols)
      .coalesce(1).write.mode("overwrite").parquet(bloomPath(root, gen))
    CommittedVersions.publishVersion(
      Seq(gen).toDF("gen").coalesce(1), s"$root/_current", basedOnVersion + 1L,
      "TableMaintenance pointer")
  }

  /** Initialize the store: the caller has written raw data under
    * `dataPath(root, 1)`; this harvests its indexes and commits gen 1
    * (based on the empty pointer — two concurrent initializers CAS-race
    * v=1 like any other flip). */
  def initGen(spark: SparkSession, root: String,
              statsCols: Seq[String], bloomCols: Seq[String]): Unit =
    commitGen(spark, root, 1L, statsCols, bloomCols,
      basedOnVersion = pointerVersions(spark, root).maxOption.getOrElse(0L))

  /** The maintenance transaction: bin-pack the current generation's files
    * clustered on `sortCol` (range partitioning keeps each output file's
    * min/max box tight in the scan dimension — compaction that ignored
    * clustering would merge disjoint boxes and undo the skipping layout),
    * RE-HARVEST both skipping indexes over the new files, flip the
    * pointer, and vacuum generations beyond the retention window. Returns
    * the new generation id. */
  def maintain(spark: SparkSession, root: String, sortCol: String,
               targetRowsPerFile: Long,
               statsCols: Seq[String], bloomCols: Seq[String]): Long = {
    // the head (version AND generation) is read ONCE at cycle start; the
    // pointer CAS commits at curV+1, so any rival flip during the
    // compaction rejects this cycle as stale
    val (curV, cur) = head(spark, root)
    // exclusive-create claim: concurrent maintainers compact into DISJOINT
    // generation dirs (both writing gen=cur+1 was the pre-CAS interleave
    // window); the pointer CAS in commitGen then rejects the stale one
    val next = CommittedVersions.claimId(spark, s"$root/_genclaims", cur + 1L)
    val df = spark.read.parquet(dataPath(root, cur))
    val nFiles = math.max(1L, math.ceil(
      df.count().toDouble / targetRowsPerFile).toLong)
    // clear uncommitted leftovers (defensive: the claim makes gen=next ours)
    fs(spark, root).delete(new Path(s"$root/gen=$next"), true)
    df.repartitionByRange(nFiles.toInt, col(sortCol))
      .write.option("maxRecordsPerFile", targetRowsPerFile)
      .parquet(dataPath(root, next))
    commitGen(spark, root, next, statsCols, bloomCols, basedOnVersion = curV)
    // vacuum: committed pointer versions beyond retention, then every
    // generation no retained pointer references — but only BELOW the live
    // head: a higher unreferenced gen may be a concurrent maintainer's
    // claimed in-flight write (a CAS loser's orphan is cleaned by the
    // next maintain, once the head passes it). Dead claims likewise.
    val f = fs(spark, root)
    val versions = pointerVersions(spark, root).sorted
    versions.dropRight(RetainGens + 1).foreach { v =>
      f.delete(new Path(s"$root/_current/v=$v"), true)
    }
    val liveGens = pointerVersions(spark, root).map(v =>
      spark.read.parquet(s"$root/_current/v=$v").head().getLong(0)).toSet
    val maxLive = liveGens.maxOption.getOrElse(0L)
    val cutoff = System.currentTimeMillis() - OrphanAgeMs
    f.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen=") &&
        s.getModificationTime < cutoff)
      .map(_.getPath.getName.stripPrefix("gen=").toLong)
      .filter(g => g < maxLive && !liveGens(g))
      .foreach(g => f.delete(new Path(s"$root/gen=$g"), true))
    // dead claims = at or below the OLDEST retained head (any retained
    // writer claims from readGen+1 > that); the live head's own claim must
    // survive or a stale rival could re-claim the live generation
    CommittedVersions.vacuumClaims(spark, s"$root/_genclaims",
      liveGens.minOption.getOrElse(0L))
    CommittedVersions.vacuumStaging(spark, s"$root/_current", OrphanAgeMs)
    next
  }

  /** Committed pointer history: (version, generation) pairs within the
    * retention window — the time-travel surface. */
  def pointerHistory(spark: SparkSession, root: String): Seq[(Long, Long)] =
    pointerVersions(spark, root).sorted.map { v =>
      v -> spark.read.parquet(s"$root/_current/v=$v").head().getLong(0)
    }

  /** Time travel: the data as of pointer version `version` (Delta's
    * VERSION AS OF). Retention-bounded — [[maintain]] keeps
    * [[RetainGens]] superseded generations and their pointer versions
    * alive precisely so a lagging reader (or an explicit as-of audit) can
    * still resolve them; older versions are vacuumed and raise here. */
  def readAsOf(spark: SparkSession, root: String, version: Long): DataFrame = {
    val hist = pointerHistory(spark, root).toMap
    val gen = hist.getOrElse(version,
      sys.error(s"pointer version $version is not committed (or was vacuumed); " +
        s"available: ${hist.keys.toSeq.sorted.mkString(", ")}"))
    spark.read.parquet(dataPath(root, gen))
  }

  /** The persisted stats manifest / Bloom index of a generation. */
  def statsManifest(spark: SparkSession, root: String, gen: Long): DataFrame =
    spark.read.parquet(statsPath(root, gen))
  def bloomIndex(spark: SparkSession, root: String, gen: Long): DataFrame =
    spark.read.parquet(bloomPath(root, gen))

  /** Box-pruned scan of the CURRENT generation through its own persisted
    * manifest — the read path that stays fast across maintenance cycles. */
  def readCurrentPruned(spark: SparkSession, root: String,
                        ranges: Seq[(String, Double, Double)],
                        residual: Column): DataFrame = {
    val g = currentGen(spark, root)
    StatsManifest.readPruned(spark, dataPath(root, g),
      statsManifest(spark, root, g), ranges, residual)
  }

  /** Bloom-pruned point lookup on the current generation. */
  def pointLookupCurrent(spark: SparkSession, root: String,
                         column: String, value: Column): DataFrame = {
    val g = currentGen(spark, root)
    BloomSkipIndex.readPruned(spark, dataPath(root, g),
      bloomIndex(spark, root, g), column, value)
  }
}
