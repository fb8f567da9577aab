package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The row-level forget contract on the maintained store, end to end:
  * (1) forget is an O(delete-set) tombstone write — NO data byte moves;
  * (2) logical erasure is immediate — every current-version read path
  *     masks pending tombstones;
  * (3) the next maintain() purges physically and re-harvests skipping,
  *     so a forgotten key's Bloom probe prunes EVERY file;
  * (4) a forget landing after a purge cycle stays pending on the new
  *     generation (the purge-horizon rule) and the following cycle takes
  *     it — no lost delete;
  * (5) the erasure timeline: readAsOf keeps as-of semantics on retained
  *     pre-delete versions; physical erasure completes when vacuum drops
  *     the last retained generation holding the bytes, and tombstone
  *     versions every retained generation applied are dropped with it;
  * (6) concurrent forgets serialize through the version CAS — both land.
  */
class TombstoneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = s"${sys.props("java.io.tmpdir")}/graft-tombstone-spec"
    val fs = new org.apache.hadoop.fs.Path(r)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(r), true)
    val df = (0 until 20000).map(i => (i.toLong, (i % 7).toLong, i.toDouble))
      .toDF("k", "grp", "value")
    df.repartition(4).write.parquet(TableMaintenance.dataPath(r, 1L))
    TableMaintenance.initGen(spark, r, Seq("k"), Seq("k"))
    r
  }

  private def fs = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFileSizes(gen: Long): Map[String, Long] = {
    val dir = TableMaintenance.dataPath(root, gen)
    StatsManifest.listFiles(spark, dir)
      .map(f => f -> fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/$f")).getLen)
      .toMap
  }

  // every k ≡ 3 (mod 100): 200 keys of the 20000
  private val forgetPred = col("k") % 100 === 3

  test("forget writes tombstones only — no data file is touched") {
    val before = dataFileSizes(1L)
    val v = TableMaintenance.forget(spark, root, "k",
      spark.range(20000).select(col("id").as("k")).where(forgetPred))
    assert(v == 1L)
    assert(dataFileSizes(1L) == before,
      "forget must be an O(delete-set) metadata write — data files byte-identical")
    val (_, gen, purged) = TableMaintenance.headState(spark, root)
    assert(gen == 1L && purged == 0L, "forget flips no pointer and purges nothing")
  }

  test("logical erasure is immediate on every current-version read path") {
    assert(TableMaintenance.readCurrent(spark, root).where(forgetPred).count() == 0)
    assert(TableMaintenance.readCurrent(spark, root).count() == 20000 - 200)
    assert(TableMaintenance.readCurrentPruned(spark, root,
      Seq(("k", 0.0, 500.0)), col("k") <= 500).where(forgetPred).count() == 0)
    assert(TableMaintenance.pointLookupCurrent(spark, root, "k", lit(103L)).count() == 0,
      "a tombstoned key's point lookup must return nothing pre-purge")
    assert(TableMaintenance.pointLookupCurrent(spark, root, "k", lit(104L)).count() == 1,
      "a surviving key still resolves")
  }

  test("maintain() purges physically and the re-harvested Bloom prunes a forgotten key everywhere") {
    val next = TableMaintenance.maintain(spark, root, "k", 5000L, Seq("k"), Seq("k"))
    // raw file read (below the masking layer): the bytes are gone
    val raw = spark.read.parquet(TableMaintenance.dataPath(root, next))
    assert(raw.where(forgetPred).count() == 0, "purge must remove the rows from the files")
    assert(raw.count() == 20000 - 200)
    // the re-harvested Bloom index no longer CONTAINS the forgotten key:
    // its probe prunes (false positives permitted — that's a Bloom filter;
    // the exact equality re-applies inside) and the lookup returns nothing
    val files = StatsManifest.listFiles(spark, TableMaintenance.dataPath(root, next))
    val kept = BloomSkipIndex.prunedFiles(
      TableMaintenance.bloomIndex(spark, root, next), files, "k", lit(103L))
    assert(kept.size < files.size,
      s"a purged key must Bloom-prune real files (kept ${kept.size} of ${files.size})")
    assert(TableMaintenance.pointLookupCurrent(spark, root, "k", lit(103L)).count() == 0)
    // a surviving key is still found through the new index
    assert(TableMaintenance.pointLookupCurrent(spark, root, "k", lit(104L)).count() == 1)
    val (_, _, purged) = TableMaintenance.headState(spark, root)
    assert(purged == 1L, "the new generation records the applied tombstone horizon")
  }

  test("a forget after the purge stays pending on the new generation and the next cycle takes it") {
    val v = TableMaintenance.forget(spark, root, "k",
      spark.range(20000).select(col("id").as("k")).where(col("k") % 100 === 7))
    assert(v == 2L)
    // pending (v2 > purged_through=1) ⇒ masked now
    assert(TableMaintenance.readCurrent(spark, root).count() == 20000 - 400)
    TableMaintenance.maintain(spark, root, "k", 5000L, Seq("k"), Seq("k"))
    val (_, gen, purged) = TableMaintenance.headState(spark, root)
    assert(purged == 2L)
    assert(spark.read.parquet(TableMaintenance.dataPath(root, gen))
      .where(col("k") % 100 === 7).count() == 0)
    assert(TableMaintenance.pendingTombstones(spark, root).isEmpty,
      "everything applied — nothing pending")
  }

  test("erasure timeline: as-of reads keep pre-delete state; vacuum completes physical erasure") {
    // the retained superseded version (gen 2, purged_through=1) read as-of:
    // shows the v2-forgotten rows (as-of semantics — they were live then)
    val hist = TableMaintenance.pointerHistory(spark, root).toMap
    val versions = hist.keys.toSeq.sorted
    assert(versions.size == TableMaintenance.RetainGens + 1)
    val asOf = TableMaintenance.readAsOf(spark, root, versions.head)
    assert(asOf.where(col("k") % 100 === 7).count() == 200,
      "readAsOf deliberately shows the pre-delete state of a retained version")
    // ... but the FIRST forget (purged in every retained generation) is
    // physically gone from all of them, and its tombstone version was
    // vacuumed as dead
    assert(asOf.where(forgetPred).count() == 0)
    // v=1 is applied in EVERY retained generation — vacuumed (keys and
    // all: a tombstone outliving its purpose would retain exactly the
    // identifiers the request asked to forget); v=2 is still pending in
    // retained gen 2 and must survive
    assert(CommittedVersions.list(spark, s"$root/_deletes").sorted == Seq(2L))
    // one more cycle pushes gen 2 out of retention: physical erasure of
    // the v2 bytes completes (no generation on disk holds them)
    val old = TableMaintenance.OrphanAgeMs
    TableMaintenance.OrphanAgeMs = 0L
    try TableMaintenance.maintain(spark, root, "k", 5000L, Seq("k"), Seq("k"))
    finally TableMaintenance.OrphanAgeMs = old
    // every retained generation applied both tombstones: nothing survives
    // vacuum, and the pointer's purged_through watermark (not a kept
    // tombstone dir) is what stops a later forget reusing a dead number
    assert(CommittedVersions.list(spark, s"$root/_deletes").isEmpty)
    val (_, _, purgedNow) = TableMaintenance.headState(spark, root)
    assert(purgedNow == 2L)
    // a post-vacuum forget allocates ABOVE the watermark — never a reused
    // number that reads would treat as already applied
    val v3 = TableMaintenance.forget(spark, root, "k",
      spark.range(20000).select(col("id").as("k")).where(col("k") % 100 === 21))
    assert(v3 == 3L, s"expected allocation above purged_through=2, got $v3")
    assert(TableMaintenance.readCurrent(spark, root).where(col("k") % 100 === 21).count() == 0,
      "the new delete-set must be pending (masked), not silently pre-applied")
    val gensOnDisk = fs.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("gen="))
      .map(_.stripPrefix("gen=").toLong).sorted
    gensOnDisk.foreach { g =>
      assert(spark.read.parquet(TableMaintenance.dataPath(root, g))
        .where(col("k") % 100 === 7).count() == 0,
        s"gen $g must not hold the forgotten bytes after the retention window passed")
    }
  }

  test("a forget on a different key column is rejected loudly (mixed tombstone schemas lose deletes)") {
    intercept[IllegalArgumentException] {
      TableMaintenance.forget(spark, root, "grp",
        spark.range(3).select(col("id").as("grp")))
    }
  }

  test("concurrent forgets serialize through the tombstone-version CAS — both land") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val sets = Seq(11L, 13L)
    val vs = Await.result(
      Future.sequence(sets.map(m => Future {
        TableMaintenance.forget(spark, root, "k",
          spark.range(20000).select(col("id").as("k")).where(col("k") % 100 === m))
      })), 120.seconds)
    assert(vs.toSet.size == 2, s"both forgets must land at distinct versions: $vs")
    val masked = TableMaintenance.readCurrent(spark, root)
    assert(masked.where(col("k") % 100 === 11).count() == 0)
    assert(masked.where(col("k") % 100 === 13).count() == 0)
  }
}
