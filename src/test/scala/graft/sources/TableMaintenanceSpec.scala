package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The maintenance-transaction contract: compaction RESTORES file
  * skipping. Before: an unclustered ingest-debris generation where every
  * file's min/max box spans the whole key range (pruning keeps all files)
  * — and, crucially, where the OLD generation's manifest says nothing
  * about the new files (conservative keeps ⇒ zero skipping), which is the
  * silent degradation maintain() exists to close. After maintain():
  * the clustered generation's re-harvested manifest prunes real files,
  * the Bloom index prunes point lookups, the pointer names the new
  * generation, and the pruned reads stay bit-identical to full scans. */
class TableMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = s"${sys.props("java.io.tmpdir")}/graft-maint-spec"
    val fs = new org.apache.hadoop.fs.Path(r)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(r), true)
    // 20k rows keyed 0..19999; gen 1 written by 8 unclustered writers so
    // every file spans ~the full key range
    val df = (0 until 20000).map(i => (i.toLong, i % 7, i.toDouble))
      .toDF("k", "grp", "value")
    df.repartition(8).write.parquet(TableMaintenance.dataPath(r, 1L))
    TableMaintenance.initGen(spark, r, Seq("k"), Seq("k"))
    r
  }

  private def allFiles(gen: Long): Seq[String] =
    StatsManifest.listFiles(spark, TableMaintenance.dataPath(root, gen))

  test("before maintenance: unclustered boxes prune nothing (the degraded baseline)") {
    assert(TableMaintenance.currentGen(spark, root) == 1L)
    val kept = StatsManifest.prunedFiles(
      TableMaintenance.statsManifest(spark, root, 1L), allFiles(1L),
      Seq(("k", 100.0, 300.0)))
    assert(kept.size == allFiles(1L).size,
      "8 unclustered writers must produce full-range boxes — nothing prunable")
  }

  test("maintain() compacts clustered, re-harvests, flips the pointer, and skipping works") {
    val next = TableMaintenance.maintain(spark, root, "k", 2500L, Seq("k"), Seq("k"))
    assert(TableMaintenance.currentGen(spark, root) == next)

    // the OLD manifest knows none of the new files: conservative keeps ⇒
    // zero pruning — exactly the degradation the one-call transaction closes
    val staleKept = StatsManifest.prunedFiles(
      TableMaintenance.statsManifest(spark, root, 1L), allFiles(next),
      Seq(("k", 100.0, 300.0)))
    assert(staleKept.size == allFiles(next).size,
      "a stale manifest must keep everything (conservative), i.e. prune nothing")

    // the RE-HARVESTED manifest prunes: range-clustered files have tight
    // boxes, so a narrow box keeps only a sliver of the 8 files
    val freshKept = StatsManifest.prunedFiles(
      TableMaintenance.statsManifest(spark, root, next), allFiles(next),
      Seq(("k", 100.0, 300.0)))
    assert(allFiles(next).size >= 4, "compaction target must yield several files")
    assert(freshKept.size < allFiles(next).size,
      s"re-harvested manifest must skip files: kept ${freshKept.size}/${allFiles(next).size}")

    // pruned read ≡ full filtered scan, bit-for-bit
    val pruned = TableMaintenance.readCurrentPruned(spark, root,
        Seq(("k", 100.0, 300.0)), col("k").between(100, 300))
      .select("k", "grp", "value").collect().map(_.mkString("|")).toSet
    val full = spark.read.parquet(TableMaintenance.dataPath(root, next))
      .where(col("k").between(100, 300))
      .select("k", "grp", "value").collect().map(_.mkString("|")).toSet
    assert(pruned == full)

    // Bloom point lookup on the maintained generation: pruned and exact
    val bloomKept = BloomSkipIndex.prunedFiles(
      TableMaintenance.bloomIndex(spark, root, next), allFiles(next),
      "k", lit(12345L))
    assert(bloomKept.size < allFiles(next).size,
      s"bloom must skip files for a point key: kept ${bloomKept.size}/${allFiles(next).size}")
    val hit = TableMaintenance.pointLookupCurrent(spark, root, "k", lit(12345L))
      .select("k").as[Long].collect().toSeq
    assert(hit == Seq(12345L))

    // time travel: the superseded pointer version still resolves (within
    // retention) and serves content identical to the compacted generation
    val hist = TableMaintenance.pointerHistory(spark, root)
    assert(hist.map(_._2) == Seq(1L, next), s"history $hist")
    val v1 = hist.head._1
    val asOf = TableMaintenance.readAsOf(spark, root, v1)
      .select("k", "grp", "value").collect().map(_.mkString("|")).toSet
    val cur = spark.read.parquet(TableMaintenance.dataPath(root, next))
      .select("k", "grp", "value").collect().map(_.mkString("|")).toSet
    assert(asOf == cur, "compaction must preserve content across generations")
    intercept[RuntimeException] {
      TableMaintenance.readAsOf(spark, root, 999L)
    }
  }

  test("a pre-purge-horizon pointer row (gen only, no purged_through) still reads; maintain upgrades it") {
    // stores committed before round 13's purge horizon wrote pointer rows
    // with only `gen`; they must read as purged_through = 0 (nothing
    // physically purged) instead of throwing on every head resolution,
    // and the next maintain() writes the full schema in place
    val r = s"${sys.props("java.io.tmpdir")}/graft-maint-migration-spec"
    val fs = new org.apache.hadoop.fs.Path(r)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(r), true)
    (0 until 1000).map(i => (i.toLong, i.toDouble)).toDF("k", "value")
      .repartition(2).write.parquet(TableMaintenance.dataPath(r, 1L))
    TableMaintenance.initGen(spark, r, Seq("k"), Seq("k"))
    // overwrite the pointer with the LEGACY schema at the next version
    CommittedVersions.publishVersion(
      Seq(1L).toDF("gen").coalesce(1), s"$r/_current", 2L, "legacy pointer")
    val (v, gen, purged) = TableMaintenance.headState(spark, r)
    assert((v, gen, purged) == ((2L, 1L, 0L)),
      s"legacy pointer must read purged_through = 0, got ($v, $gen, $purged)")
    assert(TableMaintenance.readCurrent(spark, r).count() == 1000L)
    // forget + maintain on the legacy store works end to end and writes
    // the modern pointer schema
    TableMaintenance.forget(spark, r, "k",
      spark.range(1000).select(col("id").as("k")).where(col("k") % 10 === 3))
    assert(TableMaintenance.readCurrent(spark, r).count() == 900L)
    TableMaintenance.maintain(spark, r, "k", 5000L, Seq("k"), Seq("k"))
    val (_, _, purged2) = TableMaintenance.headState(spark, r)
    assert(purged2 > 0L, "maintain must record the purge horizon on the upgraded pointer")
    assert(TableMaintenance.readCurrent(spark, r).count() == 900L)
  }

  test("a pointer with purged_through PRESENT but NULL fails loudly, never reads as 0") {
    // only ABSENCE is the legacy case; a null in a modern pointer is
    // corruption — reading it as 0 would let forget()'s allocation floor
    // reuse a dead tombstone version after a vacuum (lost delete)
    val r = s"${sys.props("java.io.tmpdir")}/graft-maint-nullptr-spec"
    val fs = new org.apache.hadoop.fs.Path(r)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(r), true)
    (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("k", "value")
      .write.parquet(TableMaintenance.dataPath(r, 1L))
    TableMaintenance.initGen(spark, r, Seq("k"), Seq("k"))
    CommittedVersions.publishVersion(
      Seq((1L, null.asInstanceOf[java.lang.Long])).toDF("gen", "purged_through")
        .coalesce(1),
      s"$r/_current", 2L, "corrupt pointer")
    val ex = intercept[IllegalArgumentException](TableMaintenance.headState(spark, r))
    assert(ex.getMessage.contains("purged_through"), ex.getMessage)
  }
}
