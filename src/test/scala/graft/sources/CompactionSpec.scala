package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compaction contracts: bin-packed file counts are exactly
  * ceil(rows/target) per partition, content survives the rewrite, the
  * before-state is genuinely fragmented, and re-compacting a packed table
  * is a no-op in file-count terms. */
class CompactionSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  test("bin-packs each day to ceil(rows/target) files, preserving content; idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graft-compaction-spec").toString
    val frag = s"$base/frag"; val packed = s"$base/packed"; val again = s"$base/again"
    val target = 20L // sf0.001 days hold ~30-50 events → multi-file packing
    val ev = graft.Tables.events(spark, dir).withColumn("date", col("ts").cast("date"))
    PartitionedTables.write(ev.repartition(8), frag, Seq("date"))

    // the staged store is genuinely fragmented: parallel writers left
    // multiple files in (at least) the populous days
    val fragCounts = Compaction.fileCounts(spark, frag, "date").toMap
    assert(fragCounts.values.exists(_ > 1), s"staging produced no fragmentation: $fragCounts")

    Compaction.compact(spark, frag, packed, "date", target)
    val expected = ev.groupBy(col("date").cast("string").as("date"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1) + target - 1) / target)).toMap
    val got = Compaction.fileCounts(spark, packed, "date").toMap
    assert(got == expected, s"file counts: got $got expected $expected")
    assert(got.values.exists(_ > 1), "target should force multi-file days at this SF")

    // content roundtrip: per-day rows and exact value sums survive
    val rawAgg = ev.groupBy("date").agg(count(lit(1)).as("n"),
      sum(graft.sqlx.Exact.dec(col("value"))).as("s"))
    val packedAgg = PartitionedTables.read(spark, packed).groupBy("date")
      .agg(count(lit(1)).as("n"), sum(graft.sqlx.Exact.dec(col("value"))).as("s"))
    assert(rawAgg.exceptAll(packedAgg).isEmpty && packedAgg.exceptAll(rawAgg).isEmpty)

    // idempotence: compacting the packed generation reproduces it
    Compaction.compact(spark, packed, again, "date", target)
    assert(Compaction.fileCounts(spark, again, "date").toMap == got)
  }
}
