package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** File-skipping properties the registered oracle can't see (layout is
  * range-partitioner-dependent): the manifest's row accounting, pruning
  * correctness on arbitrary boxes, and the point of it all — a box
  * predicate on a z-ordered layout actually skips files, while the same
  * predicate on the same data shuffled randomly prunes nothing. */
class StatsManifestSpec extends SparkSpec {
  import spark.implicits._

  private val NFiles = 16

  /** 40x40 grid, one row per (x, y) cell, plus some null-valued rows. */
  private lazy val grid = (0 until 40).flatMap { x =>
    (0 until 40).map { y =>
      (x.toLong * 40 + y, x.toLong, y.toLong,
        if ((x + y) % 100 == 99) None else Some(x * 1000.0 + y))
    }
  }.toDF("id", "x", "y", "value")

  private def writeZordered(root: String): Unit =
    grid.withColumn("zval", graft.operators.ZOrder.zValue(col("x"), col("y"), 6))
      .repartitionByRange(NFiles, col("zval"))
      .write.mode("overwrite").parquet(root)

  private def writeShuffled(root: String): Unit =
    grid.repartition(NFiles, col("id")) // hash on id: every file spans all of x and y
      .write.mode("overwrite").parquet(root)

  test("manifest accounts for every row and the declared columns") {
    val root = s"${sys.props("java.io.tmpdir")}/graft-manifest-spec-z"
    writeZordered(root)
    val mf = StatsManifest.build(spark, root, Seq("x", "y", "value"))
    val files = mf.select("file").distinct().count()
    assert(files == NFiles, s"expected $NFiles files, manifest saw $files")
    // per-column row totals == table rows
    val perCol = mf.groupBy("column").agg(sum("n_rows").as("rows"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perCol.keySet == Set("x", "y", "value"))
    assert(perCol.values.forall(_ == grid.count()))
    // the nullable column's null count survives footer aggregation
    val nulls = mf.where(col("column") === "value").agg(sum("n_nulls")).head.getLong(0)
    assert(nulls == grid.where(col("value").isNull).count())
  }

  test("pruned scan == full scan on arbitrary boxes (correctness never depends on pruning)") {
    val root = s"${sys.props("java.io.tmpdir")}/graft-manifest-spec-z"
    writeZordered(root)
    val mf = StatsManifest.build(spark, root, Seq("x", "y")).cache()
    for ((xLo, xHi, yLo, yHi) <- Seq((3, 9, 3, 9), (0, 39, 20, 22), (35, 39, 0, 4), (12, 12, 30, 38))) {
      val pruned = StatsManifest.readPruned(spark, root, mf,
        Seq(("x", xLo, xHi), ("y", yLo, yHi)),
        col("x").between(xLo, xHi) && col("y").between(yLo, yHi))
        .select("id").as[Long].collect().toSet
      val full = grid.where(col("x").between(xLo, xHi) && col("y").between(yLo, yHi))
        .select("id").as[Long].collect().toSet
      assert(pruned == full, s"box ($xLo-$xHi, $yLo-$yHi) mismatch")
    }
    mf.unpersist()
  }

  test("z-ordered layout skips most files for a box predicate; a hash layout skips none") {
    val zRoot = s"${sys.props("java.io.tmpdir")}/graft-manifest-spec-z"
    val hRoot = s"${sys.props("java.io.tmpdir")}/graft-manifest-spec-h"
    writeZordered(zRoot); writeShuffled(hRoot)
    val box = Seq(("x", 3.0, 9.0), ("y", 3.0, 9.0)) // ~3% of the grid area
    val zKept = StatsManifest.prunedFiles(
      StatsManifest.build(spark, zRoot, Seq("x", "y")),
      StatsManifest.listFiles(spark, zRoot), box).size
    val hKept = StatsManifest.prunedFiles(
      StatsManifest.build(spark, hRoot, Seq("x", "y")),
      StatsManifest.listFiles(spark, hRoot), box).size
    assert(zKept <= NFiles / 2, s"z-ordered layout kept $zKept of $NFiles files")
    assert(hKept == NFiles, s"hash layout should prune nothing, kept $hKept")
  }

  test("files with no usable stats, or no manifest row at all, are conservatively kept") {
    val mf = Seq(
      ("f1.parquet", "x", 10L, Some(0.0), Some(5.0), Some(0L)),
      ("f2.parquet", "x", 10L, None: Option[Double], None: Option[Double], None: Option[Long]),
      ("f3.parquet", "x", 10L, Some(50.0), Some(60.0), Some(0L))
    ).toDF("file", "column", "n_rows", "vmin", "vmax", "n_nulls")
    // f4 was appended after the harvest: it has NO manifest row and must
    // survive pruning — only a positive stats verdict may exclude a file
    val universe = Seq("f1.parquet", "f2.parquet", "f3.parquet", "f4.parquet")
    val kept = StatsManifest.prunedFiles(mf, universe, Seq(("x", 0.0, 9.0)))
    assert(kept == Seq("f1.parquet", "f2.parquet", "f4.parquet"))
  }

  test("an appended (unharvested) file's rows survive a pruned read") {
    val root = s"${sys.props("java.io.tmpdir")}/graft-manifest-spec-app"
    writeZordered(root)
    val mf = StatsManifest.build(spark, root, Seq("x", "y"))
    // append a file AFTER the harvest containing an in-box row
    Seq((99999L, 5L, 5L, Some(123.0))).toDF("id", "x", "y", "value")
      .coalesce(1).write.mode("append").parquet(root)
    val got = StatsManifest.readPruned(spark, root, mf,
      Seq(("x", 3.0, 9.0), ("y", 3.0, 9.0)),
      col("x").between(3, 9) && col("y").between(3, 9))
      .select("id").as[Long].collect().toSet
    assert(got.contains(99999L), "appended file's rows must not vanish from a pruned read")
  }
}
