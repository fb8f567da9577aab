package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MV-maintenance properties beyond the registered oracle: merge ≡
  * recompute across arbitrary splits, untouched bucket partitions are not
  * rewritten by a refresh, chained increments compose, and an empty
  * increment is a no-op. */
class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("grp", "sub")

  /** Seeded synthetic frame: 60 groups across the bucket space. */
  private lazy val data = {
    val rnd = new scala.util.Random(20260815L)
    (1 to 4000).map { i =>
      (s"g${rnd.nextInt(12)}", rnd.nextInt(5), i.toLong,
        if (rnd.nextInt(50) == 0) None else Some(rnd.nextDouble() * 200 - 100))
    }.toDF("grp", "sub", "row_id", "value")
  }

  private def finalize(df: org.apache.spark.sql.DataFrame) = {
    import graft.sqlx.Exact
    df.groupBy("grp", "sub").agg(
      count(lit(1)).as("n_rows"),
      Exact.decSumAgg(col("value")).as("value_sum"),
      Exact.r4(Exact.decSumAgg(col("value")) / count(col("value"))).as("value_avg"),
      min(col("value")).as("value_min"),
      max(col("value")).as("value_max"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  /** bucket dir -> the full recursive (gen dir, file, mtime) fingerprint:
    * under the manifest layout a refresh must add a NEW generation for the
    * touched buckets and leave every untouched bucket's generation set
    * byte-identical (no rename, no delete of live dirs). */
  private def bucketFiles(root: String): Map[String, Set[String]] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/data")).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
      .map { st =>
        st.getPath.getName ->
          fs.listStatus(st.getPath).toSet.flatMap { (g: org.apache.hadoop.fs.FileStatus) =>
            fs.listStatus(g.getPath).map(f =>
              s"${g.getPath.getName}/${f.getPath.getName}:${f.getModificationTime}").toSet
          }
      }.toMap
  }

  test("incremental refresh == full recompute, for any split; empty increment is a no-op") {
    for (mod <- Seq(2, 7)) {
      val root = s"${sys.props("java.io.tmpdir")}/graft-mv-spec-$mod"
      val base = data.where(col("row_id") % mod =!= 0)
      val inc = data.where(col("row_id") % mod === 0)
      MaterializedAgg.writeInit(base, keys, "value", root)
      val touched = MaterializedAgg.refresh(spark, root, inc, keys, "value")
      assert(touched.nonEmpty)
      val got = rows(MaterializedAgg.read(spark, root, keys))
      assert(got == rows(finalize(data)), s"mod=$mod incremental != recompute")
      // empty increment: no buckets touched, state unchanged
      assert(MaterializedAgg.refresh(spark, root, data.where(lit(false)), keys, "value").isEmpty)
      assert(rows(MaterializedAgg.read(spark, root, keys)) == got)
    }
  }

  test("refresh rewrites only the touched bucket partitions") {
    val root = s"${sys.props("java.io.tmpdir")}/graft-mv-spec-touch"
    MaterializedAgg.writeInit(data, keys, "value", root)
    val before = bucketFiles(root)
    // an increment confined to ONE group -> exactly one bucket
    val inc = Seq(("g3", 1, 99999L, Some(42.0))).toDF("grp", "sub", "row_id", "value")
    val touched = MaterializedAgg.refresh(spark, root, inc, keys, "value")
    assert(touched.size == 1)
    val after = bucketFiles(root)
    val touchedDir = s"bucket=${touched.head}"
    assert(after(touchedDir) != before(touchedDir), "touched bucket must be rewritten")
    (before.keySet - touchedDir).foreach { dir =>
      assert(after(dir) == before(dir), s"untouched $dir was rewritten")
    }
    // and the merged view is still exact
    assert(rows(MaterializedAgg.read(spark, root, keys)) ==
      rows(finalize(data.unionByName(inc))))
  }

  test("refreshOnce makes a replayed micro-batch a no-op (exactly-once on the store)") {
    val root = s"${sys.props("java.io.tmpdir")}/graft-mv-spec-once"
    val base = data.where(col("row_id") <= 3000)
    val inc = data.where(col("row_id") > 3000)
    MaterializedAgg.writeInit(base, keys, "value", root)
    assert(MaterializedAgg.refreshOnce(spark, root, 7L, inc, keys, "value"))
    val after = rows(MaterializedAgg.read(spark, root, keys))
    // the crash-replay: same batch id delivered again must not double-count
    assert(!MaterializedAgg.refreshOnce(spark, root, 7L, inc, keys, "value"))
    assert(rows(MaterializedAgg.read(spark, root, keys)) == after)
    assert(after == rows(finalize(data)))
    // and writeInit resets the applied-batch set along with the state
    MaterializedAgg.writeInit(base, keys, "value", root)
    assert(MaterializedAgg.refreshOnce(spark, root, 7L, inc, keys, "value"))
  }

  test("an EMPTY micro-batch still advances the applied-batch mark (mark-only flip)") {
    val root = s"${sys.props("java.io.tmpdir")}/graft-mv-spec-emptymark"
    val base = data.where(col("row_id") <= 3000)
    val inc = data.where(col("row_id") > 3000)
    MaterializedAgg.writeInit(base, keys, "value", root)
    val before = rows(MaterializedAgg.read(spark, root, keys))
    // batch 5 delivers zero rows: applied, data untouched — but the mark
    // must advance with the reported application, or a replay of batch 5
    // carrying DIFFERENT (now non-empty) rows would double-apply later ids
    assert(MaterializedAgg.refreshOnce(spark, root, 5L, data.where(lit(false)), keys, "value"))
    assert(rows(MaterializedAgg.read(spark, root, keys)) == before)
    // the mark advanced: a replay of batch 5 (even non-empty) is a no-op...
    assert(!MaterializedAgg.refreshOnce(spark, root, 5L, inc, keys, "value"))
    assert(rows(MaterializedAgg.read(spark, root, keys)) == before)
    // ...and the next batch applies normally
    assert(MaterializedAgg.refreshOnce(spark, root, 6L, inc, keys, "value"))
    assert(rows(MaterializedAgg.read(spark, root, keys)) == rows(finalize(data)))
  }

  test("uncommitted generation dirs (a crashed refresh) are invisible to readers " +
    "and overwritten idempotently by the retry") {
    val root = s"${sys.props("java.io.tmpdir")}/graft-mv-spec-crash"
    val base = data.where(col("row_id") <= 3000)
    val inc = data.where(col("row_id") > 3000)
    MaterializedAgg.writeInit(base, keys, "value", root)
    val before = rows(MaterializedAgg.read(spark, root, keys))
    // simulate a refresh that crashed after writing data but before the
    // manifest flip: orphan gen=2 dirs with garbage partial files
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    MaterializedAgg.partials(inc, keys, "value")
      .withColumn("gen", lit(2L))
      .write.mode("append").partitionBy("bucket", "gen").parquet(s"$root/data")
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(s"$root/data/bucket=*/gen=2")).nonEmpty)
    // readers resolve through the committed manifest: the orphans are invisible
    assert(rows(MaterializedAgg.read(spark, root, keys)) == before)
    // the replayed batch lands exactly once despite the half-written gen 2
    assert(MaterializedAgg.refreshOnce(spark, root, 1L, inc, keys, "value"))
    assert(rows(MaterializedAgg.read(spark, root, keys)) == rows(finalize(data)))
    assert(!MaterializedAgg.refreshOnce(spark, root, 1L, inc, keys, "value"))
    assert(rows(MaterializedAgg.read(spark, root, keys)) == rows(finalize(data)))
  }

  test("chained increments compose: refresh(refresh(init)) == one recompute") {
    val root = s"${sys.props("java.io.tmpdir")}/graft-mv-spec-chain"
    MaterializedAgg.writeInit(data.where(col("row_id") <= 2000), keys, "value", root)
    MaterializedAgg.refresh(spark, root,
      data.where(col("row_id") > 2000 && col("row_id") <= 3000), keys, "value")
    MaterializedAgg.refresh(spark, root,
      data.where(col("row_id") > 3000), keys, "value")
    assert(rows(MaterializedAgg.read(spark, root, keys)) == rows(finalize(data)))
  }

  test("retract == recompute of the remaining rows (boundary min/max and null deletes included)") {
    for (mod <- Seq(3, 10)) {
      val root = s"${sys.props("java.io.tmpdir")}/graft-mv-spec-retract-$mod"
      MaterializedAgg.writeInit(data, keys, "value", root)
      // row_id % mod = 0 deletes hit ~every group, including rows holding
      // group minima/maxima (boundary recompute) and null-valued rows
      val gone = col("row_id") % mod === 0
      val touched = MaterializedAgg.retract(
        spark, root, data.where(gone), data.where(!gone), keys, "value")
      assert(touched.nonEmpty)
      assert(rows(MaterializedAgg.read(spark, root, keys)) ==
        rows(finalize(data.where(!gone))), s"mod=$mod retraction != recompute")
      // retraction composes with a later insert refresh
      MaterializedAgg.refresh(spark, root, data.where(gone), keys, "value")
      assert(rows(MaterializedAgg.read(spark, root, keys)) == rows(finalize(data)))
    }
  }

  test("retracting a group's last row removes the group from the view") {
    val root = s"${sys.props("java.io.tmpdir")}/graft-mv-spec-retract-all"
    MaterializedAgg.writeInit(data, keys, "value", root)
    val gone = col("grp") === "g5"
    MaterializedAgg.retract(spark, root, data.where(gone), data.where(!gone), keys, "value")
    val view = MaterializedAgg.read(spark, root, keys)
    assert(view.where(col("grp") === "g5").count() == 0, "emptied groups must vanish")
    assert(rows(view) == rows(finalize(data.where(!gone))))
  }

  test("retract rewrites only the touched bucket partitions") {
    val root = s"${sys.props("java.io.tmpdir")}/graft-mv-spec-retract-touch"
    MaterializedAgg.writeInit(data, keys, "value", root)
    val before = bucketFiles(root)
    // a delete confined to ONE group -> exactly one bucket
    val gone = col("grp") === "g3" && col("sub") === 1
    val rid = data.where(gone).agg(min("row_id")).head().getLong(0)
    val touched = MaterializedAgg.retract(
      spark, root, data.where(col("row_id") === rid),
      data.where(col("row_id") =!= rid), keys, "value")
    assert(touched.size == 1)
    val after = bucketFiles(root)
    val touchedDir = s"bucket=${touched.head}"
    assert(after(touchedDir) != before(touchedDir), "touched bucket must be rewritten")
    (before.keySet - touchedDir).foreach { dir =>
      assert(after(dir) == before(dir), s"untouched $dir was rewritten by a retract")
    }
  }

  test("retractOnce: delete micro-batches apply exactly once and converge across splits") {
    val root = s"${sys.props("java.io.tmpdir")}/graft-mv-spec-retract-once"
    MaterializedAgg.writeInit(data, keys, "value", root)
    val gone = col("row_id") % 5 === 0
    val remaining = data.where(!gone)
    // the delete set arrives as two batches; `remaining` is the base with
    // ALL deletes applied (the CDC shape — base commits before the view)
    val b0 = data.where(gone && col("row_id") % 2 === 0)
    val b1 = data.where(gone && col("row_id") % 2 === 1)
    assert(MaterializedAgg.retractOnce(spark, root, 0L, b0, remaining, keys, "value"))
    // a replayed batch is a no-op: state unchanged, returns false
    val afterB0 = rows(MaterializedAgg.read(spark, root, keys))
    assert(!MaterializedAgg.retractOnce(spark, root, 0L, b0, remaining, keys, "value"))
    assert(rows(MaterializedAgg.read(spark, root, keys)) == afterB0,
      "a replayed delete batch must never subtract twice")
    assert(MaterializedAgg.retractOnce(spark, root, 1L, b1, remaining, keys, "value"))
    assert(rows(MaterializedAgg.read(spark, root, keys)) == rows(finalize(remaining)),
      "n delete micro-batches must converge to the one-shot recompute")
    // an EMPTY delete batch still advances the mark (mark-only flip)
    assert(MaterializedAgg.retractOnce(spark, root, 2L, data.where(lit(false)), remaining, keys, "value"))
    assert(!MaterializedAgg.retractOnce(spark, root, 2L, data.where(lit(false)), remaining, keys, "value"))
  }

  test("a bad delete batch aborts loudly BEFORE anything is written") {
    val root = s"${sys.props("java.io.tmpdir")}/graft-mv-spec-retract-bad"
    MaterializedAgg.writeInit(data, keys, "value", root)
    val before = rows(MaterializedAgg.read(spark, root, keys))
    val filesBefore = bucketFiles(root)
    // over-delete: the same rows twice -> would drive counts negative
    val doubled = data.where(col("grp") === "g2").unionByName(data.where(col("grp") === "g2"))
    intercept[IllegalArgumentException] {
      MaterializedAgg.retract(spark, root, doubled, data, keys, "value")
    }
    // orphan group: a delete for a key the view never held
    val orphan = Seq(("nope", 9, 1L, Some(1.0))).toDF("grp", "sub", "row_id", "value")
    intercept[IllegalArgumentException] {
      MaterializedAgg.retract(spark, root, orphan, data, keys, "value")
    }
    assert(rows(MaterializedAgg.read(spark, root, keys)) == before, "state must be unpoisoned")
    assert(bucketFiles(root) == filesBefore, "no generation may land for a rejected batch")
  }
}
