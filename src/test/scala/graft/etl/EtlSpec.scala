package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental-processing contract (transformation_watermark_manager.py):
  * a successful run marks symbols fresh, so a second stale scan returns
  * none of them; failures accumulate and disable at 3 strikes. */
class EtlSpec extends SparkSpec {

  test("second run touches only symbols not refreshed by the first") {
    val wm = Watermarks.watermarkTable(spark, sf("sf0.001"))
    val firstStale = Watermarks.staleSymbols(wm)
    val n1 = firstStale.count()
    assert(n1 > 0)
    val updated = Watermarks.updateWatermarks(wm, firstStale.select("symbol_id"), success = true)
    val secondStale = Watermarks.staleSymbols(updated)
    assert(secondStale.count() == 0, "all stale symbols were just refreshed")
  }

  test("incremental feature run touches only stale symbols' rows") {
    import spark.implicits._
    val stale = Watermarks.staleSymbols(Watermarks.watermarkTable(spark, sf("sf0.001")))
      .select("symbol_id").as[Long].collect().toSet
    val inc = graft.SparkEntry.queries("watermark_incremental_features")(spark, sf("sf0.001"))
    val touched = inc.select("symbol_id").distinct().as[Long].collect().toSet
    assert(touched.nonEmpty, "incremental run should cover some stale symbols")
    assert(touched.subsetOf(stale), s"non-stale symbols touched: ${(touched -- stale).take(5)}")
    // the gate reaches the scan: the events read is semi-joined before any
    // feature work, so no full-universe bar build appears upstream
    val full = graft.features.Bars.daily(graft.Tables.events(spark, sf("sf0.001")))
      .select("symbol_id").distinct().as[Long].collect().toSet
    assert((full -- stale).nonEmpty, "fixture must contain fresh symbols for the gate to matter")
    assert((full -- stale).forall(!touched.contains(_)))
  }

  test("watermark store: a committed update is visible to a fresh read (second session)") {
    val root = java.nio.file.Files.createTempDirectory("graft-wm-spec").toString
    val wm = Watermarks.watermarkTable(spark, sf("sf0.001"))
    val v1 = Watermarks.writeState(wm, root)
    assert(v1 == 1L && Watermarks.latestVersion(spark, root).contains(1L))
    // run the cycle against the STORE, not the in-memory frame — exactly
    // what a restarted pipeline does
    val state1 = Watermarks.readState(spark, root)
    val stale = Watermarks.staleSymbols(state1)
    val nStale = stale.count()
    assert(nStale > 0)
    val v2 = Watermarks.writeState(
      Watermarks.updateWatermarks(state1, stale.select("symbol_id"), success = true), root)
    assert(v2 == 2L)
    // nothing session-cached: the re-read plans from the committed parquet
    val reread = Watermarks.readState(spark, root)
    assert(Watermarks.staleSymbols(reread).count() == 0,
      "update lost in the write -> read roundtrip")
    assert(reread.count() == wm.count(), "row per symbol preserved")
    // the previous version is still on disk (crash-restart safety)...
    assert(spark.read.parquet(s"$root/v=1").count() == wm.count())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("watermark store ignores an uncommitted (crashed) version directory") {
    val root = java.nio.file.Files.createTempDirectory("graft-wm-spec-crash").toString
    val wm = Watermarks.watermarkTable(spark, sf("sf0.001")).limit(7)
    Watermarks.writeState(wm, root)
    // simulate a crash mid-write of v=2: directory + a stray part file,
    // but no _SUCCESS commit marker
    val dead = java.nio.file.Paths.get(root, "v=2")
    java.nio.file.Files.createDirectories(dead)
    java.nio.file.Files.writeString(dead.resolve("part-00000.parquet"), "garbage")
    assert(Watermarks.latestVersion(spark, root).contains(1L),
      "uncommitted v=2 must not be visible")
    assert(Watermarks.readState(spark, root).count() == 7)
    // the next successful commit claims v=2 (overwrite) and becomes latest
    val v = Watermarks.writeState(wm, root)
    assert(v == 2L && Watermarks.latestVersion(spark, root).contains(2L))
    assert(Watermarks.readState(spark, root).count() == 7)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("watermark store vacuums versions past the retention window") {
    val root = java.nio.file.Files.createTempDirectory("graft-wm-spec-vac").toString
    val wm = Watermarks.watermarkTable(spark, sf("sf0.001")).limit(10)
    (1 to 5).foreach(_ => Watermarks.writeState(wm, root, retain = 3))
    val left = new java.io.File(root).listFiles().map(_.getName).filter(_.startsWith("v=")).sorted
    assert(left.toSeq == Seq("v=3", "v=4", "v=5"), left.mkString(","))
    // latest still reads fine after the vacuum
    assert(Watermarks.readState(spark, root).count() == 10)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("failed runs increment failures and disable after 3 strikes") {
    val wm = Watermarks.watermarkTable(spark, sf("sf0.001"))
    val some = Watermarks.staleSymbols(wm).limit(5).select("symbol_id")
    val after = Watermarks.updateWatermarks(
      wm.withColumn("consecutive_failures", lit(2)), some, success = false)
    val hit = after.join(some, "symbol_id")
    assert(hit.where(col("consecutive_failures") === 3).count() == 5)
    assert(hit.where(!col("transformation_eligible")).count() == 5)
  }

  test("universe upsert keeps the latest version per symbol") {
    val u = SymbolUniverse.universe(spark, sf("sf0.001"))
    assert(u.groupBy("symbol_id").count().where(col("count") > 1).count() == 0)
    val v2 = u.where(col("version") === 2).count()
    val expected = SymbolUniverse.base(spark, sf("sf0.001"))
      .where(col("symbol_id") % 3 === 0).count()
    assert(v2 == expected)
  }

  test("orchestrator plans dependencies before dependents and rejects cycles") {
    val order = Orchestrator.plan(Orchestrator.dailyPipeline).map(_.name)
    assert(order.indexOf("bars") < order.indexOf("features"))
    assert(order.indexOf("features") < order.indexOf("signals"))
    val cyclic = Seq(
      Orchestrator.Step("x", Seq("y"), (_, _, _) => null),
      Orchestrator.Step("y", Seq("x"), (_, _, _) => null))
    intercept[IllegalArgumentException](Orchestrator.plan(cyclic))
  }

  test("daily pipeline runs end-to-end on sf0.001") {
    val results = Orchestrator.run(spark, sf("sf0.001"), Orchestrator.dailyPipeline)
    assert(results("signals").count() > 0)
    assert(results("fundamentals").count() > 0)
  }
}
