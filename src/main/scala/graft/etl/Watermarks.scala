package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental-transformation watermark management
  * (transformation_watermark_manager.py:198-325): a watermark row per symbol
  * tracks last successful run, failure count and eligibility; stale-symbol
  * detection is a join-based filter (never a driver loop), and successful
  * runs update the watermark via a keyed merge.
  *
  * At 100 TB the watermark table is tiny relative to the data (one row per
  * symbol × transformation group) — it broadcasts, so incremental runs touch
  * only stale partitions of the big table.
  *
  * Testdata mapping (SURVEY.md §1.1): watermark state is synthesized
  * deterministically from `customer`, last_date_processed from `orders`.
  */
object Watermarks {
  val StalenessHours = 24

  /** Synthesized watermark table: symbol universe + run ages + failures. */
  def watermarkTable(spark: SparkSession, dir: String): DataFrame = {
    val lastDates = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(max(col("o_orderdate").cast("date")).as("last_date_processed"))
    Tables.customer(spark, dir)
      .select(
        col("c_custkey").as("symbol_id"),
        when(col("c_custkey") % 7 === 0, lit(null).cast("long"))
          .otherwise(col("c_custkey") % 240).as("last_run_age_hours"),
        (col("c_custkey") % 5).cast("int").as("consecutive_failures"),
        (col("c_mktsegment") =!= "MACHINERY").as("transformation_eligible"),
        when(col("c_nationkey") % 10 === 9, "Delisted").otherwise("Active").as("status"))
      .join(lastDates, col("symbol_id") === col("o_custkey"), "left")
      .drop("o_custkey")
  }

  /** get_symbols_needing_transformation (ref :198-270): eligible, <3
    * consecutive failures, stale (never run or older than the staleness
    * window), active — or delisted with unprocessed tail. */
  def staleSymbols(wm: DataFrame, stalenessHours: Int = StalenessHours): DataFrame =
    wm.where(
        col("transformation_eligible") &&
        col("consecutive_failures") < 3 &&
        (col("last_run_age_hours").isNull || col("last_run_age_hours") >= stalenessHours) &&
        (col("status") === "Active" ||
          (col("status") === "Delisted" &&
            (col("last_date_processed").isNull || col("last_date_processed") < lit("2000-01-01").cast("date")))))
      .orderBy(col("last_run_age_hours").desc_nulls_first, col("symbol_id"))

  /** Durable watermark state — the persistence the reference gets from
    * UPDATEing its Postgres watermark table in place
    * (transformation_watermark_manager.py:272-325): without it an
    * incremental pipeline restarted tomorrow has no yesterday. Each
    * successful batch writes the FULL updated table as a new `v=N` parquet
    * version under the store root; readers open the highest committed
    * version. Versioning instead of in-place overwrite because (a) a lazy
    * plan may still be scanning the current version when the next run
    * commits (Spark cannot overwrite a path it reads), (b) a crashed write
    * leaves the previous version intact — restart resumes from the last
    * commit, and (c) the table is one row per symbol × transformation —
    * metadata-sized at any corpus scale, so rewriting it whole is cheaper
    * than merge machinery. Old versions beyond `retain` are vacuumed.
    * Returns the committed version number.
    *
    * Concurrency (round 13): the version flip is a check-and-fail CAS
    * ([[graft.sources.CommittedVersions.publishVersion]] — stage, then
    * atomic rename to `v=next`). The conflict rule: a writer commits the
    * version AFTER the head it read; if a rival committed that number
    * first, this writer's update was derived from a stale table and is
    * REJECTED with a loud ConcurrentCommitException — re-read the new
    * head, re-derive the update (updateWatermarks is a pure function of
    * the state), retry. The reference got this for free from Postgres
    * UPDATE transactionality (transformation_watermark_manager.py:272-325);
    * the file store states the same rule explicitly. A read-modify-write
    * cycle that derived `wm` from an EARLIER readState must pass that
    * version as `basedOn` so the CAS checks against the snapshot actually
    * read — the internal latest+1 default only guards simultaneous
    * writers, not a rival commit landing between the read and this write. */
  def writeState(wm: DataFrame, root: String, retain: Int = 8,
                 basedOn: Long = -1L): Long = {
    val spark = wm.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val next =
      (if (basedOn >= 0L) basedOn else latestVersion(spark, root).getOrElse(0L)) + 1L
    graft.sources.CommittedVersions.publishVersion(wm, root, next, "Watermarks.writeState")
    versions(spark, root).sorted.dropRight(retain).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/v=$v"), true)
    }
    graft.sources.CommittedVersions.vacuumStaging(spark, root)
    next
  }

  /** Committed versions only: a `v=N` directory counts when its `_SUCCESS`
    * marker exists (Spark's job committer writes it last), so a crashed
    * mid-write directory is invisible to [[latestVersion]]/[[readState]]
    * and a restart genuinely resumes from the previous commit — the
    * crash-safety half of the [[writeState]] contract. */
  private def versions(spark: SparkSession, root: String): Seq[Long] =
    graft.sources.CommittedVersions.list(spark, root)

  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).maxOption

  /** Transactional read-modify-write — the loop the CAS conflict rule
    * implies, packaged (the reference's `UPDATE ... WHERE` got this from
    * Postgres for free): read the head state AT a pinned version, apply
    * `f` (a pure function of the state, e.g. [[updateWatermarks]]),
    * commit based on that version; when a rival committed first, re-read
    * the NEW head and re-derive — never blind-retry stale bytes. Returns
    * the committed version. Bounded attempts keep a livelock loud. */
  def updateWithRetry(spark: SparkSession, root: String, attempts: Int = 8,
                      retain: Int = 8)
                     (f: DataFrame => DataFrame): Long = {
    var i = 0
    while (i < attempts) {
      val v = latestVersion(spark, root).getOrElse(
        sys.error(s"no committed watermark state under $root"))
      // materialize the snapshot EAGERLY (metadata-sized table): the
      // staged write otherwise re-reads v=$v lazily, and under sustained
      // contention rivals' vacuums can delete it mid-job — surfacing as a
      // FileNotFound the CCE-only retry below would not catch
      val cur = spark.read.parquet(s"$root/v=$v").transform(graft.sqlx.Lineage.truncate)
      try return writeState(f(cur), root, retain = retain, basedOn = v)
      catch { case _: graft.sources.ConcurrentCommitException => i += 1 }
    }
    throw new graft.sources.ConcurrentCommitException(
      s"Watermarks.updateWithRetry: lost the commit race $attempts times at $root")
  }

  /** Read the last committed watermark state — what a restarted pipeline
    * (or any second session) starts from. */
  def readState(spark: SparkSession, root: String): DataFrame = {
    val v = latestVersion(spark, root).getOrElse(
      sys.error(s"no committed watermark state under $root"))
    spark.read.parquet(s"$root/v=$v")
  }

  /** update_watermark (ref :272-325) for a batch of processed symbols:
    * success resets failures and freshens the run timestamp; failure
    * increments the counter and disables after 3 strikes. */
  def updateWatermarks(wm: DataFrame, processed: DataFrame, success: Boolean): DataFrame = {
    val p = processed.select(col("symbol_id").as("p_symbol_id"), lit(true).as("p_hit"))
    val joined = wm.join(broadcast(p), col("symbol_id") === col("p_symbol_id"), "left")
    val out =
      if (success)
        joined
          .withColumn("last_run_age_hours",
            when(col("p_hit"), lit(0L)).otherwise(col("last_run_age_hours")))
          .withColumn("consecutive_failures",
            when(col("p_hit"), lit(0)).otherwise(col("consecutive_failures")))
      else
        joined
          .withColumn("consecutive_failures",
            when(col("p_hit"), col("consecutive_failures") + 1).otherwise(col("consecutive_failures")))
          .withColumn("transformation_eligible",
            when(col("p_hit") && col("consecutive_failures") >= 3, lit(false))
              .otherwise(col("transformation_eligible")))
    out.drop("p_symbol_id", "p_hit")
  }
}
