package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sqlx.Exact

/** Incremental materialized-view maintenance for algebraic aggregates —
  * the operator that turns a 100 TB nightly "recompute the rollup" into an
  * increment-sized job. The view is stored as PARTIAL aggregate state
  * (count / exact decimal sum / min / max per group), not final values:
  * partial states form a commutative monoid (counts add, DECIMAL(25,10)
  * sums add exactly, min/max combine), so refreshing with a new batch is
  * `merge(state, partials(increment))` — identical, bit-for-bit, to
  * recomputing over base ∪ increment, which is what makes the registered
  * query oracle-checkable by a plain GROUP BY over the whole table.
  * Derived values that are NOT algebraic (avg) finalize at read time from
  * the state (sum/count), the standard MV trick.
  *
  * Scale layout: state is hash-bucketed on the group keys and written
  * `partitionBy(bucket)`. An increment only touches the buckets its groups
  * hash into, so a refresh reads ONLY those bucket directories (partition
  * pruning on a literal IN-list), merges increment-sized data, and swaps
  * just those directories — untouched buckets are never read, never
  * shuffled, never rewritten. Refresh cost is O(increment + touched-bucket
  * state), independent of view size. The swap is write-to-staging then
  * per-bucket directory rename (a lazy reader of the OLD generation is
  * unaffected mid-scan; a crash between renames leaves each bucket either
  * old or new and the staging dir for replay — a production deployment
  * puts the bucket→generation map behind a manifest pointer like the
  * [[Watermarks.writeState]] versioning to make the flip atomic).
  */
object MaterializedAgg {

  val NBuckets = 16

  /** Pinned on-disk type for the exact running sum. Spark widens decimal
    * precision on every sum() (25,10 → 35,10 → 38,10), so WITHOUT the pin
    * a refresh writes its touched buckets at a wider precision than the
    * init generation and the mixed-generation store stops being readable
    * (parquet decimal physical types differ by precision). 28 integer
    * digits of headroom; a value domain that could overflow it needs a
    * two-level sum split, not a wider decimal. */
  private val SumType = org.apache.spark.sql.types.DecimalType(38, 10)

  private def bucketCol(keys: Seq[String]): org.apache.spark.sql.Column =
    pmod(hash(keys.map(col): _*), lit(NBuckets))

  /** Partial aggregate state of `df` per `keys`: (n_rows, n_vals,
    * sum_dec DECIMAL(25,10), vmin, vmax) + the key-hash bucket. */
  def partials(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        count(col(valueCol)).as("n_vals"),
        sum(Exact.dec(col(valueCol))).cast(SumType).as("sum_dec"),
        min(col(valueCol)).as("vmin"),
        max(col(valueCol)).as("vmax"))
      .withColumn("bucket", bucketCol(keys))

  /** Combine two partial-state frames for the same keys (the monoid op). */
  private def combine(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_vals")).as("n_vals"),
        sum(col("sum_dec")).cast(SumType).as("sum_dec"),
        min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"))

  /** Initialize the view store from a base frame. */
  def writeInit(base: DataFrame, keys: Seq[String], valueCol: String, root: String): Unit =
    partials(base, keys, valueCol)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(root)

  /** Incremental refresh: fold `increment`'s partials into the store,
    * touching only the bucket partitions the increment's groups hash to.
    * Returns the touched bucket ids (sorted). */
  def refresh(spark: SparkSession, root: String, increment: DataFrame,
              keys: Seq[String], valueCol: String): Seq[Int] = {
    val inc = partials(increment, keys, valueCol)
    // metadata-sized: at most NBuckets values
    val touched = inc.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return touched
    val state = spark.read.parquet(root)
      .where(col("bucket").isin(touched: _*))
    val staging = s"$root-staging"
    combine(state, inc, keys)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(staging)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    touched.foreach { b =>
      val dst = new org.apache.hadoop.fs.Path(s"$root/bucket=$b")
      fs.delete(dst, true)
      fs.rename(new org.apache.hadoop.fs.Path(s"$staging/bucket=$b"), dst)
    }
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    touched
  }

  /** [[refresh]] with exactly-once semantics under micro-batch REPLAY —
    * what `foreachBatch` needs: Structured Streaming re-delivers the last
    * batch after a crash, and partial-state merges are NOT idempotent (a
    * replayed increment double-counts). Batch ids from one stream are
    * monotonically increasing and only the LAST batch is ever replayed,
    * so ONE high-water-mark file (the max applied id) suffices — bounded
    * metadata however long the stream runs, unlike a marker per batch
    * (single-writer assumption: one stream owns a store). The mark is
    * written AFTER the bucket swap, so the remaining failure window is a
    * crash between swap and mark — replaying THAT still double-counts;
    * closing it fully needs swap and mark in one atomic commit (the
    * manifest-pointer flip the [[refresh]] scaladoc describes). The mark
    * lives inside the store root, so [[writeInit]]'s overwrite resets the
    * applied watermark with the state. */
  def refreshOnce(spark: SparkSession, root: String, batchId: Long, increment: DataFrame,
                  keys: Seq[String], valueCol: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val mark = new org.apache.hadoop.fs.Path(s"$root/_applied_watermark")
    val applied: Long =
      if (!fs.exists(mark)) -1L
      else {
        val in = fs.open(mark)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
        finally in.close()
      }
    if (batchId <= applied) false
    else {
      refresh(spark, root, increment, keys, valueCol)
      val out = fs.create(mark, true)
      try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
      true
    }
  }

  /** Finalized view: algebraic columns straight from state, avg derived as
    * exact-decimal sum / value count (the graft.sqlx.Exact double route,
    * so the read is bit-identical to a full recompute in any engine). */
  def read(spark: SparkSession, root: String, keys: Seq[String]): DataFrame =
    spark.read.parquet(root)
      .select(
        (keys.map(col) :+
          col("n_rows") :+
          col("sum_dec").cast("double").as("value_sum") :+
          when(col("n_vals") > 0, Exact.r4(col("sum_dec").cast("double") / col("n_vals")))
            .as("value_avg") :+
          col("vmin").as("value_min") :+
          col("vmax").as("value_max")): _*)
}
