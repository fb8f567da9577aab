package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Deterministic global corpus shuffle — the pre-training permutation every
  * training pipeline runs once over its final corpus: a pseudorandom but
  * fully reproducible total order (any shard, any engine, any partitioning
  * recomputes the same positions), plus a round-robin shard assignment for
  * the data-parallel readers.
  *
  * The permutation key is md5 of the salted document id, so the order is a
  * pure function of the data — no rand(), no sampling state (same design
  * rule as `corpus_split`). Positions are EXACT global row numbers without
  * a DATA-sized single-partition window: rows bucket by their md5 prefix
  * (256 hex buckets — lexicographic prefix order is consistent with
  * full-key order), per-bucket counts aggregate to a ≤256-row frame whose
  * exclusive cumsum (a window over those 256 METADATA rows, not the data)
  * gives each bucket's offset, and the final rank runs within buckets in
  * parallel plus the broadcast offset. Fully lazy — constructing the frame
  * runs no Spark job (unlike a driver-collected offset table); at 100 TB
  * the offset side stays 256 rows and the one data shuffle is the rank's
  * bucket repartition.
  */
object DeterministicShuffle {

  /** (id, position, shard) for every row of `docs`: `position` is the
    * 1-based rank in the md5-permuted total order, `shard` round-robins
    * positions across `nShards` training readers. */
  def permutation(docs: DataFrame, idCol: String, nShards: Int, salt: String = "shuffle"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val keyed = docs
      .select(col(idCol).as("id"))
      .withColumn("_key", md5(concat(col("id").cast("string"), lit(":" + salt))))
      .withColumn("_bucket", conv(substring(col("_key"), 1, 2), 16, 10).cast("int"))
    // ≤256-row bucket counts → exclusive prefix offsets; the window is over
    // the metadata-sized counts frame, never the data
    val cumw = W.orderBy("_bucket").rowsBetween(W.unboundedPreceding, -1)
    val offsetDf = keyed.groupBy("_bucket").agg(count(lit(1)).as("_c"))
      .select(col("_bucket"),
        coalesce(sum(col("_c")).over(cumw), lit(0L)).as("_offset"))
    // parallel within-bucket rank + broadcast offset
    val rn = row_number().over(W.partitionBy("_bucket").orderBy(col("_key"), col("id")))
    keyed.join(broadcast(offsetDf), "_bucket")
      .withColumn("position", col("_offset") + rn)
      .select(col("id").as(idCol),
        col("position"),
        ((col("position") - 1) % nShards).cast("int").as("shard"))
  }
}
