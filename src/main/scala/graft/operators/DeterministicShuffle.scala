package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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
  * a single-partition window: rows bucket by their md5 prefix (256 hex
  * buckets — lexicographic prefix order is consistent with full-key order),
  * pass 1 collects per-bucket counts (metadata: ≤256 longs) into prefix
  * offsets, pass 2 ranks within buckets in parallel and adds the broadcast
  * offset. Same two-pass construction as [[Packing]]'s global cumsum; at
  * 100 TB the only driver traffic is the 256-entry offset table, and the
  * one shuffle is the rank's bucket repartition.
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
    // pass 1: bucket counts → exclusive prefix offsets (metadata-sized)
    val counts = keyed.groupBy("_bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val spark = docs.sparkSession
    val offsetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq.map(Row.fromTuple), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_bucket", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("_offset", org.apache.spark.sql.types.LongType))))
    // pass 2: parallel within-bucket rank + broadcast offset
    val rn = row_number().over(W.partitionBy("_bucket").orderBy(col("_key"), col("id")))
    keyed.join(broadcast(offsetDf), "_bucket")
      .withColumn("position", col("_offset") + rn)
      .select(col("id").as(idCol),
        col("position"),
        ((col("position") - 1) % nShards).cast("int").as("shard"))
  }
}
