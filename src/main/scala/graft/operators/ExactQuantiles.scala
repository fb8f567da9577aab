package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles with numpy-default linear interpolation —
  * the generic form of the machinery QualityScores proved for the fcf
  * bounds (fundamentals/QualityScores.scala), promoted to an operator so
  * curriculum tiering (and any future consumer) shares one
  * implementation instead of re-deriving the global-rank trick.
  *
  * Exact AND distributed: range-partition the value column, rank within
  * each partition (parallel windows), convert local to global ranks by
  * adding per-partition count offsets — the only serial step is
  * collecting ≤ numShufflePartitions (pid, count) rows of metadata, the
  * same driver traffic Spark's own RangePartitioner incurs. No
  * single-partition sort ever touches the data. The interpolation is
  * numpy's default: pos = q·(n−1), x_lo + (x_hi − x_lo)·frac — identical
  * IEEE ops to the DuckDB oracle's franked-window replay, so bounds are
  * bit-comparable across engines. */
object ExactQuantiles {

  /** Interpolated quantile values of `vals`' non-null `v` column at each
    * q ∈ `qs`. Returns None per q when the column is empty. ONE pass:
    * all requested quantiles resolve from a single ranked frame. */
  def interpolated(vals: DataFrame, qs: Seq[Double]): Seq[Option[Double]] = {
    require(qs.nonEmpty, "ExactQuantiles.interpolated: empty quantile request")
    require(qs.forall(q => q >= 0.0 && q <= 1.0),
      s"ExactQuantiles.interpolated: quantiles must be in [0,1], got $qs")
    val spark = vals.sparkSession
    import spark.implicits._
    val v = vals.select(col("v")).where(col("v").isNotNull)
    val nParts = spark.sessionState.conf.numShufflePartitions
    // persist the range-partitioned column: the counts job and the rank
    // job MUST see the same partitioning (RangePartitioner samples
    // boundaries with an RDD-id-dependent seed, so re-executing the
    // exchange could shift rows across pids and corrupt global ranks)
    val parts = v.repartitionByRange(nParts, col("v"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sizes = parts.groupBy("pid").agg(count(lit(1)).as("cnt"))
        .as[(Int, Long)].collect().sortBy(_._1)
      val total = sizes.map(_._2).sum
      if (total == 0) return qs.map(_ => None)
      val offsets = sizes.map(_._1).zip(sizes.scanLeft(0L)(_ + _._2)).toSeq
      val ranked = parts.join(broadcast(offsets.toDF("pid", "offset")), "pid")
        .withColumn("rn",
          row_number().over(Window.partitionBy("pid").orderBy("v")) + col("offset"))
        .withColumn("n", lit(total))
      def bound(q: Double): Column = {
        val pos = lit(q) * (col("n") - lit(1)).cast("double")
        val lo = floor(pos) + 1
        val frac = pos - floor(pos)
        val xlo = max(when(col("rn") === lo, col("v")))
        val xhi = max(when(col("rn") === lo + 1, col("v")))
        val fr = max(when(col("rn") === lo, frac))
        xlo + (coalesce(xhi, xlo) - xlo) * fr
      }
      val row = ranked.agg(bound(qs.head).as("q0"),
        qs.tail.zipWithIndex.map { case (q, i) => bound(q).as(s"q${i + 1}") }: _*).head()
      qs.indices.map(i => if (row.isNullAt(i)) None else Some(row.getDouble(i)))
    } finally { parts.unpersist(); () }
  }
}
