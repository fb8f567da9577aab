package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Directory-partitioned parquet sink/source — the standard 100 TB layout
  * for time-series fact tables (the reference's raw.time_series_daily table
  * re-expressed as storage): writing `partitionBy(date)` lays each day out
  * as its own directory, so any reader filtering on the partition column
  * prunes whole days at planning time and an incremental job (the
  * watermark-gated daily run) reads ONLY the stale days' files, never the
  * historical bulk. Complements [[BucketedTables]]: bucketing co-locates
  * join keys within files, partitioning prunes directories by predicate.
  */
object PartitionedTables {

  def write(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "partitionBy needs at least one column")
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** Read back with partition-column type inference (directory values
    * become typed partition columns; filters on them prune at planning). */
  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
