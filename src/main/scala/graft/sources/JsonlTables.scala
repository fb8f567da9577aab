package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines sink/source — the interchange format pre-training corpora
  * actually ship in (one JSON object per line, directory-sharded). Spark's
  * json writer IS line-delimited JSON, so a `partitionBy(shard)` write
  * produces the standard `shard=K/part-*.json` corpus layout and each
  * shard stays independently readable/splittable at 100 TB.
  *
  * Reads take an EXPLICIT schema for the same reason as [[CsvTables]]:
  * inference re-scans the data and can mistype all-null columns. Strings
  * round-trip losslessly through JSON escaping; integral types are exact —
  * the registered `corpus_jsonl_roundtrip` query hash-checks the read-back
  * against the source table. */
object JsonlTables {

  def write(df: DataFrame, path: String, shardCol: String): Unit =
    df.write.mode("overwrite").partitionBy(shardCol).json(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
