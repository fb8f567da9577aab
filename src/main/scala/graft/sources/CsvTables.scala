package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV sink/source — the reference's inter-stage handoff format
  * (backtesting/filter_trades_by_prediction.py writes
  * trades_filtered_80pct.csv; visualize_signals.py:152-185 reads it back).
  * Reads take an EXPLICIT schema (columns bound by position, header
  * skipped): schema inference would re-scan the data and can mistype
  * all-null columns, neither acceptable at scale.
  *
  * Round-trip fidelity: doubles print as shortest-round-trip strings (so
  * parse back bit-identical), dates as ISO — TradesCsvSpec and the
  * registered roundtrip query's oracle hash-check this end to end. */
object CsvTables {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)
}
