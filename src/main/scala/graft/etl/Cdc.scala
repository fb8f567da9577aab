package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application — the general form of the reference's
  * upsert pattern (extract_listing_status.py's symbol-universe merge keeps
  * the latest version per key; CDC adds explicit ops, DELETE semantics and
  * multi-version sequencing, which is what a warehouse ingesting a
  * transactional changelog actually receives).
  *
  * Both operators are ONE key-partitioned window over the changelog — no
  * join against the snapshot at all, because a full changelog subsumes it;
  * with an incremental changelog + prior snapshot, union the snapshot as
  * version-0 upserts first (exactly [[SymbolUniverse]]'s shape). At 100 TB
  * the shuffle is by key only and a bucketed snapshot layout
  * ([[graft.sources.BucketedTables]]) makes the periodic re-materialization
  * shuffle-free on the snapshot side.
  */
object Cdc {

  /** Latest-wins snapshot: per key, the highest-version change decides —
    * an upsert's payload survives, a DELETE kills the key (unless a later
    * version re-upserts it; last writer wins, ties impossible because
    * (key, version) is unique in a well-formed changelog). */
  def applyChanges(changes: DataFrame, keyCols: Seq[String],
                   versionCol: String, opCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).desc)
    changes.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col(opCol) =!= "D")
      .drop("rn")
  }

  /** SCD Type-2 history: every upsert becomes an attribute interval
    * [version, next change's version) — a DELETE closes the last interval
    * without opening one. `valid_to IS NULL` marks the current row. */
  def scd2(changes: DataFrame, keyCols: Seq[String],
           versionCol: String, opCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    changes.withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .where(col(opCol) =!= "D")
      .withColumnRenamed(versionCol, "valid_from")
      .withColumn("is_current", col("valid_to").isNull)
  }
}
