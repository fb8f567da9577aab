package graft.sqlx

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation hooks (SURVEY §5.7). The testdata keys are synthetic-
  * uniform, so no registered query needs these — but at 100 TB a handful of
  * hot keys (a viral symbol's event burst, a boilerplate shingle) can pin a
  * single reducer. The standard fix is two-phase salted aggregation: spread
  * each key over `salts` cells for the wide partial pass, then merge the
  * tiny per-key cell set. Only algebraic aggregates compose this way —
  * sum/count/min/max here; sums go through the exact decimal type so the
  * two-phase result is bit-identical to the direct aggregation.
  */
object Skew {

  /** groupBy(keys).agg(count, exact sum(valueCol)) computed skew-safely.
    * The salt is a deterministic hash of the whole row — no rand(), so
    * retried tasks and resumed jobs reproduce the same partials. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__pcnt"), sum(Exact.dec(col(valueCol))).as("__psum"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__pcnt")).as("n"),
        sum(col("__psum")).cast("double").as(s"${valueCol}_sum"))
  }
}
