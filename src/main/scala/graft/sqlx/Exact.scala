package graft.sqlx

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine exact arithmetic helpers.
  *
  * The driver's correctness gate hashes our parquet output against DuckDB
  * running the oracle SQL, so double-typed results must match bit-for-bit
  * after ROUND(x, 4). Double summation order differs between engines
  * (DuckDB windows use segment trees; Spark group aggregation order is
  * partition-dependent), so every oracle-checked sum/avg is computed over
  * DECIMAL(25,10): the double→decimal cast is order-free and deterministic
  * in both engines, decimal addition is exact/associative, and the final
  * cast back to double is deterministic. All remaining scalar math is
  * written as the *same* IEEE op DAG on both sides.
  */
object Exact {
  /** Cast to the canonical exact-sum decimal type. */
  def dec(c: Column): Column = c.cast(DecimalType(25, 10))

  /** Exact windowed sum of a double column, returned as double. */
  def decSum(c: Column, w: WindowSpec): Column =
    sum(dec(c)).over(w).cast("double")

  /** Exact grouped sum of a double column, returned as double. */
  def decSumAgg(c: Column): Column = sum(dec(c)).cast("double")


  /** Final 4-dp rounding applied to every derived double the oracle checks.
    * `+ 0.0` canonicalizes IEEE −0.0 → +0.0 (Spark's round already does, but
    * DuckDB's ROUND keeps the sign bit, so both engines' oracle DAGs apply
    * the same normalization — see OracleSql.rd). */
  def r4(c: Column): Column = round(c, 4) + lit(0.0)

  /** Parameterized exact windowed sum: for quantized inputs (k-decimal
    * doubles) pick a scale ≥ the input scale so the double→decimal cast is
    * exact in both engines (full-mantissa doubles round differently at the
    * cast in DuckDB vs Spark — quantize first, then sum exactly). */
  def decSumP(c: Column, w: WindowSpec, precision: Int, scale: Int): Column =
    sum(c.cast(DecimalType(precision, scale))).over(w).cast("double")

  /** Render a double so the SQL literal parses back to the identical bits
    * (17 significant digits round-trips IEEE 754 doubles). The digits go
    * through a VARCHAR cast, never a bare numeric literal: DuckDB types a
    * bare 17-digit literal as DECIMAL, and its DECIMAL→DOUBLE conversion is
    * double-rounded — β constants came back 1 ULP off Spark's, which made
    * the recursive EMA/MACD chains drift and flip ROUND(x,4) ties at
    * larger SFs. CAST('…' AS DOUBLE) is strtod: correctly rounded, bit
    * identical to the JVM parse. (Same hazard §6 documents for decimal
    * sums, same VARCHAR-route fix.) */
  def lit17(d: Double): String = {
    val s = "%.17g".format(d)
    val digits = if (java.lang.Double.parseDouble(s) == d) s else d.toString
    s"CAST('$digits' AS DOUBLE)"
  }
}
