package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join with NO join operator: union both sides, then one
  * key-partitioned window pass ordered by (time, side) carries the most
  * recent right-side payload forward into each left row
  * (`last(_, ignoreNulls)` over an unbounded-preceding running frame).
  *
  * This is the scale shape for as-of semantics when BOTH sides are large:
  * a broadcast range join (graft.backtest.Enrich.joinFundamentals) needs a
  * small right side, and a shuffled range join explodes on the range
  * predicate; the union form costs exactly one shuffle + one sort of
  * |left| + |right| rows — the same bill as any keyed aggregation — and
  * never materializes a (left × candidate) intermediate.
  *
  * Semantics: for each left row, the latest right row of the same key with
  * `rightTime <= leftTime` (a right row is visible at its own timestamp).
  * `toleranceDays` optionally voids matches older than the window —
  * payloads null out, the left row survives (left-join semantics).
  * Right rows should be unique per (keys, rightTime); with duplicates the
  * carried payload is the last in union order, which is not deterministic.
  *
  * Reference behavior: join_fundamentals_to_trades.py:49-185 (publication-
  * lag as-of with a validity window) — proven equivalent to the
  * broadcast-range-join implementation in AsOfJoinSpec.
  */
object AsOfJoin {

  /** @param payload right-side columns to carry into left rows (may include
    *                the right time column itself).
    * @param toleranceDays if set, a match only counts while
    *                      `datediff(leftTime, matchedRightTime) < toleranceDays`. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String, payload: Seq[String],
               toleranceDays: Option[Int] = None): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftOther = left.columns.filterNot(c => keys.contains(c) || c == leftTime).toSeq
    val rightSchema = right.select(payload.map(col): _*).schema
    val leftSchema = left.select(leftOther.map(col): _*).schema

    // identical shape on both sides: keys, event time, side tag, left
    // columns (null on right rows), payload columns (null on left rows)
    val pPay = payload.map(c => s"_asof_$c")
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_asof_t"), lit(1).as("_asof_side")) ++
        leftOther.map(col) ++
        pPay.zip(rightSchema.fields).map { case (a, f) =>
          lit(null).cast(f.dataType).as(a) }: _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("_asof_t"), lit(0).as("_asof_side")) ++
        leftSchema.fields.map(f => lit(null).cast(f.dataType).as(f.name)) ++
        payload.zip(pPay).map { case (c, a) => col(c).as(a) }: _*)

    // right rows sort before left rows at the same timestamp: a right row
    // is visible to left rows of its own instant (rightTime <= leftTime)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_t").asc, col("_asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedT = last(col(s"_asof_$rightTime"), ignoreNulls = true).over(w)
    def carried(a: String): Column = {
      val v = last(col(a), ignoreNulls = true).over(w)
      toleranceDays match {
        case Some(days) => when(datediff(col("_asof_t"), matchedT) < days, v)
        case None => v
      }
    }
    l.unionByName(r)
      .select(
        keys.map(col) ++
          Seq(col("_asof_t"), col("_asof_side")) ++
          leftOther.map(col) ++
          payload.zip(pPay).map { case (c, a) => carried(a).as(c) }: _*)
      .where(col("_asof_side") === 1)
      .drop("_asof_side")
      .withColumnRenamed("_asof_t", leftTime)
  }
}
