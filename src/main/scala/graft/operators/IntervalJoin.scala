package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Non-equi point-in-interval join WITHOUT a nested-loop: bin both sides to
  * a fixed-width date grid and equi-join on the bin, then re-check the real
  * predicate.
  *
  * A raw `p JOIN i ON p.t >= i.start AND p.t < i.end` has no equi key, so
  * Spark plans BroadcastNestedLoopJoin (fine only when one side is tiny) or
  * a cartesian. Binned, each interval is exploded to its covered grid cells
  * (`sequence(floor(start/w), floor((end-1)/w))` — fan-out is bounded by
  * interval_length/binWidth + 1) and each point maps to exactly one cell;
  * the join becomes a hash equi-join on the cell id with the range
  * predicate as a residual filter. Equi keys (e.g. a symbol id) compose by
  * joining on (keys :+ bin).
  *
  * Pick binWidth near the typical interval length: wider bins mean fewer
  * duplicate interval rows but more false candidates for the residual
  * filter; narrower the reverse. The output is exact either way — binning
  * only shapes the candidate set, never the answer.
  */
object IntervalJoin {

  /** Inner-join points to the intervals containing them.
    * @param pointCol  date column on `points`
    * @param startCol  inclusive interval start date on `intervals`
    * @param endCol    exclusive interval end date on `intervals`
    * @param keys      optional extra equi-join keys present on both sides
    * @param binDays   grid width in days */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      keys: Seq[String] = Nil, binDays: Int = 30): DataFrame = {
    def cell(c: Column): Column = floor(unix_date(c) / binDays)
    val binned = intervals.withColumn("_ij_bin",
      explode(sequence(cell(col(startCol)), cell(col(endCol) - lit(1)))))
    val p = points.withColumn("_ij_bin", cell(col(pointCol)))
    p.join(binned, keys :+ "_ij_bin")
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_ij_bin")
  }
}
