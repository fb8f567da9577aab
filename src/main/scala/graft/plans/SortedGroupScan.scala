package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Distributed per-key ordered scan: `repartition(key)` →
  * `sortWithinPartitions(key, order)` → streaming `mapPartitions` that resets
  * scanner state on key change.
  *
  * This is the Spark-native replacement for the reference's one-symbol-at-a-
  * time Python loop (transform_time_series_daily_adjusted.py:725-791): one
  * shuffle for the whole table, every group processed in a single linear pass
  * with O(1) state, no per-group materialization. The same cost shape as a
  * shuffle-based aggregation, so it scales to arbitrarily many keys and long
  * histories (state per key does not grow with history length).
  *
  * Used for the recursive indicator family (EMA/RSI/MACD/ATR — recurrences
  * SQL window frames can't express) and the backtest trade state machine.
  */
object SortedGroupScan {

  /** Per-group streaming state machine. */
  trait Scanner[S] extends Serializable {
    def init: S
    /** Process one row in group order; return new state + rows to emit. */
    def onRow(s: S, r: Row): (S, Iterator[Row])
    /** Emit trailing rows when the group ends (e.g. close open positions). */
    def onGroupEnd(s: S): Iterator[Row] = Iterator.empty
  }

  def apply[S](
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      outSchema: StructType,
      scanner: Scanner[S]): DataFrame = {
    val spark = df.sparkSession
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val sorted = df
      .repartition(shufflePartitions, keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col) ++ orderCols: _*)
    sorted.mapPartitions { rows =>
      new Iterator[Row] {
        private var state: S = scanner.init
        private var currentKey: Seq[Any] = null
        private var pending: Iterator[Row] = Iterator.empty
        private val in = rows.buffered

        private def keyOf(r: Row): Seq[Any] = keyIdx.map(r.get)

        override def hasNext: Boolean = {
          while (!pending.hasNext && (in.hasNext || currentKey != null)) {
            if (in.hasNext) {
              val k = keyOf(in.head)
              if (currentKey == null) { currentKey = k; state = scanner.init }
              if (k == currentKey) {
                val (s2, out) = scanner.onRow(state, in.next())
                state = s2
                pending = out
              } else {
                pending = scanner.onGroupEnd(state)
                currentKey = null
              }
            } else {
              pending = scanner.onGroupEnd(state)
              currentKey = null
            }
          }
          pending.hasNext
        }
        override def next(): Row = { if (!hasNext) throw new NoSuchElementException; pending.next() }
      }
    }(Encoders.row(outSchema))
  }
}
