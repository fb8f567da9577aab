package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve values for multi-dimensional data layout — the
  * technique behind OPTIMIZE ZORDER-style clustering: interleaving the bits
  * of two scan dimensions makes rows close in BOTH dimensions close on the
  * curve, so range-partitioning files by z-value gives every file a tight
  * (dim1, dim2) bounding box and a box-shaped predicate prunes most files
  * from their min/max footer stats. Sorting by (user, day) instead clusters
  * only the leading dimension; a day-range query then touches every file.
  *
  * The value is pure bit arithmetic (shift/mask/add), identical in every
  * engine — the registered query is oracle-checked exactly — and the
  * ordering is data-independent metadata, so the layout write is one
  * repartitionByRange, no sampling state beyond Spark's range partitioner.
  *
  * Layout caveat ZOrderSpec demonstrates: scale every dimension to the
  * SAME bit budget before interleaving (cf. Delta's range-partitioned
  * rank). Interleaving a wide dim with a narrow one raw puts all the
  * varying high bits on the wide dim — the "curve" degenerates to a
  * single-dimension sort and the narrow dim's queries stop pruning.
  */
object ZOrder {

  /** Z-value interleaving the low `bits` bits of two non-negative integer
    * columns (`a` gets the odd bit positions, `b` the even). */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)
  }

  /** The same arithmetic as ANSI SQL over integer columns `a`, `b` — the
    * oracle mirror, kept next to the implementation so the two bit DAGs
    * cannot drift. */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((CAST($a AS BIGINT) >> $i) & 1) * ${1L << (2 * i + 1)} + " +
        s"((CAST($b AS BIGINT) >> $i) & 1) * ${1L << (2 * i)}"
    }.mkString(" + ")
}
