package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression for the IVF coarse-quantizer assignment:
  * argmin over `cents` of the squared euclidean distance to the input
  * vector, first minimum wins (deterministic under ties). Replaces the
  * per-row Scala UDF that boxed every embedding into a `Seq[Double]` —
  * this is the k·d inner loop that runs over EVERY corpus vector in
  * `ann_ivf` / `dedup_semantic`, so it stays inside whole-stage codegen
  * like its sibling [[DotProduct]]: a tight primitive loop over the
  * ArrayData buffer and a plan-referenced `double[][]`, no boxing, no
  * per-row allocation.
  *
  * Arithmetic contract (shared with the interpreted fallback, the former
  * UDF, and the DuckDB oracle's sequential list replay): ascending-
  * dimension accumulation of (x_i − c_i)², strict `<` comparison so the
  * lowest cell index wins ties.
  *
  * The centroid matrix rides the plan as a reference object — task
  * binaries are torrent-broadcast once per stage, so shipping cost matches
  * the old explicit broadcast while the inner loop loses the
  * deserialize/box round-trip.
  */
case class NearestCell(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  // callers guarantee array<double> input (IvfIndex casts at the scan)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_cell"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val ce = cents(c)
      var d2 = 0.0
      var i = 0
      while (i < ce.length) { val df = x.getDouble(i) - ce(i); d2 += df * df; i += 1 }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cm = ctx.addReferenceObj("cents", cents, "double[][]")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val ce = ctx.freshName("ce")
      val d2 = ctx.freshName("d2")
      val df = ctx.freshName("df")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $best = 0;
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cm.length; $c++) {
         |  double[] $ce = $cm[$c];
         |  double $d2 = 0.0;
         |  for (int $i = 0; $i < $ce.length; $i++) {
         |    double $df = $a.getDouble($i) - $ce[$i];
         |    $d2 += $df * $df;
         |  }
         |  if ($d2 < $bestD) { $bestD = $d2; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCell {

  /** Registration key = MD5 of the centroid matrix content. Re-registering
    * the SAME matrix (every re-run of a registered ANN query against the
    * memoized fit — the common case in a long-lived session or a bench
    * loop) reuses one registry entry instead of minting a fresh name per
    * call, so the function registry stays bounded by the number of DISTINCT
    * fitted matrices (a handful per session), not by query executions. A
    * content hash rather than identity: two fits of the same (data, seed)
    * produce equal matrices and legitimately share the entry; MD5 makes an
    * accidental collision between different matrices (which would silently
    * swap quantizers) cryptographically improbable. */
  private def contentKey(cents: Array[Array[Double]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(8)
    cents.foreach { row =>
      row.foreach { v =>
        buf.clear(); buf.putDouble(v); md.update(buf.array())
      }
    }
    md.digest().map("%02x".format(_)).mkString
  }

  private val transientCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Column API. Registers a temp function binding THIS centroid matrix
    * (the registry path avoids private Column ctors, same as
    * [[GraftFunctions.dot]]), keyed by CONTENT so repeated calls with the
    * same matrix share one entry — the registry stays bounded by the
    * number of distinct fitted matrices, never by query executions.
    * Content-keyed entries are NEVER dropped (a shared name one caller
    * could drop from under another's unanalyzed plan would be a race);
    * a handful of k·d arrays per session is the accepted residency.
    * Callers whose matrix is TRANSIENT (the distributed Lloyd's
    * iterations — a different interim matrix every pass) use
    * [[nearestNamed]] + [[drop]] instead. */
  def nearest(spark: SparkSession, emb: Column, cents: Array[Array[Double]]): Column = {
    val name = s"graft_nearest_cell_${contentKey(cents)}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => NearestCell(exprs.head, cents), "built-in")
    org.apache.spark.sql.functions.call_function(name, emb)
  }

  /** Uniquely-named registration for eager consumers that [[drop]] the
    * entry (and its captured centroids) after their plan executes. The
    * per-call unique suffix makes drop race-free under concurrent
    * identical fits — two callers can never share (and so never yank) one
    * another's registration, which a pure content key would allow. */
  def nearestNamed(spark: SparkSession, emb: Column,
                   cents: Array[Array[Double]]): (String, Column) = {
    val name = s"graft_nearest_cell_${contentKey(cents)}_t${transientCounter.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => NearestCell(exprs.head, cents), "built-in")
    (name, org.apache.spark.sql.functions.call_function(name, emb))
  }

  /** Unregister a [[nearestNamed]] function once its plan has executed. */
  def drop(spark: SparkSession, name: String): Unit =
    spark.sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name))
}
