package graft.operators

import graft.SparkSpec

/** The distributed exact-quantile operator vs a single-node numpy-default
  * reference: arbitrary q on seeded data, interpolation on non-integer
  * positions, degenerate inputs. */
class ExactQuantilesSpec extends SparkSpec {
  import spark.implicits._

  /** numpy-default (linear) quantile of a sorted array. */
  private def ref(sorted: Array[Double], q: Double): Double = {
    val pos = q * (sorted.length - 1)
    val lo = pos.toInt
    val frac = pos - lo
    if (lo + 1 < sorted.length) sorted(lo) + (sorted(lo + 1) - sorted(lo)) * frac
    else sorted(lo)
  }

  test("matches the single-node reference bit-for-bit on seeded data") {
    val rnd = new scala.util.Random(20260815L)
    val xs = Array.fill(10007)(rnd.nextDouble() * 2000 - 1000)
    val df = xs.toSeq.toDF("v")
    val qs = Seq(0.0, 0.2, 0.25, 0.5, 0.8, 0.999, 1.0)
    val got = ExactQuantiles.interpolated(df, qs)
    val sorted = xs.sorted
    qs.zip(got).foreach { case (q, g) =>
      assert(g.contains(ref(sorted, q)), s"q=$q: got $g want ${ref(sorted, q)}")
    }
  }

  test("nulls are excluded; empty input yields None") {
    val df = Seq[Option[Double]](Some(1.0), None, Some(3.0), None).toDF("v")
    assert(ExactQuantiles.interpolated(df, Seq(0.5)) == Seq(Some(2.0)))
    val empty = Seq.empty[Double].toDF("v")
    assert(ExactQuantiles.interpolated(empty, Seq(0.25, 0.75)) == Seq(None, None))
  }

  test("single element: every quantile is that element") {
    val df = Seq(7.25).toDF("v")
    assert(ExactQuantiles.interpolated(df, Seq(0.0, 0.5, 1.0)) ==
      Seq(Some(7.25), Some(7.25), Some(7.25)))
  }

  test("empty or out-of-range quantile request fails loudly, before any job") {
    val df = Seq(1.0, 2.0).toDF("v")
    intercept[IllegalArgumentException](ExactQuantiles.interpolated(df, Seq.empty))
    intercept[IllegalArgumentException](ExactQuantiles.interpolated(df, Seq(0.5, 1.5)))
    intercept[IllegalArgumentException](ExactQuantiles.interpolated(df, Seq(-0.1)))
  }
}
