package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential test for the binned interval join: randomized intervals
  * including empty (start == end), single-day, exactly-bin-width and
  * many-bin spans, against the naive range join, across bin widths that do
  * and don't align with the data. Seeded — failures reproduce. */
class IntervalJoinRandomSpec extends SparkSpec {
  import spark.implicits._

  private def day(n: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(n))

  test("randomized equivalence with the naive range join (3 seeds x 3 bin widths)") {
    for (seed <- Seq(2L, 13L, 99L); binDays <- Seq(1, 7, 30)) {
      val rnd = new scala.util.Random(seed)
      val points = (1 to 250).map(pid => (pid.toLong, day(rnd.nextInt(200)))).toDF("pid", "t")
      val intervals = (1 to 60).map { iid =>
        val s = rnd.nextInt(200)
        // lengths 0 (empty), 1, binDays exactly, and long spans
        val len = Seq(0, 1, binDays, rnd.nextInt(90))(rnd.nextInt(4))
        (iid.toLong, day(s), day(s + len))
      }.toDF("iid", "s", "e")

      val naive = points.join(intervals, col("t") >= col("s") && col("t") < col("e"))
        .select("pid", "iid").collect().map(_.toString).sorted
      val binned = IntervalJoin.pointInInterval(points, intervals, "t", "s", "e",
          binDays = binDays)
        .select("pid", "iid").collect().map(_.toString).sorted
      assert(binned.length == naive.length,
        s"seed=$seed bin=$binDays rows: binned=${binned.length} naive=${naive.length}")
      assert(binned.sameElements(naive), s"seed=$seed bin=$binDays diverged")
    }
  }
}
