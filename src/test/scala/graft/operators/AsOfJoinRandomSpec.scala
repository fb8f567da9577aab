package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Differential test: on randomized inputs (nullable payloads, sparse and
  * dense key histories, matches before/after/at the left timestamp), the
  * zero-join as-of must equal a straightforward range-join + keep-latest
  * reference implementation, with and without tolerance. Seeded — failures
  * reproduce. */
class AsOfJoinRandomSpec extends SparkSpec {
  import spark.implicits._

  private def day(n: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(n))

  private def referenceAsOf(left: org.apache.spark.sql.DataFrame,
                            right: org.apache.spark.sql.DataFrame,
                            tolerance: Option[Int]): Array[String] = {
    val j = left.join(right,
      left("k") === right("k") && right("rt") <= left("t"), "left")
      .drop(right("k"))
    val w = Window.partitionBy(left("k"), col("lid")).orderBy(col("rt").desc_nulls_last)
    val latest = j.withColumn("rnk", row_number().over(w)).where(col("rnk") === 1)
    val voided = tolerance match {
      case Some(days) => latest
        .withColumn("v", when(datediff(col("t"), col("rt")) < days, col("v")))
        .withColumn("rt", when(datediff(col("t"), col("rt")) < days, col("rt")))
      case None => latest
    }
    voided.select("k", "lid", "t", "rt", "v").collect().map(_.toString).sorted
  }

  test("randomized equivalence with the range-join reference (3 seeds, with/without tolerance)") {
    for (seed <- Seq(1L, 7L, 42L); tol <- Seq(None, Some(10))) {
      val rnd = new scala.util.Random(seed)
      val left = (1 to 300).map { lid =>
        (rnd.nextInt(8).toLong, lid.toLong, day(rnd.nextInt(120)))
      }.toDF("k", "lid", "t")
      // unique (k, rt) here so the reference's keep-latest is unambiguous;
      // the duplicate-timestamp contract gets its own tests below
      val rightRows = rnd.shuffle((0 until 120).toList).take(60).map { d =>
        (rnd.nextInt(8).toLong, day(d), if (rnd.nextBoolean()) Some(rnd.nextDouble()) else None)
      }.distinct
      val right = rightRows.toDF("k", "rt", "v")
        .withColumn("rn", row_number().over(Window.partitionBy("k", "rt").orderBy("v")))
        .where(col("rn") === 1).drop("rn")

      val expected = referenceAsOf(left, right, tol)
      val got = AsOfJoin.backward(left, right, Seq("k"), "t", "rt",
          payload = Seq("rt", "v"), toleranceDays = tol)
        .select("k", "lid", "t", "rt", "v").collect().map(_.toString).sorted
      assert(got.length == expected.length,
        s"seed=$seed tol=$tol rows: asof=${got.length} ref=${expected.length}")
      val diff = got.zip(expected).find(p => p._1 != p._2)
      assert(diff.isEmpty, s"seed=$seed tol=$tol first divergence: $diff")
    }
  }

  test("duplicate (k, rt) right rows: greatest payload struct wins, stable across partitionings") {
    for (seed <- Seq(3L, 11L)) {
      val rnd = new scala.util.Random(seed)
      val left = (1 to 200).map { lid =>
        (rnd.nextInt(4).toLong, lid.toLong, day(rnd.nextInt(60)))
      }.toDF("k", "lid", "t")
      // ~3 duplicates per (k, rt) on average, nullable payloads included
      val right = (1 to 180).map { _ =>
        (rnd.nextInt(4).toLong, day(rnd.nextInt(60) / 3 * 3),
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextDouble()))
      }.toDF("k", "rt", "v")

      // reference: per (k, lid) the latest rt; within it the greatest
      // payload struct (rt, rt, v) — i.e. max v, where NULL sorts lowest
      val j = left.join(right, left("k") === right("k") && right("rt") <= left("t"), "left")
        .drop(right("k"))
      val w = Window.partitionBy(left("k"), col("lid"))
        .orderBy(col("rt").desc_nulls_last, col("v").desc_nulls_last)
      val expected = j.withColumn("rnk", row_number().over(w)).where(col("rnk") === 1)
        .select("k", "lid", "t", "rt", "v").collect().map(_.toString).sorted

      for (parts <- Seq(1, 7, 32)) {
        val got = AsOfJoin.backward(
            left.repartition(parts), right.repartition(parts, col("v")),
            Seq("k"), "t", "rt", payload = Seq("rt", "v"))
          .select("k", "lid", "t", "rt", "v").collect().map(_.toString).sorted
        assert(got.toSeq == expected.toSeq, s"seed=$seed parts=$parts diverged")
      }
    }
  }

  test("explicit tieBreak column overrides payload order") {
    val left = Seq((1L, 1L, day(10))).toDF("k", "lid", "t")
    // same (k, rt); ord says the row with LOWER v wins
    val right = Seq((1L, day(5), 9.0, 1L), (1L, day(5), 2.0, 7L))
      .toDF("k", "rt", "v", "ord")
    val got = AsOfJoin.backward(left, right, Seq("k"), "t", "rt",
        payload = Seq("v"), tieBreak = Some("ord"))
      .select("v").collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(2.0))
  }
}
