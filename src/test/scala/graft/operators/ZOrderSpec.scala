package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Layout-benefit demonstration for z-order clustering: range-partitioning
  * event files by z-value gives tight 2-d per-file bounding boxes, so a
  * box-shaped (user × day) predicate intersects fewer files than under
  * either single-dimension sort — the property that turns into file-level
  * data skipping at 100 TB. Deterministic: fixed testdata, fixed
  * partitioning keys. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private val NFiles = 16

  private def events: DataFrame = {
    // sf0.01: 150 users × 30 days — enough grid cells that 16 files have
    // meaningfully different boxes under the three layouts
    val base = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id").cast("int").as("u"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("day"))
    val (uMax, dMax) = base.agg(max("u"), max("day")).as[(Int, Int)].collect().head
    // production z-layouts scale every dimension to the SAME bit budget
    // before interleaving (cf. Delta's range-partitioned rank): raw
    // interleave of a 8-bit dim with a 5-bit dim is user-major and loses
    // the curve property. 5 bits each = 1024 cells for 16 files.
    base.withColumn("z", ZOrder.zValue(
      (col("u") * 32 / (uMax + 1)).cast("int"),
      (col("day") * 32 / (dMax + 1)).cast("int"), 5))
  }

  /** Per-file (min_u, max_u, min_day, max_day) after range-partitioning by
    * the given sort expression — each partition stands for one written file
    * and its parquet footer stats. */
  private def boxes(sortCols: Seq[String]): Seq[(Int, Int, Int, Int)] =
    events.repartitionByRange(NFiles, sortCols.map(col): _*)
      .groupBy(spark_partition_id().as("f"))
      .agg(min("u").as("u0"), max("u").as("u1"), min("day").as("d0"), max("day").as("d1"))
      .select(col("u0").cast("int"), col("u1").cast("int"),
        col("d0").cast("int"), col("d1").cast("int"))
      .as[(Int, Int, Int, Int)].collect().toSeq

  private def filesTouched(bs: Seq[(Int, Int, Int, Int)],
                           u0: Int, u1: Int, d0: Int, d1: Int): Int =
    bs.count { case (a0, a1, b0, b1) => a1 >= u0 && a0 <= u1 && b1 >= d0 && b0 <= d1 }

  test("z-order beats both single-dim sorts on their worst-case query shape") {
    val zb = boxes(Seq("z"))
    val byUser = boxes(Seq("u", "day"))
    val byDay = boxes(Seq("day", "u"))
    val (uMax, dMax) = events.agg(max("u"), max("day")).as[(Int, Int)].collect().head
    // the two single-dimension range queries a mixed workload sends: a sort
    // on one dimension leaves every file spanning the full other dimension,
    // so the opposite-dimension query reads everything — z-order is the
    // layout with no catastrophic query shape
    val uQ = (uMax / 4, uMax / 2, 0, dMax)          // user range, all days
    val dQ = (0, uMax, dMax / 4, dMax / 2)          // day range, all users
    def worst(bs: Seq[(Int, Int, Int, Int)]): Int = math.max(
      filesTouched(bs, uQ._1, uQ._2, uQ._3, uQ._4),
      filesTouched(bs, dQ._1, dQ._2, dQ._3, dQ._4))
    val (wz, wu, wd) = (worst(zb), worst(byUser), worst(byDay))
    info(s"worst-case files touched: z=$wz byUser=$wu byDay=$wd of $NFiles")
    // each single-dim sort degenerates to a full scan on its blind axis
    assert(wu == NFiles && wd == NFiles)
    assert(wz < NFiles)
    // and the 2-d box query also prunes under z
    val fbox = filesTouched(zb, uMax / 4, uMax / 2, dMax / 4, dMax / 2)
    info(s"box query under z: $fbox of $NFiles")
    assert(fbox < NFiles)
  }
}
