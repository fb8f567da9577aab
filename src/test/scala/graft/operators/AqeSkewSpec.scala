package graft.operators

import graft.{PlanCheck, SparkSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** AQE's own skew-join handling (spark.sql.adaptive.skewJoin.*) on a
  * generated-skew fixture, and where it stops — the evidence behind
  * SkewJoin's decision rule: prefer the PLAIN join and let AQE split the
  * hot key at runtime whenever the join is a shuffle (sort-merge) join;
  * reach for explicit salting only where AQE's OptimizeSkewedJoin cannot
  * act (hot-key AGGREGATIONS, and bucketed/pre-partitioned joins whose
  * point is having no exchange for AQE to re-read).
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  /** One hot key (0) carrying ~all big-side bytes, 50 cold keys. */
  private def fixture = {
    val big = spark.range(300000)
      .select(when(col("id") % 10 < 9, 0L).otherwise(col("id") % 50).as("k"),
        concat(lit("payload-payload-payload-payload-"), col("id")).as("v"))
    val dim = spark.range(50).select(col("id").as("k"),
      concat(lit("dim"), col("id")).as("name"))
    (big, dim)
  }

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val prior = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot key of a plain sort-merge join at runtime (isSkewJoin)") {
    // low thresholds so the few-MB fixture trips the same machinery that
    // fires at 256 MB-partition production scale
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val (big, dim) = fixture
      val joined = big.join(dim, "k")
      val smj = PlanCheck.executedNodes(joined).collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, "fixture did not plan a sort-merge join")
      assert(smj.exists(_.isSkewJoin),
        "AQE did not mark the join skewed — OptimizeSkewedJoin never fired")
      assert(joined.count() === 300000L)
    }
  }

  test("salting matches AQE-split join results bit-for-bit on the same skew") {
    withConfs(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val (big, dim) = fixture
      val plain = big.join(dim, "k").groupBy("k").count()
        .as[(Long, Long)].collect().sorted.toSeq
      val salted = SkewJoin.saltedInner(big, dim, Seq("k"), salts = 8)
        .groupBy("k").count().as[(Long, Long)].collect().sorted.toSeq
      assert(salted === plain)
    }
  }

  test("where AQE cannot act: a hot-key aggregation keeps one skewed reducer; the salted two-phase shape fixes it") {
    // OptimizeSkewedJoin only rewrites JOINs — a groupBy on the hot key
    // still lands every hot row on one reducer under AQE. The salted
    // two-phase aggregation (graft.sqlx.Skew.saltedCountSum shape) is the
    // remedy; here we pin the factual premise of the decision rule: the
    // aggregation's exchange partitions by the raw key, so the hot key is
    // structurally one partition regardless of AQE.
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val (big, _) = fixture
    val agg = big.groupBy("k").agg(count(lit(1)).as("n"))
    // structural premise: the aggregation exchange hash-partitions on the
    // RAW key — all hot-key partials land in one post-shuffle partition,
    // and no AQE rule splits an aggregation input the way
    // OptimizeSkewedJoin splits join inputs
    val exch = PlanCheck.executedNodes(agg).collect {
      case s: ShuffleExchangeLike => s.outputPartitioning
    }
    assert(exch.exists {
      case h: HashPartitioning => h.expressions.map(_.sql.toLowerCase).exists(_.contains("k"))
      case _ => false
    }, s"aggregation exchange does not hash-partition on the key: $exch")
    val hot = agg.where(col("k") === 0L).head.getAs[Long]("n")
    assert(hot === 270000L) // 90% of rows on one key
    val salted = big
      .withColumn("s", pmod(xxhash64(col("v")), lit(8)))
      .groupBy("k", "s").agg(count(lit(1)).as("pn"))
      .groupBy("k").agg(sum("pn").as("n"))
    assert(salted.where(col("k") === 0L).head.getAs[Long]("n") === hot)
  }
}
