package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DeterministicShuffleSpec extends SparkSpec {
  import spark.implicits._

  test("positions form an exact 1..N permutation with balanced round-robin shards") {
    val ids = (0L until 1000L).toDF("doc_id")
    val out = DeterministicShuffle.permutation(ids, "doc_id", nShards = 8).collect()
    assert(out.map(_.getLong(1)).sorted.toSeq == (1L to 1000L))
    val shardSizes = out.groupBy(_.getInt(2)).view.mapValues(_.length)
    assert(shardSizes.values.toSet == Set(125)) // 1000 / 8 exactly
    out.foreach(r => assert(r.getInt(2) == ((r.getLong(1) - 1) % 8).toInt))
  }

  test("the bucket-offset construction matches a single global window order") {
    val ids = (0L until 500L).map(_ * 7 + 3).toDF("doc_id")
    val got = DeterministicShuffle.permutation(ids, "doc_id", nShards = 4)
      .select("doc_id", "position")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ids
      .withColumn("k", md5(concat(col("doc_id").cast("string"), lit(":shuffle"))))
      .orderBy("k", "doc_id")
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    assert(got == want)
  }

  test("order is invariant to input partitioning") {
    val a = DeterministicShuffle.permutation((0L until 300L).toDF("doc_id"), "doc_id", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = DeterministicShuffle.permutation(
        (0L until 300L).toDF("doc_id").repartition(13), "doc_id", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
