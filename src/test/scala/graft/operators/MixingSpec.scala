package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Domain-weighted epoch sampling: the per-doc copy-count law, determinism,
  * and the no-shuffle plan claim. */
class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "srcA", "alpha beta gamma"),
    (1L, "srcA", "delta epsilon"),
    (2L, "srcB", "alpha beta gamma"), // identical text to doc 0 → same bucket
    (3L, "srcB", "zeta eta theta iota")
  ).toDF("doc_id", "source", "text")

  test("copy count per doc is exactly floor(rate) + [bucket < frac]") {
    val rate = when(col("source") === "srcA", 250).otherwise(40)
    val out = Mixing.sampleMix(docs, rate, col("text"))
      .groupBy("doc_id", "rate_pct", "mix_bucket")
      .agg(count(lit(1)).as("copies"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("rate_pct"), r.getAs[Int]("mix_bucket"), r.getAs[Long]("copies")))
      .toMap
    for ((id, (rp, bucket, copies)) <- out) {
      val expected = rp / 100 + (if (bucket < rp % 100) 1 else 0)
      assert(copies == expected, s"doc $id rate $rp bucket $bucket: $copies copies")
    }
    // rate 250 guarantees ≥2 copies for every srcA doc even when the
    // fractional third copy is dropped
    assert(out(0L)._3 >= 2 && out(1L)._3 >= 2)
    // rate 40 (< 1 epoch) yields 0 or 1 copies
    val sub = out.filterKeys(Set(2L, 3L)).values
    assert(sub.forall(v => v._3 >= 0 && v._3 <= 1))
  }

  test("bucket is keyed on content: identical text gets identical buckets across domains") {
    val b = Mixing.contentBucket(col("text"))
    val buckets = docs.select(col("doc_id"), b.as("bucket")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(buckets(0L) == buckets(2L))
    assert(buckets.values.forall(v => v >= 0 && v < 100))
  }

  test("sampling is deterministic and shuffle-free") {
    val rate = lit(150)
    val a = Mixing.sampleMix(docs, rate, col("text"))
    val rows1 = a.collect().toSet
    val rows2 = Mixing.sampleMix(docs, rate, col("text")).collect().toSet
    assert(rows1 == rows2)
    assert(graft.PlanCheck.executedNodes(a)
      .count(_.isInstanceOf[ShuffleExchangeExec]) == 0, "mix must not shuffle")
  }

  test("realized rate tracks the configured rate on the real corpus") {
    val d = graft.Tables.documents(spark, sf("sf0.01")).select("doc_id", "source", "text")
    val out = Mixing.sampleMix(d, lit(50), col("text"))
    val kept = out.count().toDouble
    val total = d.count().toDouble
    // content-hash bucket ⇒ binomial(n, 0.5); 500 docs ⇒ ±3σ ≈ ±0.067
    assert(math.abs(kept / total - 0.5) < 0.1, s"kept ${kept / total}")
  }
}
