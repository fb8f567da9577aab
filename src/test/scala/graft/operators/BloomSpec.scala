package graft.operators

import graft.{PlanCheck, SparkSpec, Tables}
import graft.text.Decontaminate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** The bloom prefilter's contract inside [[Decontaminate.overlap]]: it may
  * only ever REDUCE the bytes reaching the exact semi-join, never change
  * the answer. Three obligations: (1) no false negatives and a bounded FP
  * rate (the arithmetic itself), (2) overlap results bit-identical to the
  * unfiltered left-join formulation the DuckDB oracle mirrors, (3) the
  * bloom Filter physically sits on the corpus side BEFORE any exchange —
  * the whole point of the operator at 100 TB. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives; false-positive rate within theoretical bound") {
    val items = spark.range(5000).select(concat(lit("tok"), col("id")).as("t"))
    val words = Bloom.build(items, "t")
    assert(items.where(!Bloom.mightContain(words, col("t"))).count() == 0L,
      "bloom returned a false negative")
    val others = spark.range(5000, 45000).select(concat(lit("tok"), col("id")).as("t"))
    val fp = others.where(Bloom.mightContain(words, col("t"))).count()
    // (1 - e^(-kn/m))^k at k=3, n=5000, m=2^19 ≈ 2.2e-5 → expect ~0.9 FPs
    // over 40k probes; assert a generous 50× slack so the test can't flake
    assert(fp <= 45, s"FP count $fp over 40k probes exceeds bound")
  }

  test("bitmap scales with item cardinality: power of two, >= 12.37 bits/item between floor and cap") {
    assert(Bloom.bitsFor(1000) === Bloom.MinBits) // floor
    assert(Bloom.bitsFor(100000) === (1 << 21)) // 12.37·1e5 ≈ 1.24M → 2^21
    assert(Bloom.bitsFor(1000000) === (1 << 24))
    assert(Bloom.bitsFor(100000000) === Bloom.MaxBits) // cap
    Seq(1L, 50000L, 5000000L).foreach { n =>
      val m = Bloom.bitsFor(n)
      assert(Integer.bitCount(m) === 1)
      assert(m >= Bloom.MinBits && m <= Bloom.MaxBits)
      if (m < Bloom.MaxBits) assert(m >= 12.37 * n)
    }
  }

  test("FP rate <= 1% holds on a planted set past the floor (200k items)") {
    // 200k items → 2^22 bits (the sizing rule's regime, not the floor);
    // theoretical FP = (1-e^(-kn/m))^k ≈ 0.24% — assert the documented ≤1%
    val items = spark.range(200000).select(concat(lit("big"), col("id")).as("t"))
    val words = Bloom.build(items, "t")
    assert(words.length * 64 === (1 << 22))
    assert(items.where(!Bloom.mightContain(words, col("t"))).count() == 0L,
      "bloom returned a false negative")
    val probes = 100000L
    val others = spark.range(200000, 200000 + probes)
      .select(concat(lit("big"), col("id")).as("t"))
    val fp = others.where(Bloom.mightContain(words, col("t"))).count()
    assert(fp <= probes / 100, s"FP count $fp over $probes probes exceeds 1%")
  }

  test("overlap with bloom prefilter is bit-identical to the unfiltered left-join formulation") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val isHold = col("doc_id") % 10 === 3
    val got = Decontaminate.overlap(docs, isHold, 0.2)
      .select("doc_id", "n_shingles", "n_contaminated", "contamination_ratio", "is_contaminated")
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq

    // the pre-bloom round-7 formulation, verbatim: broadcast left join + sum(when)
    val sh = graft.dedup.Jaccard.shingles(docs)
    val holdIds = docs.where(isHold).select("doc_id")
    val benchShingles = sh.join(holdIds, "doc_id").select("shingle").distinct()
      .withColumn("_hit", lit(true))
    val trainSh = sh.join(holdIds, Seq("doc_id"), "left_anti")
    val agg = trainSh
      .join(broadcast(benchShingles), Seq("shingle"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_hit"), 1L).otherwise(0L)).as("n_contaminated"))
    val want = docs.where(!isHold).select("doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination_ratio",
        col("n_contaminated").cast("double") / greatest(col("n_shingles"), lit(1L)).cast("double"))
      .withColumn("is_contaminated", col("contamination_ratio") >= 0.2)
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq

    assert(got == want)
    assert(got.exists(_._3 > 0), "fixture has no contaminated docs — test is vacuous")
  }

  test("bloom filter sits on the corpus side of the plan before any exchange") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val res = Decontaminate.overlap(docs, col("doc_id") % 10 === 3, 0.2)
    val nodes = PlanCheck.executedNodes(res)
    val bloomFilters = nodes.collect {
      case f: FilterExec if f.condition.toString.contains("xxhash64") => f
    }
    assert(bloomFilters.nonEmpty, "no bloom Filter in the executed plan")
    // map-side means the filter's input subtree contains no shuffle: the
    // prefilter must run before rows ever reach an exchange
    assert(bloomFilters.exists { f =>
      f.children.flatMap(PlanCheck.allNodes).collect { case s: ShuffleExchangeLike => s }.isEmpty
    }, "every bloom Filter sits above a shuffle — prefilter is not map-side")
  }
}
