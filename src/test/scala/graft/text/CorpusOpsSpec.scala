package graft.text

import graft.SparkSpec
import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Invariant tests for sequence packing and decontamination (the e2e
  * queries are oracle-checked; these pin the operator semantics on
  * hand-built fixtures where the right answer is computable by hand). */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("packing: offsets are the exclusive cumsum in id order; window accounting adds up") {
    val docs = Seq((1L, 100L), (2L, 500L), (3L, 12L), (4L, 1500L), (5L, 1L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.packWindows(docs, "doc_id", "n_tokens", 512)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getBoolean(5)))

    // hand oracle: starts 0, 100, 600, 612, 2112; windows of 512
    // doc 1 [0,100)   → w0 (100)
    // doc 2 [100,600) → w0 (412), w1 (88)
    // doc 3 [600,612) → w1 (12)
    // doc 4 [612,2112)→ w1 (412), w2 (512), w3 (512), w4 (64)
    // doc 5 [2112,2113)→ w4 (1)
    val expected = Set(
      (1L, 0L, 0L, 100L, true),
      (2L, 0L, 100L, 412L, true), (2L, 1L, 100L, 88L, false),
      (3L, 1L, 600L, 12L, true),
      (4L, 1L, 612L, 412L, true), (4L, 2L, 612L, 512L, false),
      (4L, 3L, 612L, 512L, false), (4L, 4L, 612L, 64L, false),
      (5L, 4L, 2112L, 1L, true))
    assert(out.toSet == expected)
  }

  test("packing invariants hold on the documents table") {
    val docs = graft.Tables.documents(spark, sf("sf0.01"))
      .select(col("doc_id"), size(split(trim(col("text")), " ")).as("n_tokens"))
    val packed = Packing.packWindows(docs, "doc_id", "n_tokens", 512).persist()
    try {
      val nDocs = docs.where(col("n_tokens") > 0).count()
      // every doc's overlaps sum back to its token count, with exactly one head
      val perDoc = packed.groupBy("doc_id")
        .agg(sum("tokens_in_window").as("tot"), max("n_tokens").as("n"),
          sum(when(col("is_head"), 1).otherwise(0)).as("heads"))
      assert(perDoc.count() == nDocs)
      assert(perDoc.where(col("tot") =!= col("n") || col("heads") =!= 1).isEmpty)
      // no window overfills, and all but the last fill exactly
      val perWin = packed.groupBy("window_id").agg(sum("tokens_in_window").as("fill"))
      val lastW = perWin.agg(max("window_id")).head().getLong(0)
      assert(perWin.where(col("fill") > 512).isEmpty)
      assert(perWin.where(col("window_id") < lastW && col("fill") =!= 512).isEmpty)
    } finally packed.unpersist()
  }

  test("randomized differential: packing matches an in-memory oracle") {
    val rnd = new scala.util.Random(7)
    // sparse ids, skewed sizes, giant docs spanning many windows
    val docs = (1 to 300).map(_ => rnd.nextInt(100000).toLong).distinct.sorted
      .map(id => (id, (rnd.nextInt(3) match {
        case 0 => rnd.nextInt(20) + 1
        case 1 => rnd.nextInt(500) + 1
        case _ => rnd.nextInt(4000) + 1
      }).toLong))
    val ws = 512
    val got = Packing.packWindows(docs.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens", ws)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toSet
    var off = 0L
    val expected = docs.flatMap { case (id, n) =>
      val start = off; off += n
      (start / ws to (start + n - 1) / ws).map { w =>
        (id, w, start, n,
          math.min(start + n, (w + 1) * ws) - math.max(start, w * ws),
          w == start / ws)
      }
    }.toSet
    assert(got == expected)
  }

  test("decontamination flags a planted holdout copy and scores disjoint docs zero") {
    // ids: %20==19 → holdout. 19 is the benchmark doc; 1 is its verbatim
    // copy (ratio 1.0); 2 shares a suffix (partial); 3 is disjoint (0.0).
    val docs = Seq(
      (19L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three delta epsilon zeta"),
      (3L, "totally different words entirely here now")
    ).toDF("doc_id", "text")
    val got = Decontaminate.overlap(docs, col("doc_id") % 20 === 19, 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(got(1L) == ((4L, 1.0, true)))          // all 4 trigrams shared
    assert(got(2L)._1 == 1L && !got(2L)._3)       // only "delta epsilon zeta"
    assert(got(3L) == ((0L, 0.0, false)))
    assert(!got.contains(19L))                    // holdout rows excluded
  }

  test("fuzzy decontamination finds planted near-copies of holdout docs only") {
    val bench19 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val bench39 = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq(
      19L -> bench19, 39L -> bench39,      // holdout (%20 == 19)
      1L -> bench19.replace("delta", "revised"), // lightly-edited copy of 19
      2L -> bench39,                             // verbatim copy of 39
      3L -> "completely unrelated filler text with many different words here",
      4L -> "another unrelated document that shares nothing with benchmarks at all"
    ).toDF("doc_id", "text")
    val out = Decontaminate.fuzzy(docs, col("doc_id") % 20 === 19, 0.2).collect()
    val got = out.map(r =>
      (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("benchmark_id")))).toSet
    assert(got == Set((1L, 19L), (2L, 39L)), s"got $got")
    // verified pairs carry the exact jaccard, and the verbatim copy scores 1.0
    val j = out.map(r => (r.getLong(r.fieldIndex("doc_id")),
      r.getDouble(r.fieldIndex("jaccard")))).toMap
    assert(j(2L) == 1.0 && j(1L) > 0.2 && j(1L) < 1.0)
  }

  test("fuzzy decontamination recovers every exact cross-split pair on sf0.001") {
    // testdata is fixed, MinHash is deterministic: on this corpus the LSH
    // candidates cover all exact pairs, so equality (not just ⊆) holds and
    // pins both precision (verify stage) and recall (banding) per run
    val dir = sf("sf0.001")
    val hold = col("doc_id") % 20 >= 18
    val fuzzy = Decontaminate.fuzzy(graft.Tables.documents(spark, dir), hold, 0.2)
      .select("doc_id", "benchmark_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.dedup.Jaccard.pairs(spark, dir, 0.2)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 20 >= 18) != (b % 20 >= 18) }
      .map { case (a, b) => if (a % 20 >= 18) (b, a) else (a, b) }.toSet
    assert(fuzzy == exact, s"\nfuzzy $fuzzy\nexact $exact")
  }
}
