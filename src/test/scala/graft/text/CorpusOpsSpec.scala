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
}
