package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential test of the distributed BPE trainer against an independent
  * single-node reference implementation (greedy leftmost non-overlapping
  * merge application, count-desc then pair-lex argmax). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Single-node reference BPE over a word-frequency map. */
  private def refBpe(words: Map[String, Long], n: Int): Seq[(Int, String, String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var step = 0
    var stop = false
    while (step < n && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((step, l, r, l + r, cnt))
        vocab = vocab.map { case (syms, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), f)
        }
        step += 1
      }
    }
    out.result()
  }

  private def wordFreqs(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.trim.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  test("merge sequence matches the reference on a crafted fixture") {
    val texts = Seq(
      "low low low lower lower newest newest newest newest widest",
      "low newest widest widest newest",
      "lowest newest")
    val df = texts.toDF("text")
    val got = Bpe.merges(df, "text", nMerges = 8).as[(Int, String, String, String, Long)]
      .collect().toSeq.sortBy(_._1)
    val want = refBpe(wordFreqs(texts), 8)
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("merge sequence matches the reference on the real sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val got = Bpe.merges(docs, "text", nMerges = 12).as[(Int, String, String, String, Long)]
      .collect().toSeq.sortBy(_._1)
    val texts = docs.select("text").as[String].collect().toSeq
    val want = refBpe(wordFreqs(texts), 12)
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("merges terminate early when every word is a single symbol") {
    val df = Seq("a b", "a").toDF("text")
    val got = Bpe.merges(df, "text", nMerges = 5).collect()
    assert(got.isEmpty) // all words are single chars: no adjacent pairs at all
  }

  test("256 merges cost a bounded number of Spark jobs (single word-freq collect)") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val got = Bpe.merges(docs, "text", nMerges = 256)
        .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
      // listener delivery is async: wait until the job counter is stable
      var prev = -1
      var waited = 0
      while (jobs.get() != prev && waited < 5000) {
        prev = jobs.get(); Thread.sleep(250); waited += 250
      }
      // learning is driver-side over the collected word-freq table: the job
      // count must not scale with nMerges (was one full pass PER merge)
      assert(jobs.get() <= 10, s"expected <=10 Spark jobs for 256 merges, saw ${jobs.get()}")
      assert(got.size > 50) // deep chain (the sf0.001 vocab exhausts at ~89 merges)
      val texts = docs.select("text").as[String].collect().toSeq
      assert(got == refBpe(wordFreqs(texts), 256))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
