package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Differential test of sliding-window chunking against a single-node
  * reference on randomized documents, plus the edge shapes: doc shorter
  * than one chunk, exact stride multiples, single-token doc. */
class ChunkingSpec extends SparkSpec {

  private val Chunk = 8
  private val Stride = 4

  private def reference(id: Long, text: String): Seq[(Long, Long, Long, Long, String)] = {
    val w = text.trim.split(" ", -1).toSeq
    val starts = 0 until w.size by Stride
    starts.zipWithIndex.map { case (st, i) =>
      val len = math.min(Chunk, w.size - st)
      (id, i.toLong, st.toLong, len.toLong, w.slice(st, st + len).mkString(" "))
    }
  }

  test("randomized docs match the single-node reference exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val docs = (0L until 60L).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i, Seq.fill(n)(s"w${rnd.nextInt(9)}").mkString(" "))
    }
    val got = Chunking.slidingWindows(docs.toDF("doc_id", "text"), "doc_id", col("text"), Chunk, Stride)
      .as[(Long, Long, Long, Long, String)].collect().toSeq.sortBy(r => (r._1, r._2))
    val want = docs.flatMap { case (i, t) => reference(i, t) }
    assert(got == want)
  }

  test("doc shorter than one chunk yields exactly one truncated chunk") {
    import spark.implicits._
    val got = Chunking.slidingWindows(Seq((7L, "a b c")).toDF("doc_id", "text"),
        "doc_id", col("text"), Chunk, Stride)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((7L, 0L, 0L, 3L, "a b c")))
  }

  test("every token is covered and consecutive chunks overlap by chunk - stride") {
    import spark.implicits._
    val words = (0 until 23).map(i => s"t$i")
    val got = Chunking.slidingWindows(Seq((1L, words.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", col("text"), Chunk, Stride)
      .as[(Long, Long, Long, Long, String)].collect().toSeq.sortBy(_._2)
    // full coverage: the union of [start, start + len) spans [0, n)
    val covered = got.flatMap(c => c._3 until (c._3 + c._4)).distinct.sorted
    assert(covered == (0L until words.size.toLong))
    // each chunk's text is the claimed token span
    got.foreach(c => assert(c._5.split(" ").toSeq ==
      words.slice(c._3.toInt, (c._3 + c._4).toInt)))
    got.sliding(2).foreach {
      case Seq(a, b) => assert(b._3 - a._3 == Stride)
      case _ =>
    }
  }
}
