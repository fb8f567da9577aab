package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden tests for the large-star/small-star connected-components
  * operator: known graph shapes, input-order invariance, and the shapes
  * that defeat naive one-round min-propagation (long chains, min in the
  * middle). */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("chain collapses to its minimum") {
    assert(cc(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("long chain with the minimum in the middle (worst case for one-round propagation)") {
    val n = 64L
    val edges = (1L until n).map(i => i -> (i + 1))
    val got = cc(edges: _*)
    assert(got.keySet == (1L to n).toSet && got.values.forall(_ == 1L))
    // same chain shifted so the min sits mid-chain
    val shifted = edges.map { case (a, b) => ((a + 30) % n) -> ((b + 30) % n) }
      .filter { case (a, b) => a != b }
    val got2 = cc(shifted: _*)
    assert(got2.values.forall(_ == 0L))
  }

  test("disjoint components keep separate minima; cycles and dup/reversed edges are fine") {
    val got = cc(
      10L -> 11L, 11L -> 12L, 12L -> 10L, // triangle
      12L -> 10L, 10L -> 12L,             // duplicates / reversed
      20L -> 21L,                          // separate pair
      30L -> 30L,                          // self loop only → own component
      40L -> 41L, 41L -> 42L, 40L -> 42L)
    assert(got == Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L,
      40L -> 40L, 41L -> 40L, 42L -> 40L))
  }

  test("result is invariant to input row order") {
    val edges = Seq(5L -> 9L, 9L -> 2L, 7L -> 8L, 2L -> 11L, 8L -> 3L)
    assert(cc(edges: _*) == cc(edges.reverse: _*))
  }

  test("incremental pairs equal the full pair set restricted to the batch") {
    val docs = graft.Tables.documents(spark, sf("sf0.01"))
    val sh = Jaccard.shingles(docs)
    val newIds = docs.where(col("doc_id") % 7 === 3).select("doc_id")
    val newSet = newIds.as[Long].collect().toSet
    val full = Jaccard.pairsFromShingles(sh, 0.2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // expected: every full pair with at least one batch member, oriented so
    // doc_b is the batch doc (flip when only doc_a is new)
    val expected = full.collect {
      case (a, b) if newSet(b) => (a, b)
      case (a, b) if newSet(a) => (b, a)
    }
    val got = Jaccard.pairsForIncrement(sh, newIds, 0.2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty, "batch should intersect some planted pairs")
    assert(got == expected,
      s"missed ${(expected -- got).size}, invented ${(got -- expected).size}")
  }

  test("star rounds preserve connectivity invariants on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(200)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val got = cc(edges.map { case (a, b) => a -> b }: _*)
    // oracle: in-memory union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap
    // union-find roots are component-minimal here because we always parent
    // the larger root under the smaller
    assert(got == expected)
  }
}
