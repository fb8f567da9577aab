package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDeDupSpec extends SparkSpec {
  import spark.implicits._

  test("planted near-identical vectors group together; distinct ones stay singletons") {
    val rnd = new scala.util.Random(7)
    def unit(): Array[Double] = {
      val v = Array.fill(16)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    // 30 well-separated base vectors + near-copies of three of them
    val bases = (0L until 30L).map(id => (id, unit()))
    val copies = Seq(100L -> 0L, 101L -> 0L, 102L -> 7L, 103L -> 19L).map {
      case (cid, of) =>
        val b = bases(of.toInt)._2
        (cid, b.map(x => x + rnd.nextGaussian() * 1e-4))
    }
    val df = (bases ++ copies).toDF("vec_id", "emb")
    val out = SemDeDup.dedup(df, nCells = 4, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    // each copy shares its base's group (kmeans puts near-identical vectors
    // in the same cell) and is flagged; the base survives as representative
    Seq(100L -> 0L, 101L -> 0L, 102L -> 7L, 103L -> 19L).foreach { case (c, b) =>
      assert(out(c) == ((b, true)), s"copy $c: ${out(c)}")
      assert(out(b) == ((b, false)), s"base $b: ${out(b)}")
    }
    // everything else is a singleton
    (0L until 30L).filterNot(Set(0L, 7L, 19L)).foreach { id =>
      assert(out(id) == ((id, false)))
    }
  }

  test("in-cell pairs are a subset of the exact global pair set on sf0.001") {
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val out = SemDeDup.dedup(e, nCells = 16, threshold = 0.4).collect()
    val flagged = out.filter(_.getBoolean(3)).map(r => (r.getLong(2), r.getLong(0))).toSet
    val exactPairs = Cosine.thresholdPairs(spark, sf("sf0.001"), 0.4)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every flagged (group, member) link is backed by exact-pair reachability:
    // weaker check — each flagged member has SOME exact partner
    val partnered = exactPairs.flatMap(p => Seq(p._1, p._2))
    flagged.foreach { case (_, m) =>
      assert(partnered.contains(m), s"member $m flagged without an exact partner")
    }
    assert(out.length == e.count())
  }
}
