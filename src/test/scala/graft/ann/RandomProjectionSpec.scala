package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JL property checks for the sign-matrix projection: norm preservation in
  * expectation over the corpus, determinism, and distance-ordering
  * usefulness on a sample of pairs. */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = graft.Tables.embeddings(spark, sf("sf0.001"))
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  private def projections: Map[Long, Vector[Double]] =
    RandomProjection.project(vecs, dim = 64, k = 8)
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3).toVector
      }

  test("squared norms are preserved in expectation (mean ratio ~ 1)") {
    val orig = vecs.as[(Long, Seq[Double])].collect()
      .map { case (id, e) => id -> e.map(x => x * x).sum }.toMap
    val proj = projections
    val ratios = orig.collect { case (id, n2) if n2 > 0 =>
      proj(id).map(x => x * x).sum / n2
    }
    val mean = ratios.sum / ratios.size
    // each per-vector ratio has sd ~ sqrt(2/k) ~ 0.5; the corpus mean of
    // 500 of them concentrates well inside this band
    assert(mean > 0.9 && mean < 1.1, s"mean norm ratio $mean")
  }

  test("projection is deterministic across invocations") {
    assert(projections == projections)
  }

  test("cluster structure survives projection (separated mixture stays separated)") {
    // the parquet embeddings are isotropic (all pairwise distances
    // concentrate), so ordering has no signal there; a seeded 4-component
    // mixture is where a projection must keep within ≪ between distances
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(4, 64)(rnd.nextGaussian() * 4.0)
    val pts = (0L until 200L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(_ + rnd.nextGaussian() * 0.5).toSeq)
    }
    val proj = RandomProjection.project(
        pts.toDF("vec_id", "emb"), dim = 64, k = 8)
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).map { case (id, rows) => id -> rows.sortBy(_._2).map(_._3).toVector }
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = pts.map(_._1)
    val (within, between) = (for (a <- ids; b <- ids if a < b)
      yield (a % 4 == b % 4, d2(proj(a), proj(b)))).partition(_._1)
    val mw = within.map(_._2).sum / within.size
    val mb = between.map(_._2).sum / between.size
    assert(mb > 4.0 * mw, s"between $mb vs within $mw")
  }
}
