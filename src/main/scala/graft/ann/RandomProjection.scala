package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded random-projection dimensionality reduction (Achlioptas 2003 /
  * Johnson–Lindenstrauss): project d-dim embeddings to k dims through a
  * deterministic ±1/√k sign matrix. Sign matrices satisfy the JL distance
  * bounds like gaussians do (Achlioptas, "Database-friendly random
  * projections"), and — unlike a JVM-seeded gaussian — the sign is
  * reproducible on ANY engine from md5 text arithmetic (the same
  * cross-engine hash family as graft.text.Dsir.bucketOf), which is what
  * makes the operator oracle-checkable bit-for-bit.
  *
  * Exactness: each term x_i·s_ij is quantized to 10 dp, summed as
  * DECIMAL(25,10) (order-free), divided by √k and rounded to 6 dp — the
  * SURVEY §6 contract for computed-double sums.
  *
  * 100 TB shape: the sign matrix is d×k rows broadcast; the projection is
  * posexplode + broadcast join + one hash aggregation keyed
  * (vec_id, output dim) with map-side partial sums — linear in input,
  * one shuffle of k doubles per vector.
  */
object RandomProjection {

  /** Deterministic ±1 sign for (input dim i, output dim j). */
  private def sgn(i: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
    (lit(1) - lit(2) * (ascii(substring(md5(
      concat(i.cast("string"), lit(":"), j.cast("string"))), 1, 1)) % 2)).cast("double")

  /** (vec_id, proj_dim, proj_val): the k-dim projection of `vecs`
    * (columns vec_id, emb: array<double> of length `dim`). */
  def project(vecs: DataFrame, dim: Int, k: Int): DataFrame = {
    val spark = vecs.sparkSession
    val signs = spark.range(1, dim + 1L).select(col("id").cast("int").as("i"))
      .crossJoin(spark.range(0, k.toLong).select(col("id").cast("int").as("j")))
      .select(col("i"), col("j"), sgn(col("i"), col("j")).as("sgn"))
    val terms = vecs
      .select(col("vec_id"), posexplode(col("emb")).as(Seq("p", "x")))
      .select(col("vec_id"), (col("p") + 1).cast("int").as("i"), col("x"))
      .join(broadcast(signs), "i")
      .select(col("vec_id"), col("j"),
        (round(col("x") * col("sgn"), 10) + lit(0.0)).as("term"))
    terms.groupBy("vec_id", "j")
      .agg((round(graft.sqlx.Exact.decSumAgg(col("term")) / lit(math.sqrt(k.toDouble)), 6)
        + lit(0.0)).as("proj_val"))
      .select(col("vec_id"), col("j").as("proj_dim"), col("proj_val"))
  }
}
