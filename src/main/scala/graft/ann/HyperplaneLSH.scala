package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH for approximate cosine search — the 100 TB path:
  * each vector hashes to an L×B bit signature (sign of ⟨v, r⟩ per fixed
  * pseudo-random hyperplane r); vectors sharing a table bucket become
  * candidates via a bucket equi-join (never all-pairs). Multi-probe: each
  * vector also probes the B buckets at Hamming distance 1 per table,
  * trading a B× candidate fan-out for much higher recall.
  *
  * P(bit match) = 1 − θ/π, so a B-bit bucket matches with (1 − θ/π)^B —
  * L tables + 1-bit probes flatten the miss rate for near neighbours.
  * Hyperplanes derive from a fixed seed: deterministic across runs/JVMs.
  */
object HyperplaneLSH {
  def hyperplanes(dim: Int, tables: Int, bits: Int, seed: Long = 42L): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** (vec_id, table, bucket) with optional Hamming-1 multi-probe buckets. */
  def buckets(vecs: DataFrame, dim: Int, tables: Int = 16, bits: Int = 8,
              multiProbe: Boolean = true): DataFrame = {
    val planes = hyperplanes(dim, tables, bits)
    val bucketUdf = udf { (emb: Seq[Double]) =>
      if (emb == null) null
      else {
        val out = Array.ofDim[Int](tables)
        var t = 0
        while (t < tables) {
          var sig = 0
          var b = 0
          while (b < bits) {
            val plane = planes(t)(b)
            var s = 0.0
            var i = 0
            while (i < plane.length && i < emb.length) { s += plane(i) * emb(i); i += 1 }
            if (s > 0) sig |= (1 << b)
            b += 1
          }
          out(t) = sig
          t += 1
        }
        out
      }
    }
    val withSig = vecs.select(col("vec_id"), col("emb"),
      bucketUdf(col("emb")).as("sigs")).where(col("sigs").isNotNull)
    val base = withSig.select(col("vec_id"),
      posexplode(col("sigs")).as(Seq("table", "bucket")))
    if (!multiProbe) base
    else {
      val probes = withSig
        .select(col("vec_id"), posexplode(col("sigs")).as(Seq("table", "sig")))
        .select(col("vec_id"), col("table"),
          explode(array((0 until bits).map(b => col("sig").bitwiseXOR(lit(1 << b))): _*)).as("bucket"))
      base.unionByName(probes).distinct()
    }
  }

  /** Approximate top-k: LSH candidates scored exactly, ranked per query. */
  def approxTopK(vecs: DataFrame, queries: DataFrame, dim: Int, k: Int): DataFrame = {
    val vb = buckets(vecs, dim)
    val qb = buckets(queries.withColumnRenamed("query_id", "vec_id")
        .withColumnRenamed("qemb", "emb"), dim)
      .withColumnRenamed("vec_id", "query_id")
    val cand = qb.join(vb, Seq("table", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct()
    val scored = cand
      .join(vecs, "vec_id")
      .join(queries, "query_id")
      .select(col("query_id"), col("vec_id"),
        round(Cosine.cosine(col("qemb"), col("emb")), 6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
