package graft.ann

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** IVF+PQ — the composed serving architecture (FAISS IndexIVFPQ): the
  * [[IvfIndex]] coarse quantizer prunes WHICH vectors a query even looks
  * at (nProbe of nCells cell partitions), and [[Pq]] codes compress WHAT
  * is scanned inside the probed cells (m small ints per vector, scored by
  * ADC lookups against a per-query LUT), with the top-`rerank` candidates
  * re-scored exactly against the raw vectors. The two index structures
  * multiply: at canonical production settings the probe reads
  * nProbe/nCells of the corpus and ADC touches m bytes instead of d
  * doubles per candidate — the combination that serves billion-vector
  * corpora from cluster memory.
  *
  * Codes here are PQ(raw vector), not PQ(residual) — FAISS's
  * `by_residual = false` variant. Residual coding quantizes finer at the
  * same code budget, but it couples every code to its cell's centroid;
  * with raw coding the codebooks are independent of the coarse quantizer,
  * so incremental cell appends ([[IvfIndex.appendToIndex]]) and even a
  * coarse-quantizer refit leave stored codes valid — the operationally
  * simpler index to maintain, and the exact-re-rank stage absorbs the
  * coarser approximation (ADC only has to get the candidate set right).
  *
  * Every stage reuses the deterministic arithmetic of its parent
  * ([[IvfIndex]] md5/DECIMAL k-means; [[Pq]] per-subspace fits and
  * 10-dp-quantized exact ADC sums), so the registered `ann_ivfpq` query
  * replays BOTH fits, the probe, the cell-restricted ADC and the re-rank
  * as one DuckDB oracle.
  *
  * Plan shape: both fits are bounded-sample jobs; assignment and encode
  * are one shared codegen map pass each; the LUT and centroid tables ride
  * broadcast joins; the only wide exchanges are the per-query candidate
  * windows — same as every ANN path here.
  */
object IvfPq {

  private def dec10(c: org.apache.spark.sql.Column) = c.cast(DecimalType(25, 10))

  /** ADC top-k over the probed cells only, then exact re-rank. Output
    * contract: (query_id, vec_id, cosine, rank), rank ≤ k. */
  def approxTopK(vecs: DataFrame, queries: DataFrame, k: Int, dim: Int,
                 nCells: Int = 16, nProbe: Int = 8,
                 m: Int = Pq.SubSpaces, codes: Int = Pq.Codes, rerank: Int = Pq.Rerank,
                 seed: Long = 42L, maxTrain: Int = 65536): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    import graft.functions.GraftFunctions.dot
    val sd = dim / m
    // coarse quantizer + cell assignment (shared contract with ann_ivf)
    val (assigned, cents) = IvfIndex.assign(vecs, nCells, seed, maxTrain)
    // global PQ codebooks + per-vector codes (shared contract with ann_pq)
    val cbs = Pq.fit(vecs, dim, m, codes, seed, maxTrain)
    val codeLong = Pq.encode(vecs, cbs).select(col("vec_id"),
      posexplode(array((0 until m).map(j => col(s"code_$j")): _*)).as(Seq("j", "code")))
      .join(assigned.select("vec_id", "cell"), Seq("vec_id"))
    // per-query LUT over the codebook-as-data frame (broadcast metadata)
    val cbDf = (for { j <- 0 until m; c <- 0 until codes }
      yield (j, c, cbs(j)(c).toSeq)).toDF("j", "code", "cent")
      .withColumn("cn2", round(dot(spark, col("cent"), col("cent")), 10))
    val lut = queries.crossJoin(broadcast(cbDf))
      .select(col("query_id"), col("j"), col("code"),
        round(dot(spark, slice(col("qemb"), col("j") * sd + 1, lit(sd)), col("cent")), 10)
          .as("pdot"),
        col("cn2"))
    // probe, then ADC restricted to the probed cells' members: the
    // (query, cell) pairs fan out to cell members via the cell equi-join
    // — candidate generation never touches an unprobed cell
    val qcells = IvfIndex.probeCells(queries, cents, nProbe)
      .select("query_id", "cell")
    val adc = qcells.join(codeLong, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .join(broadcast(lut), Seq("query_id", "j", "code"))
      .groupBy("query_id", "vec_id")
      .agg(sum(dec10(col("pdot"))).cast("double").as("adot"),
        sum(dec10(col("cn2"))).cast("double").as("rec2"))
    val qn = queries.select(col("query_id"),
      sqrt(dot(spark, col("qemb"), col("qemb"))).as("qnrm"), col("qemb"))
    val cand = adc.join(broadcast(qn), Seq("query_id"))
      .withColumn("approx", when(col("qnrm") =!= 0.0 && col("rec2") > 0.0,
        col("adot") / (col("qnrm") * sqrt(col("rec2")))))
      .withColumn("crk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("approx").desc, col("vec_id"))))
      .where(col("crk") <= rerank)
    val vn = vecs.withColumn("nrm", sqrt(dot(spark, col("emb"), col("emb"))))
    val rescored = cand.join(vn, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        round(when(col("qnrm") =!= 0.0 && col("nrm") =!= 0.0,
          dot(spark, col("qemb"), col("emb")) / (col("qnrm") * col("nrm"))), 6)
          .as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    rescored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
