package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** ADC top-k over the probed cells only, then exact re-rank. Output
    * contract: (query_id, vec_id, cosine, rank), rank ≤ k.
    *
    * Single-collect fit: ONE md5-stride sample collect serves the coarse
    * quantizer AND all m codebooks — exactly the oracle's one `samp` CTE —
    * instead of IvfIndex.assign and Pq.fit each paying their own corpus
    * count + sample scan. This path requires the driver-fit regime
    * (nCells ≤ IvfIndex.DriverFitMaxCells); a larger composed index wires
    * [[IvfIndex.fitDistributed]] + [[Pq.fitFromSample]] the same way. */
  def approxTopK(vecs: DataFrame, queries: DataFrame, k: Int, dim: Int,
                 nCells: Int = 16, nProbe: Int = 8,
                 m: Int = Pq.SubSpaces, codes: Int = Pq.Codes, rerank: Int = Pq.Rerank,
                 seed: Long = 42L, maxTrain: Int = 65536): DataFrame = {
    require(nCells <= IvfIndex.DriverFitMaxCells,
      s"single-collect IvfPq fit is for the driver regime (nCells <= ${IvfIndex.DriverFitMaxCells})")
    val spark = vecs.sparkSession
    import spark.implicits._
    // one bounded sample collect -> both fits (same arithmetic as the
    // separate IvfIndex.assign / Pq.fit paths, so the shared oracle holds)
    val sample = Pq.collectSample(vecs, seed, maxTrain)
    val coarse = IvfIndex.lloydExact(sample, nCells, seed, IvfIndex.Iters)
    val cbs = Pq.fitFromSample(sample, dim, m, codes, seed)
    val cents = coarse.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "centroid")
    // one codegen map pass assigns cells; codes join on vec_id (the stored
    // index layout would carry cell + codes in one row)
    val assigned = vecs.select(col("vec_id"),
      graft.functions.NearestCell.nearest(spark, col("emb"), coarse).as("cell"))
    val codeLong = Pq.codesLong(vecs, cbs).join(assigned, Seq("vec_id"))
    // probe, then ADC restricted to the probed cells' members: the
    // (query, cell) pairs fan out to cell members via the cell equi-join
    // — candidate generation never touches an unprobed cell
    val qcells = IvfIndex.probeCells(queries, cents, nProbe)
      .select("query_id", "cell")
    val lut = Pq.lutFor(queries, Pq.codebookDf(spark, cbs), dim / m)
    val pairs = qcells.join(codeLong, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .join(broadcast(lut), Seq("query_id", "j", "code"))
      .select("query_id", "vec_id", "pdot", "cn2")
    Pq.adcRankExact(vecs, queries, pairs, rerank, k)
  }
}
