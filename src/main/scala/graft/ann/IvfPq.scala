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

  /** One bounded sample collect → (coarse centroids, PQ codebooks): the
    * shared two-fit head of every IvfPq path (the oracle's single samp
    * CTE). Driver-fit regime only (nCells ≤ IvfIndex.DriverFitMaxCells);
    * a larger composed index wires [[IvfIndex.fitDistributed]] +
    * [[Pq.fitFromSample]] the same way. */
  private def fitBoth(vecs: DataFrame, dim: Int, nCells: Int, m: Int, codes: Int,
                      seed: Long, maxTrain: Int): (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    require(nCells <= IvfIndex.DriverFitMaxCells,
      s"single-collect IvfPq fit is for the driver regime (nCells <= ${IvfIndex.DriverFitMaxCells})")
    val sample = Pq.collectSample(vecs, seed, maxTrain)
    (IvfIndex.lloydExact(sample, nCells, seed, IvfIndex.Iters),
      Pq.fitFromSample(sample, dim, m, codes, seed))
  }

  /** One codegen projection computes the WHOLE index row: coarse cell +
    * m sub-codes per vector — no shuffle, no second pass. */
  private def indexRows(vecs: DataFrame, coarse: Array[Array[Double]],
                        cbs: Array[Array[Array[Double]]]): DataFrame = {
    val spark = vecs.sparkSession
    val sd = cbs(0)(0).length
    val codeCols = cbs.indices.map { j =>
      graft.functions.NearestCell.nearest(spark,
        slice(col("emb"), j * sd + 1, sd), cbs(j)).as(s"code_$j")
    }
    vecs.select(col("vec_id") +:
      graft.functions.NearestCell.nearest(spark, col("emb"), coarse).as("cell") +:
      codeCols: _*)
  }

  /** Materialize the index in the layout the header promises: the
    * PQ-coded rows written `partitionBy(cell)` — m small ints per vector
    * in the scan table, the raw vectors stay in the base table — with the
    * centroid and codebook metadata beside them. At 100 TB this is what
    * makes the composition real: a probe partition-prunes to
    * nProbe/nCells of an already-64×-compressed table, and the raw table
    * is touched only for the rerank·|queries| exact re-scores. */
  def writeIndex(vecs: DataFrame, path: String, dim: Int,
                 nCells: Int = 16, m: Int = Pq.SubSpaces, codes: Int = Pq.Codes,
                 seed: Long = 42L, maxTrain: Int = 65536): Unit = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val (coarse, cbs) = fitBoth(vecs, dim, nCells, m, codes, seed, maxTrain)
    indexRows(vecs, coarse, cbs)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    coarse.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$path/centroids")
    (for { j <- cbs.indices; c <- cbs(j).indices } yield (j, c, cbs(j)(c).toSeq))
      .toDF("j", "code", "cent")
      .write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Read the stored quantizer metadata back as arrays (cell- and
    * code-ordered) — driver-sized by construction. */
  private def readMeta(spark: org.apache.spark.sql.SparkSession,
                       path: String): (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val coarse = spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect()
      .map(r => r.getAs[Seq[Double]]("centroid").toArray)
    val cbRows = spark.read.parquet(s"$path/codebooks")
      .orderBy("j", "code").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getAs[Seq[Double]]("cent").toArray))
    val m = cbRows.map(_._1).max + 1
    val cbs = Array.tabulate(m)(j => cbRows.filter(_._1 == j).sortBy(_._2).map(_._3))
    (coarse, cbs)
  }

  /** Incremental index maintenance — [[IvfIndex.appendToIndex]]'s twin
    * for the composed index: arriving vectors are assigned AND PQ-coded
    * against the STORED metadata (fixed centroids and codebooks — FAISS's
    * add-after-train; raw coding means the codes don't even depend on the
    * assigned cell) in one codegen projection, then appended to their
    * cell partitions. O(increment) per ingest, no refit, no rewrite;
    * because every index column is a per-row function of the stored
    * metadata, append ≡ bulk-indexing the union with the same quantizer
    * (IvfPqSpec asserts it row-for-row). Drift limit as for IVF: enough
    * distribution shift ⇒ refit + [[writeIndex]] rebuild. */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    newVecs: DataFrame): Unit = {
    val (coarse, cbs) = readMeta(spark, path)
    indexRows(newVecs, coarse, cbs)
      .write.mode("append").partitionBy("cell").parquet(s"$path/codes")
  }

  /** Probe a stored index: centroids/codebooks are metadata reads, the
    * probed cells are pushed as a literal IN over the partition column
    * (planning-time pruning, like [[IvfIndex.approxTopKStored]]), ADC
    * runs over the pruned code rows, and only the surviving candidates
    * touch `vecs` (the raw base table) for the exact re-rank. Same
    * quantizer arithmetic ⇒ bit-identical to [[approxTopK]]. */
  def approxTopKStored(spark: org.apache.spark.sql.SparkSession, path: String,
                       vecs: DataFrame, queries: DataFrame, k: Int, dim: Int,
                       nProbe: Int = 8, rerank: Int = Pq.Rerank): DataFrame = {
    import graft.functions.GraftFunctions.dot
    val cents = spark.read.parquet(s"$path/centroids")
    val cbDf = spark.read.parquet(s"$path/codebooks")
      .withColumn("cn2", round(dot(spark, col("cent"), col("cent")), 10))
    val m = cbDf.agg(max("j")).head.getInt(0) + 1
    val qcells = IvfIndex.probeCells(queries, cents, nProbe)
      .select("query_id", "cell")
    val probed = qcells.select("cell").distinct().collect()
      .map(_.getInt(0)).sorted.toSeq
    val codeLong = spark.read.parquet(s"$path/codes")
      .where(col("cell").isin(probed: _*))
      .select(col("vec_id"), col("cell"),
        posexplode(array((0 until m).map(j => col(s"code_$j")): _*)).as(Seq("j", "code")))
    val lut = Pq.lutFor(queries, cbDf, dim / m)
    val pairs = qcells.join(codeLong, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .join(broadcast(lut), Seq("query_id", "j", "code"))
      .select("query_id", "vec_id", "pdot", "cn2")
    Pq.adcRankExact(vecs, queries, pairs, rerank, k)
  }

  /** ADC top-k over the probed cells only, then exact re-rank. Output
    * contract: (query_id, vec_id, cosine, rank), rank ≤ k. In-memory
    * variant of the [[writeIndex]]/[[approxTopKStored]] pair — same
    * arithmetic, no store. */
  def approxTopK(vecs: DataFrame, queries: DataFrame, k: Int, dim: Int,
                 nCells: Int = 16, nProbe: Int = 8,
                 m: Int = Pq.SubSpaces, codes: Int = Pq.Codes, rerank: Int = Pq.Rerank,
                 seed: Long = 42L, maxTrain: Int = 65536): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val (coarse, cbs) = fitBoth(vecs, dim, nCells, m, codes, seed, maxTrain)
    val cents = coarse.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "centroid")
    // the same one-pass index row as the stored layout, melted to long
    val codeLong = indexRows(vecs, coarse, cbs)
      .select(col("vec_id"), col("cell"),
        posexplode(array((0 until m).map(j => col(s"code_$j")): _*)).as(Seq("j", "code")))
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
