package graft.ann

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the second scale path
  * beside [[HyperplaneLSH]]: a seeded k-means coarse quantizer assigns every
  * vector to a cell; a query scores only the vectors in its `nProbe` closest
  * cells, exactly (codegen'd dot product), then ranks top-k.
  *
  * At 100 TB the assignment is one broadcast-centroid map pass, the index is
  * just `(cell, vec)` — ideally written bucketed/partitioned BY cell so a
  * probe reads nProbe/nCells of the data — and the candidate join is a
  * bucket equi-join on cell id, never all-pairs. Centroids are trained on a
  * sample (k-means cost is O(sample·k·d)); the seeded fit keeps runs
  * reproducible.
  */
object IvfIndex {

  /** Train the coarse quantizer and assign each vector to its cell.
    * Returns (assignments: vec_id, emb, cell; centroids: cell, centroid). */
  def assign(vecs: DataFrame, nCells: Int, seed: Long = 42L): (DataFrame, DataFrame) = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val fv = vecs.withColumn("fv", array_to_vector(col("emb")))
    // few iterations + random init suffice: the coarse quantizer only has to
    // spread cells, not converge — recall comes from nProbe, not centroid
    // optimality (k-means|| init alone costs more passes than the fit)
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(5)
      .setInitMode("random")
      .setFeaturesCol("fv").setPredictionCol("cell").fit(fv)
    val assigned = model.transform(fv).select(col("vec_id"), col("emb"), col("cell"))
    val cents = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.toSeq) }
      .toDF("cell", "centroid")
    (assigned, cents)
  }

  /** Approximate top-k: probe the nProbe closest cells per query (cosine to
    * centroid), exact-rescore the cells' members, rank. The default probes
    * half the cells because the synthetic testdata is isotropic gaussian —
    * IVF's worst case (no cluster structure, neighbours scatter uniformly);
    * real embedding corpora cluster, where nProbe ≪ nCells recovers the
    * same recall at a fraction of the scan. */
  def approxTopK(vecs: DataFrame, queries: DataFrame, k: Int,
                 nCells: Int = 16, nProbe: Int = 8): DataFrame = {
    val spark = vecs.sparkSession
    import graft.functions.GraftFunctions.dot
    val (assigned, cents) = assign(vecs, nCells)
    val qcells = queries.crossJoin(broadcast(cents))
      .withColumn("cdist",
        -dot(spark, col("qemb"), col("centroid")) /
          (sqrt(dot(spark, col("qemb"), col("qemb"))) *
            sqrt(dot(spark, col("centroid"), col("centroid")))))
      .withColumn("prb", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cdist"), col("cell"))))
      .where(col("prb") <= nProbe)
      .select("query_id", "qemb", "cell")
    val vn = assigned.withColumn("nrm", sqrt(dot(spark, col("emb"), col("emb"))))
    val scored = qcells.join(vn, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("qnrm", sqrt(dot(spark, col("qemb"), col("qemb"))))
      .select(col("query_id"), col("vec_id"),
        round(when(col("qnrm") =!= 0.0 && col("nrm") =!= 0.0,
          dot(spark, col("qemb"), col("emb")) / (col("qnrm") * col("nrm"))), 6).as("cosine"))
      // no distinct needed: cells partition the corpus, so each (query, vec)
      // pair surfaces from exactly one probed cell
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
