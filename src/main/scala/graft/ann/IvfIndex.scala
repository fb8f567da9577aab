package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the second scale path
  * beside [[HyperplaneLSH]]: a coarse quantizer assigns every vector to a
  * cell; a query scores only the vectors in its `nProbe` closest cells,
  * exactly (codegen'd dot product), then ranks top-k.
  *
  * The quantizer is trained FAISS-style: a bounded, deterministic,
  * content-hash sample of the corpus is collected to the driver and Lloyd's
  * iterations run locally (k-means cost is O(sample·k·d) and a coarse
  * quantizer only has to spread cells — recall comes from nProbe, not
  * centroid optimality). Distributing the fit (MLlib) spends more time on
  * per-iteration job scheduling than the arithmetic itself, at every scale:
  * the sample is capped, so driver memory is bounded at 100 TB too.
  *
  * Assignment is then ONE map pass with the centroid table in the task
  * closure (k·d doubles — a few KB). The per-row argmin is a UDF by choice:
  * its body IS the k·d distance arithmetic, so codegen'd expression trees
  * would save only the row-boundary overhead. At 100 TB the index is just
  * `(cell, vec)` written partitioned BY cell ([[writeIndex]]) so a probe
  * ([[approxTopKStored]]) reads nProbe/nCells of the data via partition
  * pruning — and the candidate join is a cell equi-join, never all-pairs.
  */
object IvfIndex {

  /** Train the coarse quantizer on a ~≤maxTrain deterministic sample and
    * assign each vector to its cell. The stride derives from one cheap
    * count() of the key column (columnar scan of a single int column; an
    * index build amortizes it — callers that already know the corpus size
    * can pre-count and cache).
    * Returns (assignments: vec_id, emb, cell; centroids: cell, centroid). */
  def assign(vecs: DataFrame, nCells: Int, seed: Long = 42L,
             maxTrain: Int = 65536): (DataFrame, DataFrame) = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val total = vecs.count()
    // ceil: a floor stride of total/maxTrain keeps up to 2*maxTrain-1 rows
    // (e.g. total = 2*maxTrain - 1 -> stride 1 keeps everything)
    val stride = math.max(1L, (total + maxTrain - 1) / maxTrain)
    // content-hash stride: the training set is a pure function of the data
    // and seed, independent of partitioning and row order
    val sample = vecs
      .where(pmod(xxhash64(col("vec_id"), lit(seed)), lit(stride)) === 0L)
      .select(col("vec_id"), col("emb"))
      .as[(Long, Seq[Double])].collect()
      .sortBy(_._1).map(_._2.toArray)
    val centroids = lloyd(sample, nCells, seed, iters = 5)
    val nearest = udf { (emb: Seq[Double]) =>
      val x = emb.toArray
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val ce = centroids(c)
        var d2 = 0.0
        var i = 0
        while (i < ce.length) { val df = x(i) - ce(i); d2 += df * df; i += 1 }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      best
    }
    val assigned = vecs.select(col("vec_id"), col("emb"), nearest(col("emb")).as("cell"))
    val cents = centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "centroid")
    (assigned, cents)
  }

  /** Seeded local Lloyd's: init = k shuffled sample points, empty cells keep
    * their centroid. Deterministic for a given (sample, k, seed). */
  private def lloyd(xs: Array[Array[Double]], k: Int, seed: Long,
                    iters: Int): Array[Array[Double]] = {
    require(xs.nonEmpty, "empty quantizer training sample")
    val d = xs(0).length
    val rnd = new scala.util.Random(seed)
    var cents = rnd.shuffle(xs.indices.toVector)
      .take(math.min(k, xs.length)).map(i => xs(i).clone).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cents.length)(new Array[Double](d))
      val cnts = new Array[Long](cents.length)
      xs.foreach { x =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          val ce = cents(c)
          var d2 = 0.0
          var i = 0
          while (i < d) { val df = x(i) - ce(i); d2 += df * df; i += 1 }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        cnts(best) += 1
        val s = sums(best)
        var i = 0
        while (i < d) { s(i) += x(i); i += 1 }
      }
      cents = Array.tabulate(cents.length) { c =>
        if (cnts(c) == 0L) cents(c)
        else {
          val s = sums(c)
          val out = new Array[Double](d)
          var i = 0
          while (i < d) { out(i) = s(i) / cnts(c); i += 1 }
          out
        }
      }
      it += 1
    }
    cents
  }

  /** Probed (query, cell) pairs: the nProbe closest centroids per query by
    * cosine — a broadcast cross of the driver-sized centroid table. */
  private def probeCells(queries: DataFrame, cents: DataFrame, nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    import graft.functions.GraftFunctions.dot
    queries.crossJoin(broadcast(cents))
      .withColumn("cdist",
        -dot(spark, col("qemb"), col("centroid")) /
          (sqrt(dot(spark, col("qemb"), col("qemb"))) *
            sqrt(dot(spark, col("centroid"), col("centroid")))))
      .withColumn("prb", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cdist"), col("cell"))))
      .where(col("prb") <= nProbe)
      .select("query_id", "qemb", "cell")
  }

  /** Exact re-score of the probed cells' members + per-query top-k. */
  private def rescoreTopK(qcells: DataFrame, assigned: DataFrame, k: Int): DataFrame = {
    val spark = assigned.sparkSession
    import graft.functions.GraftFunctions.dot
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

  /** Approximate top-k: probe the nProbe closest cells per query (cosine to
    * centroid), exact-rescore the cells' members, rank. The default probes
    * half the cells because the synthetic testdata is isotropic gaussian —
    * IVF's worst case (no cluster structure, neighbours scatter uniformly);
    * real embedding corpora cluster, where nProbe ≪ nCells recovers the
    * same recall at a fraction of the scan — demonstrated by
    * IvfClusteredRecallSpec (recall@10 ≥ 0.9 at nProbe 4 of 32 on a seeded
    * gaussian mixture). */
  def approxTopK(vecs: DataFrame, queries: DataFrame, k: Int,
                 nCells: Int = 16, nProbe: Int = 8): DataFrame = {
    val (assigned, cents) = assign(vecs, nCells)
    rescoreTopK(probeCells(queries, cents, nProbe), assigned, k)
  }

  /** Materialize the index in the layout the header promises: assignments
    * written `partitionBy(cell)` (one directory per cell) with the centroid
    * table beside them. A stored probe then reads only the probed cells'
    * files — at 100 TB the probe scan is nProbe/nCells of the index, not a
    * reshuffle of the whole assigned-vector frame per query batch. */
  def writeIndex(vecs: DataFrame, path: String, nCells: Int = 16,
                 seed: Long = 42L, maxTrain: Int = 65536): Unit = {
    val (assigned, cents) = assign(vecs, nCells, seed, maxTrain)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$path/assigned")
    cents.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Probe a stored index. The union of probed cells is collected first —
    * bounded by nCells, i.e. centroid metadata, never data — and pushed as
    * a literal IN over the partition column, so Spark's partition pruning
    * drops every unprobed cell directory at planning time (asserted by
    * IvfStoreSpec on the scan's partition count). */
  def approxTopKStored(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, k: Int, nProbe: Int = 8): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    val qcells = probeCells(queries, cents, nProbe)
    val probed = qcells.select("cell").distinct().collect()
      .map(_.getInt(0)).sorted.toSeq
    val assigned = spark.read.parquet(s"$path/assigned")
      .where(col("cell").isin(probed: _*))
    rescoreTopK(qcells, assigned, k)
  }
}
