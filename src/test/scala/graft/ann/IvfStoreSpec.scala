package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Stored IVF index (IvfIndex.writeIndex / approxTopKStored): the probe must
  * read ONLY the probed cells' partition directories — the storage-layout
  * pruning the operator's header promises for 100 TB — and return exactly
  * what the in-memory path returns (same seed ⇒ same quantizer ⇒ same
  * answer, so the stored path is a pure physical rewrite). */
class IvfStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = graft.Tables.embeddings(spark, sf("sf0.001"))
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
  private lazy val q = e.where(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
  private val path = s"${sys.props("java.io.tmpdir")}/graft-ivf-spec"

  test("stored probe returns exactly the in-memory approxTopK answer") {
    IvfIndex.writeIndex(e, path)
    val stored = IvfIndex.approxTopKStored(spark, path, q, k = 10)
      .select("query_id", "vec_id", "cosine", "rank")
    val mem = IvfIndex.approxTopK(e, q, k = 10)
      .select("query_id", "vec_id", "cosine", "rank")
    assert(stored.count() > 0)
    assert(stored.exceptAll(mem).isEmpty && mem.exceptAll(stored).isEmpty,
      "stored probe diverges from the in-memory path")
  }

  test("probe scan is partition-pruned to the probed cells only") {
    IvfIndex.writeIndex(e, path, nCells = 8)
    val one = q.orderBy("query_id").limit(1)
    val probe = IvfIndex.approxTopKStored(spark, path, one, k = 5, nProbe = 2)
    probe.collect()
    val scans = graft.PlanCheck.allNodes(probe.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("graft-ivf-spec/assigned")) => f }
    assert(scans.nonEmpty, "no file scan over the stored index found")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty, "no partition filter pushed to the index scan")
    val partsRead = scan.metrics.get("numPartitions").map(_.value)
    assert(partsRead.contains(2L),
      s"probe read $partsRead partitions, expected exactly the 2 probed cells")
  }
}
