package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The index-delete contract (IvfPq.deleteFromIndex), at the file level
  * where the oracle can't see:
  *   - delete ≡ writeIndex(full) with the deleted rows filtered — same
  *     codes, same cells, same quantizer (raw PQ codes are per-row);
  *   - UNAFFECTED cell partitions are byte-identical (O(affected) IO);
  *   - a cell whose last vector is deleted leaves the partition layout
  *     and probing it just yields nothing;
  *   - a replayed delete (same incrementId) is a ledger no-op;
  *   - the probe never returns a deleted id.
  */
class IvfPqForgetSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = graft.Tables.embeddings(spark, sf("sf0.01"))
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
  private lazy val q = e.where(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("query_id"), col("emb").as("qemb"))

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def cellFiles(path: String): Map[String, Set[String]] = {
    val codes = new org.apache.hadoop.fs.Path(s"$path/codes")
    fs.listStatus(codes).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .map { st =>
        st.getPath.getName -> fs.listStatus(st.getPath)
          .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}").toSet
      }.toMap
  }

  private def codeRows(spark: org.apache.spark.sql.SparkSession, path: String): Set[String] =
    spark.read.option("basePath", s"$path/codes").parquet(s"$path/codes")
      .collect().map(_.mkString("|")).toSet

  test("delete rewrites only the affected cells and equals a filtered rebuild") {
    val path = s"${sys.props("java.io.tmpdir")}/graft-ivfpq-forget-spec"
    IvfPq.writeIndex(e, path, dim = 64)
    val before = cellFiles(path)
    // the request: a handful of ids confined to FEW cells — materialized
    // BEFORE the delete (a lazy plan over the store would re-probe it
    // mid-mutation, with the commit marker legitimately down)
    val victimIds = IvfPq.approxTopKStored(spark, path, e, q.limit(1), k = 5, dim = 64)
      .select("vec_id").distinct().as[Long].collect().toSet
    val victims = victimIds.toSeq.sorted.toDF("vec_id")
    assert(victimIds.nonEmpty)
    val affectedCells = spark.read.option("basePath", s"$path/codes")
      .parquet(s"$path/codes")
      .where(col("vec_id").isin(victimIds.toSeq: _*))
      .select("cell").distinct().as[Int].collect().toSet
    assert(IvfPq.deleteFromIndex(spark, path, victims, incrementId = 1L))
    val after = cellFiles(path)
    affectedCells.foreach { c =>
      assert(after.get(s"cell=$c") != before.get(s"cell=$c"),
        s"affected cell $c must be rewritten")
    }
    (before.keySet -- affectedCells.map(c => s"cell=$c")).foreach { dir =>
      assert(after(dir) == before(dir), s"unaffected $dir was rewritten")
    }
    // delete ≡ rebuild-on-survivors with the same (full-history) quantizer:
    // code rows are per-row functions of the stored metadata
    val ref = s"${sys.props("java.io.tmpdir")}/graft-ivfpq-forget-ref"
    IvfPq.writeIndex(e, ref, dim = 64)
    val expect = codeRows(spark, ref)
      .filterNot(r => victimIds.exists(id => r.startsWith(s"$id|")))
    assert(codeRows(spark, path) == expect)
    // the probe never returns a deleted id
    val got = IvfPq.approxTopKStored(spark, path, e, q, k = 10, dim = 64)
      .select("vec_id").as[Long].collect().toSet
    assert((got intersect victimIds).isEmpty)
    // a replayed delete is a ledger no-op (false), files untouched
    assert(!IvfPq.deleteFromIndex(spark, path, victims, incrementId = 1L))
    assert(cellFiles(path) == after)
  }

  test("deleting a cell's last vector drops the partition; probes keep working") {
    val path = s"${sys.props("java.io.tmpdir")}/graft-ivfpq-forget-empty"
    IvfPq.writeIndex(e, path, dim = 64, nCells = 4)
    val codes = spark.read.option("basePath", s"$path/codes").parquet(s"$path/codes")
    val cellCounts = codes.groupBy("cell").count().as[(Int, Long)].collect().toMap
    val victimCell = cellCounts.minBy(_._2)._1
    val victimIdsSeq = codes.where(col("cell") === victimCell)
      .select("vec_id").as[Long].collect().toSeq.sorted
    val victims = victimIdsSeq.toDF("vec_id")
    assert(IvfPq.deleteFromIndex(spark, path, victims, incrementId = 1L))
    assert(!cellFiles(path).contains(s"cell=$victimCell"),
      "an emptied cell must leave the partition layout")
    // probing with every cell reachable still works and returns no victim
    val victimIds = victimIdsSeq.toSet
    val got = IvfPq.approxTopKStored(spark, path, e, q, k = 10, dim = 64, nProbe = 4)
    assert(got.count() > 0)
    assert((got.select("vec_id").as[Long].collect().toSet intersect victimIds).isEmpty)
  }

  test("storedIds audits the served membership exactly and refuses an uncommitted store") {
    // the compliance read behind forget_cascade_full: after a delete, the
    // committed codes hold precisely base-minus-victims — count AND ids
    val path = s"${sys.props("java.io.tmpdir")}/graft-ivfpq-storedids-spec"
    IvfPq.writeIndex(e, path, dim = 64)
    val all = e.select("vec_id").as[Long].collect().toSet
    assert(IvfPq.storedIds(spark, path).select("vec_id").as[Long].collect().toSet == all)
    val victims = all.filter(_ % 7 == 3)
    assert(IvfPq.deleteFromIndex(
      spark, path, victims.toSeq.toDF("vec_id"), incrementId = 1L))
    assert(IvfPq.storedIds(spark, path).select("vec_id").as[Long].collect().toSet ==
      all -- victims)
    // a store mid-mutation (no commit marker) cannot witness anything
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_index_commit"), false)
    val ex = intercept[IllegalArgumentException] { IvfPq.storedIds(spark, path) }
    assert(ex.getMessage.contains("_index_commit"))
  }
}
