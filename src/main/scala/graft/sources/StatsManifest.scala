package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Per-file min/max statistics manifest — the file-skipping half of the
  * z-order story (Delta file stats / Iceberg manifests): after
  * [[graft.operators.ZOrder]] clusters a table so every file has a tight
  * bounding box in the scan dimensions, something has to TURN those boxes
  * into skipped IO. This manifest is that something: one row per (file,
  * column) with min/max/rows/nulls harvested from the parquet FOOTERS — a
  * metadata job whose cost is O(#files), not O(bytes); no data page is
  * ever read. A box-shaped predicate then resolves to the file list whose
  * boxes intersect it, and the scan reads only those files, with the full
  * predicate re-applied inside — pruning is a pure IO optimization, never
  * a correctness dependency (a file with missing stats is conservatively
  * kept).
  *
  * At cluster scale the footer harvest fans out over executors (files are
  * partitioned across tasks; the Hadoop conf rides along Writable-
  * serialized), the manifest itself is rows = files × columns — metadata-
  * sized relative to the data, exactly like Iceberg's manifest files — and
  * pruning evaluates on that small frame before any big-table IO is
  * scheduled. The manifest is rebuilt per ingest generation (or
  * incrementally unioned per appended file — build is per-file
  * independent, so appending = harvesting only the new files).
  *
  * Stats are normalized to DOUBLE, which is exact for the integer/date
  * scan dimensions (< 2^53) and the float/double ones this engine z-orders
  * by; truncated string stats (which parquet footers may carry) are out of
  * scope and reported as stat-less rows.
  */
object StatsManifest {

  /** Hadoop Configuration is not java-serializable; it IS Writable. */
  private class SerConf(@transient var conf: Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject(); conf = new Configuration(false); conf.readFields(in)
    }
  }

  private def num(v: Comparable[_]): Option[Double] = v match {
    case i: java.lang.Integer => Some(i.toDouble)
    case l: java.lang.Long    => Some(l.toDouble)
    case f: java.lang.Float   => Some(f.toDouble)
    case d: java.lang.Double  => Some(d)
    case _                    => None
  }

  /** One manifest row per (file, column in `cols`): aggregated over the
    * file's row groups. `vmin`/`vmax` are null when any row group lacks
    * usable stats for the column (the conservative no-prune marker). */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    import spark.implicits._
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
    val sc = new SerConf(spark.sparkContext.hadoopConfiguration)
    val want = cols.toSet
    val slices = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    spark.sparkContext.parallelize(files, slices).flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), sc.conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val perCol = blocks.flatMap { b =>
          b.getColumns.asScala
            .filter(c => want(c.getPath.toDotString))
            .map(c => (c.getPath.toDotString, b.getRowCount, c.getStatistics))
        }
        perCol.groupBy(_._1).map { case (colName, chunks) =>
          val rows = chunks.map(_._2).sum
          val stats = chunks.map(_._3)
          val ok = stats.forall(s => s != null && s.hasNonNullValue) &&
            stats.forall(s => num(s.genericGetMin).isDefined && num(s.genericGetMax).isDefined)
          val (mn, mx) =
            if (ok) (Some(stats.map(s => num(s.genericGetMin).get).min),
                     Some(stats.map(s => num(s.genericGetMax).get).max))
            else (None, None)
          // definite only when EVERY row group reports a null count — a
          // partial sum would be reported as exact while undercounting
          val nulls = if (stats.forall(s => s != null && s.isNumNullsSet))
                        Some(stats.map(_.getNumNulls).sum)
                      else None
          (f.split('/').last, colName, rows, mn, mx, nulls)
        }
      } finally reader.close()
    }.toDF("file", "column", "n_rows", "vmin", "vmax", "n_nulls")
  }

  /** Files whose [vmin, vmax] box intersects every (col, lo, hi) range —
    * plus any file lacking stats for a predicate column (never prune on
    * missing metadata). `allFiles` is the DIRECTORY's file universe, not
    * the manifest's: a data file with no manifest row yet (appended since
    * the last harvest) must be conservatively kept, or its rows silently
    * vanish — only a positive stats verdict may exclude a file. Returns a
    * metadata-sized file list. */
  def prunedFiles(manifest: DataFrame, allFiles: Seq[String],
                  ranges: Seq[(String, Double, Double)]): Seq[String] = {
    val excluded = ranges.map { case (c, lo, hi) =>
      manifest.where(col("column") === c && col("vmin").isNotNull &&
        (col("vmax") < lo || col("vmin") > hi))
        .select("file")
    }.reduce(_ unionByName _)
      .collect().map(_.getString(0)).toSet
    allFiles.filterNot(excluded).sorted
  }

  /** The directory's parquet file universe (names only). */
  def listFiles(spark: SparkSession, dir: String): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName)
  }

  /** Manifest-pruned scan: read only the intersecting files and re-apply
    * the exact predicate (`residual`) — bit-identical to the full scan by
    * construction, minus the skipped IO. */
  def readPruned(spark: SparkSession, dir: String, manifest: DataFrame,
                 ranges: Seq[(String, Double, Double)], residual: Column): DataFrame = {
    val files = prunedFiles(manifest, listFiles(spark, dir), ranges).map(f => s"$dir/$f")
    if (files.isEmpty) spark.read.parquet(dir).where(lit(false))
    else spark.read.parquet(files: _*).where(residual)
  }

  /** Metadata-only COUNT pushdown (Snowflake/Iceberg's "answer it from the
    * manifest" aggregation): a box predicate splits the file universe
    * three ways —
    *   - OUTSIDE (some column's box disjoint from its range): 0 matches;
    *   - INTERIOR (EVERY predicate column's box lies fully inside its
    *     range AND the column has a definite zero null count — a null
    *     never satisfies a range predicate, so an unknown or non-zero
    *     null count disqualifies metadata counting);
    *   - BOUNDARY: everything else.
    * Interior files contribute their footer row counts with ZERO data IO;
    * only boundary files are scanned with the exact predicate. On a
    * clustered layout (z-order / range-partitioned) the interior is the
    * bulk of the intersecting set, so a 100 TB filtered COUNT reads a
    * sliver of data. Files absent from the manifest are boundary
    * (conservative, like [[prunedFiles]]). Returns (count, interior
    * files, boundary files) — pruning is IO-only: the count is
    * bit-identical to the full scan by construction. */
  def countPruned(spark: SparkSession, dir: String, manifest: DataFrame,
                  ranges: Seq[(String, Double, Double)]): (Long, Seq[String], Seq[String]) = {
    // The boundary-scan predicate is DERIVED from `ranges` — footer counts
    // for interior files are only bit-identical to a full scan when the
    // scanned predicate is exactly the conjunction of the same boxes, so
    // taking a caller-supplied residual here would make any extra conjunct
    // a silent overcount (round-13 advisory). Double literals compare
    // exactly against integral columns up to 2^53 — the manifest's
    // vmin/vmax already live in the same double domain.
    val residual: Column = ranges
      .map { case (c, lo, hi) => col(c) >= lit(lo) && col(c) <= lit(hi) }
      .reduce(_ && _)
    val all = listFiles(spark, dir)
    val cols = ranges.map(_._1)
    // metadata-sized collect: one row per (file, predicate column)
    val stats: Map[(String, String), (Long, Option[Double], Option[Double], Option[Long])] =
      manifest.where(col("column").isin(cols: _*))
        .select("file", "column", "n_rows", "vmin", "vmax", "n_nulls")
        .collect().map { r =>
          (r.getString(0), r.getString(1)) ->
            ((r.getLong(2),
              if (r.isNullAt(3)) None else Some(r.getDouble(3)),
              if (r.isNullAt(4)) None else Some(r.getDouble(4)),
              if (r.isNullAt(5)) None else Some(r.getLong(5))))
        }.toMap
    def classify(f: String): Int = { // 0 outside, 1 interior, 2 boundary
      val per = ranges.map { case (c, lo, hi) => (stats.get((f, c)), lo, hi) }
      if (per.exists { case (s, lo, hi) =>
            s.exists { case (_, mn, mx, _) =>
              mn.isDefined && mx.isDefined && (mx.get < lo || mn.get > hi) } }) 0
      else if (per.forall { case (s, lo, hi) =>
            s.exists { case (_, mn, mx, nn) =>
              mn.isDefined && mx.isDefined && nn.contains(0L) &&
                mn.get >= lo && mx.get <= hi } }) 1
      else 2
    }
    val byClass = all.groupBy(classify)
    val interior = byClass.getOrElse(1, Seq.empty).sorted
    val boundary = byClass.getOrElse(2, Seq.empty).sorted
    val metaCount = interior.map(f => stats((f, cols.head))._1).sum
    val scanned =
      if (boundary.isEmpty) 0L
      else spark.read.parquet(boundary.map(f => s"$dir/$f"): _*).where(residual).count()
    (metaCount + scanned, interior, boundary)
  }
}
