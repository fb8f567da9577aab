package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Date-partitioned event store: the day-range read must prune to exactly
  * the selected days' directories at planning time (the layout's whole
  * point), and round-trip the data unchanged. */
class PartitionedStoreSpec extends SparkSpec {

  private val path = s"${sys.props("java.io.tmpdir")}/graft-events-bydate-spec"

  test("day-range scan reads only the selected partitions") {
    val ev = graft.Tables.events(spark, sf("sf0.001")).withColumn("date", col("ts").cast("date"))
    PartitionedTables.write(ev, path, Seq("date"))
    val nDays = ev.select("date").distinct().count()
    val sel = PartitionedTables.read(spark, path)
      .where(col("date").between(lit("2024-01-12").cast("date"), lit("2024-01-14").cast("date")))
    val expected = sel.collect().length.toLong // execute THIS plan so scan metrics populate
    assert(expected > 0 && nDays > 3, "fixture should span more days than the filter")
    val scans = graft.PlanCheck.allNodes(sel.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty && scans.head.partitionFilters.nonEmpty,
      "date filter did not become a partition filter")
    val partsRead = scans.head.metrics.get("numPartitions").map(_.value)
    assert(partsRead.contains(3L), s"read $partsRead partitions, expected 3 of $nDays")
    // round trip: same rows as filtering the source directly
    val direct = ev.where(col("date").between(lit("2024-01-12").cast("date"), lit("2024-01-14").cast("date")))
    assert(direct.count() == expected)
  }
}
