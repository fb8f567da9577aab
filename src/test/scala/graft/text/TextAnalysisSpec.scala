package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins the declared-small contract of [[TextAnalysis.eda]]'s unpartitioned
  * window (SURVEY §5.1 exception): the window's input is the per-SOURCE
  * aggregate, so its cardinality is the number of distinct sources — a
  * corpus-size-independent constant — never the document count. The
  * single-partition WindowExec warning the plan emits is therefore a false
  * positive; this spec is what makes that claim auditable. */
class TextAnalysisSpec extends SparkSpec {

  test("eda window input cardinality == distinct sources, not corpus rows") {
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
    val nSources = docs.select("source").distinct().count()
    val nDocs = docs.count()
    val out = TextAnalysis.eda(spark, dir)
    assert(out.count() == nSources)
    assert(nSources < 100, s"source cardinality $nSources is no longer tiny " +
      "— repartition the pct-of-total window before trusting this exception")
    assert(nDocs > nSources, "corpus must dwarf the grouped frame for the bound to mean anything")
  }

  test("pct_of_total sums to 1 over the grouped frame") {
    val total = TextAnalysis.eda(spark, sf("sf0.001"))
      .agg(sum(col("pct_of_total"))).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
  }
}
