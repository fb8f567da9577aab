package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew property: one document 10⁴× larger than the window must fan out
  * into exactly its span of windows — the explode is per-row (rows, not a
  * buffered array of the giant doc's tokens), so a pathological document
  * costs output rows proportional to its length but never a
  * single-task memory blowup. */
class PackingSkewSpec extends SparkSpec {
  import spark.implicits._

  test("one doc >> windowSize x 10^4: fan-out count, contiguity, token accounting") {
    val ws = 512
    val giant = 10000L * ws + 37L // 5,120,037 tokens -> spans 10001 windows
    val docs = (Seq((1L, 100L), (2L, giant), (3L, 250L)) ++
      (4L to 60L).map(i => (i, (i * 13) % 400 + 1))).toDF("doc_id", "n_tokens")
    val out = Packing.packWindows(docs, "doc_id", "n_tokens", ws)
      .persist()

    val rows = out.where(col("doc_id") === 2L)
      .orderBy("window_id")
      .select("window_id", "tokens_in_window", "start_offset")
      .collect()
    // giant doc starts at offset 100 -> windows 0 .. (100+giant-1)/ws
    val first = 100L / ws
    val last = (100L + giant - 1) / ws
    assert(rows.length == (last - first + 1),
      s"fan-out ${rows.length} != ${last - first + 1}")
    assert(rows.map(_.getLong(0)).toSeq == (first to last),
      "giant doc's windows must be contiguous")
    assert(rows.map(_.getLong(1)).sum == giant, "tokens_in_window must sum to n_tokens")
    assert(rows.forall(_.getLong(1) <= ws))
    assert(rows.forall(_.getLong(2) == 100L), "start_offset is per-doc, not per-window")

    // docs after the giant start exactly giant tokens later
    val off3 = out.where(col("doc_id") === 3L).select("start_offset").head().getLong(0)
    assert(off3 == 100L + giant)
    out.unpersist()
  }
}
