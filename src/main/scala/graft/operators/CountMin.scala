package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) for token-frequency
  * estimation: `Depth` independent hash rows × `Width` counters; an item's
  * estimate is the MIN of its `Depth` cells, always ≥ the true count, with
  * overestimate bounded by (corpus size / Width) per row w.h.p.
  *
  * Why it earns a place next to the HLL/quantile sketches: the sketch is
  * FIXED-SIZE state (Depth×Width counters) no matter the corpus — the
  * 100 TB path for "how often does this token appear" when the distinct
  * token table itself is too large to keep exact. The build is one explode
  * (Depth rows per token occurrence) into a map-side-combinable count
  * aggregation on (row, cell); nothing in the build ever materializes the
  * distinct-token table.
  *
  * Hashes are the md5 ascii-mix family (graft.text.Dsir.bucketOf) with the
  * row index salted into the hashed string, so every engine computes the
  * same cells and the registered query is oracle-checked exactly.
  */
object CountMin {

  val Depth = 3
  val Width = 1024

  private val Mix = 131

  /** Cell index of token `t` in hash row `j`. */
  def cell(j: Column, t: Column): Column = {
    val h = md5(concat(j.cast("string"), lit(":"), t))
    ((ascii(substring(h, 1, 1)) * lit(Mix) + ascii(substring(h, 2, 1)))
      * lit(Mix) + ascii(substring(h, 3, 1))) % lit(Width)
  }

  /** The same cell arithmetic as ANSI SQL over expressions `j`, `t` — the
    * oracle mirror kept next to the implementation (and fed by the same
    * Depth/Width/Mix constants) so the two DAGs cannot drift. */
  def cellSql(j: String, t: String): String = {
    val h = s"md5(CAST($j AS VARCHAR) || ':' || $t)"
    s"((ascii(substr($h, 1, 1)) * $Mix + ascii(substr($h, 2, 1))) * $Mix + ascii(substr($h, 3, 1))) % $Width"
  }

  /** Build the sketch from a token stream: (j, cell, c) with at most
    * Depth×Width rows. */
  def sketch(toks: DataFrame, tokenCol: String): DataFrame =
    toks
      .select(col(tokenCol).as("t"), explode(expr(s"sequence(0, ${Depth - 1})")).as("j"))
      .select(col("j"), cell(col("j"), col("t")).as("cell"))
      .groupBy("j", "cell").agg(count(lit(1)).as("c"))

  /** Point-query the sketch for `probes` (column `t`): (t, cms_est). The
    * left join keeps probes whose cells are all empty (tokens never seen by
    * the sketch), which correctly estimate 0 — probes need not come from
    * the sketched stream. In-stream probes hit every cell, so for them the
    * left join is plan-equivalent to an inner join and the registered
    * oracle is unchanged. */
  def estimate(sk: DataFrame, probes: DataFrame): DataFrame =
    probes
      .select(col("t"), explode(expr(s"sequence(0, ${Depth - 1})")).as("j"))
      .select(col("t"), col("j"), cell(col("j"), col("t")).as("cell"))
      .join(sk, Seq("j", "cell"), "left")
      .groupBy("t").agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
}
