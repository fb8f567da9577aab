package graft.retrieval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval via reciprocal-rank fusion (Cormack/Clarke/Buettcher,
  * SIGIR 2009): fuse a semantic ranking (embedding ANN) with a lexical one
  * (BM25) as score(q, i) = Σ_lists 1/(K + rank_list(q, i)) — the standard
  * first fusion a RAG/training-data retrieval stack reaches for, robust to
  * the two lists' incomparable score scales precisely because it only
  * consumes RANKS.
  *
  * Scale shape: the inputs are already top-k lists — |queries|·k rows each
  * — so the fusion is a full-outer equi-join plus a per-query window over
  * ≤2k candidates, metadata-sized relative to the retrieval passes that
  * produced the lists. No corpus-sized work happens here by construction.
  *
  * Cross-engine exactness (§6): ranks are integers; each contribution
  * 1/(K + rank) is one shared IEEE op DAG, 10dp-quantized
  * (round → +0.0 −0-canon, the BM25/Perplexity rule); the fused score adds
  * the two quantized terms as DECIMAL(25,10) (exact), ties break on
  * item_id, and the emitted double goes through the decimal so both
  * engines print identical bits.
  */
object Fusion {
  /** The K in 1/(K + rank) — 60 is the constant from the RRF paper. */
  val RrfK = 60

  /** Fuse two (query_id, item_id, rank) top-k lists into RRF top-k:
    * (query_id, item_id, sem_rank, lex_rank, rrf, rank). Items missing
    * from a list contribute 0 from it. */
  def rrf(sem: DataFrame, lex: DataFrame, k: Int = 10): DataFrame = {
    def contrib(rank: Column): Column = coalesce(
      round(lit(1.0) / (lit(RrfK).cast("double") + rank.cast("double")), 10) + lit(0.0),
      lit(0.0))
    val s = sem.select(col("query_id"), col("item_id"), col("rank").as("sem_rank"))
    val l = lex.select(col("query_id"), col("item_id"), col("rank").as("lex_rank"))
    val fused = s.join(l, Seq("query_id", "item_id"), "full_outer")
      .withColumn("sd",
        graft.sqlx.Exact.dec(contrib(col("sem_rank"))) +
          graft.sqlx.Exact.dec(contrib(col("lex_rank"))))
    val w = Window.partitionBy("query_id").orderBy(col("sd").desc, col("item_id"))
    fused.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("item_id"),
        col("sem_rank"), col("lex_rank"),
        col("sd").cast("double").as("rrf"), col("rank"))
  }
}
