package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the retrieval/RAG-side preparation
  * twin of [[Packing]]: where packing concatenates MANY documents into
  * fixed training windows, chunking splits EACH document into overlapping
  * fixed-size token windows so long documents can be embedded and indexed
  * piecewise (every token is covered; consecutive chunks share
  * `chunk - stride` tokens of context).
  *
  * Chunk starts are the stride multiples below the token count, so every
  * document yields at least one chunk and the last chunk is truncated at
  * the document end rather than padded.
  *
  * 100 TB shape: the whole operator is a narrow per-document projection +
  * explode — no shuffle, no state, trivially parallel over input splits.
  * The fan-out is bounded by tokens/stride chunks per document, so task
  * output stays proportional to input size times the overlap factor
  * (chunk/stride).
  */
object Chunking {

  /** One row per (document, window): token span `[start_token,
    * start_token + chunk_len)` and the chunk's text. `textCol` is
    * whitespace-tokenized with the corpus-wide convention (trim + single
    * split, cf. graft.text.Corpus). */
  def slidingWindows(docs: DataFrame, idCol: String, textCol: Column,
                     chunk: Int, stride: Int): DataFrame = {
    require(chunk > 0 && stride > 0 && stride <= chunk,
      s"need 0 < stride <= chunk, got chunk=$chunk stride=$stride")
    docs
      .select(col(idCol), split(trim(textCol), " ").as("_w"))
      .withColumn("_n", size(col("_w")))
      .withColumn("chunk_idx",
        explode(sequence(lit(0), ((col("_n") - 1) / stride).cast("int"))))
      .withColumn("start_token", col("chunk_idx") * stride)
      .withColumn("chunk_len", least(lit(chunk), col("_n") - col("start_token")))
      .withColumn("chunk_text",
        array_join(slice(col("_w"), col("start_token") + 1, col("chunk_len")), " "))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_token").cast("long").as("start_token"),
        col("chunk_len").cast("long").as("chunk_len"), col("chunk_text"))
  }
}
