package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary induction (Sennrich et al. 2016): learn the
  * first `nMerges` byte-pair merges from the corpus word-frequency table.
  *
  * Spark-first shape: the corpus collapses to a (word, freq) table in one
  * groupBy — at 100 TB that table is millions of rows, not the corpus size,
  * and it is the ONLY thing the iteration touches. Each round is one
  * distributed pass: explode adjacent symbol pairs weighted by word
  * frequency, aggregate pair counts, take the argmax (a 1-row collect —
  * metadata, like the packing offsets), and apply the merge to every word's
  * symbol array with a codegen-free but distributed `aggregate` fold. The
  * merge decision is deterministic: count DESC, then pair lexicographic.
  *
  * The merge table is the training artifact (what a tokenizer ships);
  * applying it to new text is the already-covered tokenization path.
  * No SQL oracle — k data-dependent argmax rounds aren't expressible
  * declaratively — so BpeSpec differential-tests the merge sequence against
  * an independent single-node reference implementation.
  */
object Bpe {

  /** (step, left, right, merged, pair_count) for the first `nMerges`
    * merges learned from `docs`(textCol). */
  def merges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // word-frequency table: the working set for every round
    val base = docs
      .select(explode(split(trim(col(textCol)), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      // initial symbols: one per character
      .select(col("freq"),
        expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))").as("syms"))
      .persist()
    base.count()

    // The merges are sequentially dependent (each argmax needs the previous
    // round's table), but the merge APPLICATION need not be materialized per
    // round: chain it lazily onto the working frame and only persist+count
    // every `ckptEvery` rounds to bound the nested-fold expression depth.
    // Cuts the per-round job count from 2 to ~1.3 — at 100 TB each job is a
    // full pass over the vocab table, so fewer passes is the win, not a
    // local-mode scheduling trick.
    val ckptEvery = 3
    var persisted = base  // last materialized ancestor (owns a cache slot)
    var vocab = base      // current frame: persisted + <chainDepth> lazy merges
    var chainDepth = 0

    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      val top = vocab
        // single-symbol words have no adjacent pairs (and sequence(0,-1)
        // would walk backwards into a negative index under ANSI)
        .where(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] as l, syms[i+1] as r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((step, l, r, l + r, cnt))
        val merged = vocab.select(col("freq"), applyMerge(l, r).as("syms"))
        chainDepth += 1
        step += 1
        // last round's merge result is never read — skip its materialization
        if (chainDepth >= ckptEvery && step < nMerges) {
          val p = merged.persist()
          p.count()
          persisted.unpersist()
          persisted = p
          vocab = p
          chainDepth = 0
        } else vocab = merged
      }
    }
    persisted.unpersist()
    out.result().toDF("step", "left", "right", "merged", "pair_count")
  }

  /** Left-to-right single-pass merge of (l, r) inside a `syms` column: fold
    * symbols, joining a pending `l` with a following `r`. */
  private def applyMerge(l: String, r: String): org.apache.spark.sql.Column = {
    def q(s: String): String = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    expr(
      s"""filter(concat(
         |  aggregate(syms, array(CAST(NULL AS STRING)),
         |    (acc, s) -> CASE
         |      WHEN element_at(acc, -1) = ${q(l)} AND s = ${q(r)}
         |        THEN concat(slice(acc, 1, size(acc) - 1), array(${q(l + r)}))
         |      ELSE concat(acc, array(s)) END),
         |  array()), s -> s IS NOT NULL)""".stripMargin.replaceAll("\n", " "))
  }

  /** Tokenize every distinct word with an already-learned ordered merge
    * list — the APPLY half of the tokenizer (merges() is the learn half).
    * Sennrich encode: each merge is applied everywhere in the word, in
    * learned order, via the same fold as training.
    *
    * 100 TB shape: the input is the DISTINCT word table (millions of rows,
    * never the corpus); each word is segmented once and the result joins
    * back to documents by word. The merge list is metadata (k rows,
    * collected by the caller); merge applications chain lazily with the
    * same every-3rd-round materialization as training, so the pass count
    * stays ~k/3 over the word table. */
  def encodeWords(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val ckptEvery = 3
    var cur = words
      .select(col("word"),
        expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))").as("syms"))
    var persisted: Option[DataFrame] = None
    var chainDepth = 0
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      cur = cur.select(col("word"), applyMerge(l, r).as("syms"))
      chainDepth += 1
      if (chainDepth >= ckptEvery && i < merges.size - 1) {
        val p = cur.persist()
        p.count()
        persisted.foreach(_.unpersist())
        persisted = Some(p)
        cur = p
        chainDepth = 0
      }
    }
    // materialize via localCheckpoint (same lifecycle as
    // ConnectedComponents' rounds): the result owns its blocks — reclaimed
    // when the frame is dropped — and every intermediate persist is
    // released HERE, so repeat callers pin nothing across calls
    val out = cur.select(col("word"), col("syms").as("subwords"),
      size(col("syms")).cast("long").as("n_subwords"))
      .localCheckpoint()
    persisted.foreach(_.unpersist())
    out
  }
}
