package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator query: the Spark implementation plus (when the
  * semantics are SQL-expressible) the DuckDB oracle the driver replays.
  * Oracle-less entries get the driver's weaker rows-only check and are
  * covered by ScalaTest golden specs instead (SURVEY.md §6).
  *
  * `oracleGen` is the context-dependent variant: SQL that can only be
  * written against session state — the model-scored queries serialize the
  * fitted GBT's trees into the oracle (model-as-constant, exactly how a
  * deployed model is a constant of the scoring query), so the text needs
  * the (session, sfDir) the model was fitted in. Verify resolves these
  * AFTER the queries ran, against the same memoized fit the dumps came
  * from — a generator that throws degrades that entry to rows-only
  * instead of aborting the sweep.
  */
final case class Q(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleGen: Option[(SparkSession, String) => String] = None)

object Q {
  def apply(run: (SparkSession, String) => DataFrame, oracle: String): Q =
    Q(run, Some(oracle))
  def gen(run: (SparkSession, String) => DataFrame)
         (g: (SparkSession, String) => String): Q =
    Q(run, None, Some(g))
}

/** Shared DuckDB oracle SQL fragments. The SQL mirrors the Spark expression
  * DAG op-for-op: exact decimal sums + identical IEEE scalar math ⇒
  * bit-identical doubles after 4dp rounding (see graft.sqlx.Exact and [[OracleSql.rnd]]).
  */
object OracleSql {
  /** OHLCV bars from events (SURVEY.md §1.1 mapping). Pure value selection —
    * exact across engines. */
  val barsCte: String =
    """ev AS (
      |  SELECT user_id AS symbol_id, CAST(ts AS DATE) AS date, value,
      |         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id) AS rn_a,
      |         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC) AS rn_d
      |  FROM events
      |),
      |bars AS (
      |  SELECT symbol_id, date,
      |         MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
      |         MAX(value) AS high,
      |         MIN(value) AS low,
      |         MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
      |         COUNT(*) AS volume
      |  FROM ev GROUP BY symbol_id, date
      |),
      |b AS MATERIALIZED (
      |  SELECT bars.*, row_number() OVER (PARTITION BY symbol_id ORDER BY date) AS rn
      |  FROM bars
      |)""".stripMargin

  val bySymbol = "PARTITION BY symbol_id ORDER BY date"

  /** Sliding frame of the trailing p rows. */
  def win(p: Int): String =
    s"OVER ($bySymbol ROWS BETWEEN ${p - 1} PRECEDING AND CURRENT ROW)"

  /** Exact decimal windowed sum cast back to double (mirrors Exact.decSum). */
  def decSum(expr: String, p: Int): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(25,10))) ${win(p)} AS VARCHAR) AS DOUBLE)"

  /** Exact mirror of Spark's round(x, n) for doubles. Spark HALF_UPs the
    * SHORTEST DECIMAL REPR (BigDecimal.valueOf) while DuckDB's ROUND(double)
    * rounds the exact binary value — on doubles whose shortest repr lands
    * exactly on a .xxxx5 tie (day-one EMAs equal to a close price, clean
    * return ratios) the two disagree by one final digit. Routing through
    * VARCHAR (shortest repr) into DECIMAL(38,20) and rounding THAT decimal
    * reproduces Spark's digits bit-for-bit (validated on tie cases + 3k
    * random doubles); `+ 0.0` keeps the −0 normalization.
    *
    * Magnitude bound: DECIMAL(38,20) holds 18 integer digits, so DuckDB
    * errors (rather than mis-compares) on |x| ≥ 1e18. All registered
    * oracles stay far below that (prices/scores/decimal-bounded sums); an
    * oracle expecting larger aggregates must widen the cast (e.g.
    * DECIMAL(38,18) at 2dp precision cost). */
  def rnd(expr: String, scale: Int): String =
    s"CAST(ROUND(CAST(CAST($expr AS VARCHAR) AS DECIMAL(38,20)), $scale) + 0.0 AS DOUBLE)"

  def rd(expr: String, as: String): String = s"${rnd(expr, 4)} AS $as"

  /** Unrolled BPE merge replay — the oracle for `vocab_bpe_merges` /
    * `corpus_bpe_encode`. The k merge rounds are data-DEPENDENT but the
    * round COUNT is a query constant, so the "no declarative form" argument
    * only rules out a fixed query for unbounded k: for the registered k the
    * loop unrolls into k chained CTE stages (the same trick as the IVF
    * Lloyd's-iteration replay), each stage = count adjacent pairs → argmax
    * (count DESC, pair lexicographic — Bpe.learn's ranked order) → rewrite.
    *
    * State encoding: each word's symbol list rides as ONE varchar with
    * TWO-space boundaries around every token (`"  a  b  "`), so the greedy
    * leftmost non-overlapping merge of (l, r) is exactly one
    * `replace(s, ' l  r ', ' lr ')`: the pattern takes one space from each
    * flanking boundary (leaving one intact ⇒ adjacent matches still see a
    * leading space), spaces never occur inside tokens (words are
    * space-split) so every match is token-aligned, and `replace` scans
    * left-to-right without re-examining replacement text — the same
    * "a just-merged token never re-merges in the same pass" semantics as
    * [[graft.text.Bpe.applyMergeLocal]]'s fold. Validated bit-exact against
    * the Spark dumps at sf 0.001/0.01/0.1.
    *
    * Every CTE is MATERIALIZED: stage i references stage i−1 more than
    * once, and DuckDB's default CTE inlining would re-expand the chain
    * exponentially (~4^k scans). With materialization the oracle runs the
    * same work as the trainer: k passes over the word table.
    *
    * A corpus exhausting its pairs before k merges leaves b_i empty; the
    * rewrite stage CASE-guards that (replace(s, NULL, NULL) would null
    * every word's state — the merge UNION degrades gracefully on its own,
    * the encode rollup would not). */
  private def bpeStageCtes(nMerges: Int): Seq[String] = {
    val head = Seq(
      """wt AS MATERIALIZED (
        |  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents)
        |  WHERE len(w) > 0 GROUP BY 1)""".stripMargin,
      """w0 AS MATERIALIZED (
        |  SELECT word, freq,
        |    '  ' || array_to_string(list_transform(generate_series(1, length(word)), i -> word[i]), '  ') || '  ' AS s
        |  FROM wt)""".stripMargin)
    val stages = (0 until nMerges).flatMap { i =>
      Seq(
        s"""p$i AS MATERIALIZED (
           |  SELECT tk[j] AS l, tk[j+1] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
           |  FROM (SELECT freq, list_filter(string_split(s, '  '), t -> len(t) > 0) AS tk FROM w$i),
           |       UNNEST(generate_series(1, len(tk) - 1)) AS u(j)
           |  GROUP BY 1, 2)""".stripMargin,
        s"""b$i AS MATERIALIZED (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1)""",
        s"""w${i + 1} AS MATERIALIZED (
           |  SELECT word, freq,
           |    CASE WHEN (SELECT count(*) FROM b$i) = 0 THEN s
           |         ELSE replace(s, (SELECT ' ' || l || '  ' || r || ' ' FROM b$i),
           |                         (SELECT ' ' || l || r || ' ' FROM b$i)) END AS s
           |  FROM w$i)""".stripMargin)
    }
    head ++ stages
  }

  /** (step, left, right, merged, pair_count) for the first k merges. */
  def bpeMergesSql(nMerges: Int): String = {
    val sel = (0 until nMerges).map { i =>
      s"""SELECT CAST($i AS INTEGER) AS step, l AS "left", r AS "right", l || r AS merged, cnt AS pair_count FROM b$i"""
    }.mkString(" UNION ALL ")
    "WITH " + bpeStageCtes(nMerges).mkString(",\n") +
      s"\nSELECT * FROM ($sel) ORDER BY step"
  }

  /** Per-document word/char/subword rollup after k merges. The fully-merged
    * word table w<k> IS the encode result: training rewrites every word with
    * each selected merge in learned order — exactly encodeWords' fold — so
    * the subword count per word falls out of the same chain. */
  def bpeEncodeSql(nMerges: Int): String = {
    val ctes = bpeStageCtes(nMerges) ++ Seq(
      s"""enc AS MATERIALIZED (
         |  SELECT word, CAST(len(list_filter(string_split(s, '  '), t -> len(t) > 0)) AS BIGINT) AS n_subwords
         |  FROM w$nMerges)""".stripMargin,
      """occ AS MATERIALIZED (
        |  SELECT doc_id, w AS word
        |  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents)
        |  WHERE len(w) > 0)""".stripMargin,
      """rolled AS MATERIALIZED (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |         CAST(SUM(length(word)) AS BIGINT) AS n_chars,
        |         CAST(SUM(n_subwords) AS BIGINT) AS n_subwords
        |  FROM occ JOIN enc USING (word) GROUP BY 1)""".stripMargin)
    "WITH " + ctes.mkString(",\n") +
      """
        |SELECT d.doc_id,
        |  COALESCE(r.n_words, 0) AS n_words,
        |  COALESCE(r.n_chars, 0) AS n_chars,
        |  COALESCE(r.n_subwords, 0) AS n_subwords
        |FROM documents d LEFT JOIN rolled r USING (doc_id) ORDER BY d.doc_id""".stripMargin
  }
}
