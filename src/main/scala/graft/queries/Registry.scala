package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator query: the Spark implementation plus (when the
  * semantics are SQL-expressible) the DuckDB oracle the driver replays.
  * Oracle-less entries get the driver's weaker rows-only check and are
  * covered by ScalaTest golden specs instead (SURVEY.md §6).
  */
final case class Q(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(run: (SparkSession, String) => DataFrame, oracle: String): Q =
    Q(run, Some(oracle))
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
      |b AS (
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
}
