package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-version diff — the governance primitive behind "what changed
  * between corpus release N and N+1": every row keyed by `key` is
  * classified `added` / `removed` / `changed` / `unchanged` by comparing
  * content FINGERPRINTS (md5 over the payload columns), not raw payloads
  * — each side reduces to (key, 16-byte fp, payload length) at the scan,
  * so the full-outer join that aligns the two versions moves hashes, not
  * documents. At 100 TB that is the difference between a diff and a
  * double copy; on key-bucketed stores the join is exchange-free.
  *
  * The fingerprint is null-safe and injection-proof: each payload column
  * hashes SEPARATELY (md5 of its string form; NULL becomes the literal
  * token "-", which no hex digest contains) and the row fingerprint is
  * the md5 of those fixed-width tokens concatenated. Separator-joined
  * raw values would be ambiguous the moment a value CONTAINS the
  * separator — ("x<sep>y", "z") and ("x", "y<sep>z") concatenate to the
  * same bytes (DatasetDiffSpec pins the case); 32-hex-or-"-" tokens
  * parse uniquely, so distinct row payloads cannot collide by
  * construction.
  *
  * KEY CONTRACT: `key` must be UNIQUE per side and NON-NULL. A NULL key
  * never equi-joins, so one document would surface as both `removed` and
  * `added` — the guard below raises in-flight (codegen'd per-row check,
  * no extra pass) rather than mis-classify. Duplicate keys are the
  * caller's contract (release keys are primary keys by construction
  * everywhere graft stages them): each duplicate multiplies rows through
  * the full-outer join, and detecting it would cost a full
  * count-distinct pass per side per diff — deliberately not paid here.
  */
object DatasetDiff {

  private def fingerprinted(df: DataFrame, key: String, payload: Seq[String],
                            side: String): DataFrame =
    df.select(
      when(col(key).isNull, raise_error(lit(
          s"DatasetDiff: NULL $side-side key '$key' — a null key cannot be " +
            "aligned across versions (it would read as removed+added); keys " +
            "must be unique and non-null")))
        .otherwise(col(key)).as(key),
      md5(concat(
        payload.map(c => coalesce(md5(col(c).cast("string")), lit("-"))): _*))
        .as(s"${side}_fp"),
      payload.map(c => coalesce(length(col(c).cast("string")), lit(0)))
        .reduce(_ + _).as(s"${side}_len"))

  /** Row-level diff: (key, status, n_chars) where `n_chars` is the new
    * side's payload length (the old side's for removed rows). */
  def diff(a: DataFrame, b: DataFrame, key: String, payload: Seq[String]): DataFrame =
    fingerprinted(a, key, payload, "a")
      .join(fingerprinted(b, key, payload, "b"), Seq(key), "full_outer")
      .select(
        col(key),
        when(col("a_fp").isNull, "added")
          .when(col("b_fp").isNull, "removed")
          .when(col("a_fp") =!= col("b_fp"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("b_len"), col("a_len")).as("n_chars"))

  /** The release-note rollup: per-status document and character counts. */
  def summary(a: DataFrame, b: DataFrame, key: String, payload: Seq[String]): DataFrame =
    diff(a, b, key, payload)
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars").cast("long")).as("chars_sum"))
}
