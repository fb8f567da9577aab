package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pattern-class coverage for the PII scrubber beyond the registered
  * query's single salted shape: multiples, adjacency, class interactions,
  * near-miss non-matches, and clean pass-through. */
class RedactSpec extends SparkSpec {

  private def run(texts: Seq[String]): Seq[(Int, Int, Int, String)] = {
    import spark.implicits._
    texts.toDF("text")
      .select(
        Redact.emailCount(col("text")).as("e"),
        Redact.ipv4Count(col("text")).as("i"),
        Redact.digitRunCount(col("text")).as("d"),
        Redact.redacted(col("text")).as("r"))
      .as[(Int, Int, Int, String)]
      .collect().toSeq
  }

  test("each class detected and replaced; counts are per-occurrence") {
    val Seq(a, b, c) = run(Seq(
      "mail a@b.com and c.d+e@sub.example.org end",
      "hosts 10.0.0.1 and 192.168.255.254",
      "cards 4111111111111111 then 1234567890"))
    assert(a == ((2, 0, 0, "mail <EMAIL> and <EMAIL> end")))
    assert(b == ((0, 2, 0, "hosts <IP> and <IP>")))
    assert(c == ((0, 0, 2, "cards <NUMBER> then <NUMBER>")))
  }

  test("adjacent mixed classes redact independently in the documented order") {
    val Seq(r) = run(Seq("x a@b.co 1.2.3.4 12345678901 y"))
    assert(r == ((1, 1, 1, "x <EMAIL> <IP> <NUMBER> y")))
  }

  test("near-misses do not match: 9-digit run, 4-part number without boundaries") {
    val Seq(r) = run(Seq("order 123456789 v1234.5.6.7"))
    // 9 digits is below the run threshold; "1234.5.6.7" has no word
    // boundary where a 1-3 digit octet could start
    assert(r == ((0, 0, 0, "order 123456789 v1234.5.6.7")))
  }

  test("clean text passes through byte-identical") {
    val s = "the fast key order sort table scan merge"
    val Seq(r) = run(Seq(s))
    assert(r == ((0, 0, 0, s)))
  }

  test("email is consumed before its digits can match later classes") {
    // the local part alone holds a >=10 digit run; email replacement must
    // claim it first so no <NUMBER> appears inside the tag
    val Seq(r) = run(Seq("u12345678901@example.com"))
    assert(r == ((1, 0, 1, "<EMAIL>")))
  }
}
