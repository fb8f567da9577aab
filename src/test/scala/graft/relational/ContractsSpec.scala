package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Key-integrity contracts (Contracts.scala): the testdata tables honor
  * their declared PKs, and planted violations (duplicate key, NULL key)
  * flip the verdict with the right tallies. */
class ContractsSpec extends SparkSpec {
  import spark.implicits._

  test("testdata verdicts: 9 tables honor their PK; lineitem's TPC-H PK violation is flagged") {
    val rep = Contracts.report(spark, sf("sf0.001")).collect()
    assert(rep.length === Contracts.keysByTable.size)
    rep.foreach { r =>
      val t = r.getAs[String]("table_name")
      if (t == "lineitem") {
        // the synthetic generator reuses (l_orderkey, l_linenumber) —
        // a real violation of the declared TPC-H PK (4599 distinct of
        // 6000 rows at sf0.001, and no compact column subset is unique
        // at any SF). The checker's job is to SAY so, not to hide it.
        assert(!r.getAs[Boolean]("pk_ok"))
        assert(r.getAs[Long]("n_distinct_keys") < r.getAs[Long]("n_rows"))
      } else {
        assert(r.getAs[Boolean]("pk_ok"), s"pk violated: $t")
        assert(r.getAs[Long]("n_distinct_keys") === r.getAs[Long]("n_rows"))
      }
      assert(r.getAs[Long]("n_null_key_rows") === 0L)
    }
  }

  test("planted duplicate and NULL keys flip pk_ok with exact tallies") {
    val bad = Seq(
      (Some(1), Some(1), "a"), // pk (1,1) ...
      (Some(1), Some(1), "b"), // ... duplicated
      (Some(2), None, "c"),    // null key component
      (Some(3), Some(1), "d")
    ).toDF("k1", "k2", "v")
    val r = Contracts.check(bad, "bad", Seq("k1", "k2")).head
    assert(r.getAs[Long]("n_rows") === 4L)
    assert(r.getAs[Long]("n_distinct_keys") === 2L) // (1,1) and (3,1)
    assert(r.getAs[Long]("n_null_key_rows") === 1L)
    assert(!r.getAs[Boolean]("pk_ok"))
  }

  test("composite key is injective under the separator join") {
    // ("1","11") vs ("11","1") must not collide in the joined key string
    val df = Seq((1, 11), (11, 1)).toDF("a", "b")
    val r = Contracts.check(df, "t", Seq("a", "b")).head
    assert(r.getAs[Long]("n_distinct_keys") === 2L)
    assert(r.getAs[Boolean]("pk_ok"))
  }
}
