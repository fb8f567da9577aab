package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join semantics must be exactly those of the plain equi-join,
  * including under extreme single-key skew. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on real tables") {
    val d = sf("sf0.001")
    val orders = graft.Tables.orders(spark, d)
      .select(col("o_custkey").as("symbol_id"), col("o_orderkey"), col("o_totalprice"))
    val uni = graft.etl.SymbolUniverse.universe(spark, d)
      .select(col("symbol_id"), col("segment"))
    val plain = orders.join(uni, "symbol_id")
      .select("symbol_id", "o_orderkey", "segment")
      .collect().map(_.toString).sorted
    val salted = SkewJoin.saltedInner(orders, uni, Seq("symbol_id"), salts = 8)
      .select("symbol_id", "o_orderkey", "segment")
      .collect().map(_.toString).sorted
    assert(salted.sameElements(plain),
      s"rows: salted=${salted.length} plain=${plain.length}")
  }

  test("correct under extreme skew: one key carries almost all rows, duplicates preserved") {
    val big = (1 to 1000).map(i => (1L, i % 7)).toDF("k", "v") // hot key 1
      .union(Seq((2L, 99), (2L, 99)).toDF("k", "v"))           // dup rows on k=2
    val dim = Seq((1L, "hot"), (2L, "cold"), (3L, "orphan")).toDF("k", "name")
    val out = SkewJoin.saltedInner(big, dim, Seq("k"), salts = 4)
    assert(out.count() == 1002)
    assert(out.where(col("name") === "hot").count() == 1000)
    assert(out.where(col("name") === "cold").count() == 2) // duplicate rows survive
    assert(out.where(col("name") === "orphan").count() == 0)
  }
}
