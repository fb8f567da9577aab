package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the skew fix when the small side is too big to
  * broadcast AND the big side has hot keys (a viral symbol, a boilerplate
  * shingle). A plain shuffle join puts every row of a hot key on ONE
  * reducer; salting spreads each key over `salts` cells by joining on
  * (keys, salt): the big side gets a deterministic content-hash salt, the
  * small side is replicated once per salt value. Cost: |small| × salts
  * extra rows — tolerable for a dimension table, and each reducer now sees
  * ≤ 1/salts of any hot key.
  *
  * The salt is a hash of the whole row, never rand(): retried tasks and
  * resumed jobs reproduce identical partitions (same determinism rule as
  * graft.sqlx.Skew.saltedCountSum). Join semantics are exactly those of
  * `big.join(small, keys)` — proven bit-exact in SkewJoinSpec and by the
  * skew_join_segments oracle. For aggregations-after-join prefer
  * aggregating partials before the join when algebra allows (§5.1);
  * this operator is for when the joined rows themselves are needed.
  *
  * (Spark's AQE skew-join handles skew at runtime for sort-merge joins;
  * explicit salting remains the portable fix when AQE can't split — e.g.
  * aggregations keyed on the hot column, or bucketed-table joins that
  * must not re-shuffle.)
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed) with `small` (replicated). */
  def saltedInner(big: DataFrame, small: DataFrame, keys: Seq[String],
                  salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, (keys :+ "__salt").toSeq).drop("__salt")
  }
}
