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
  * == Decision rule: AQE skew join vs explicit salting ==
  * (evidence: AqeSkewSpec, which trips OptimizeSkewedJoin on a generated
  * hot key and pins where it cannot fire)
  *
  *  1. Plain shuffle (sort-merge) equi-join with a hot key → use the
  *     PLAIN join and let AQE split it: `spark.sql.adaptive.skewJoin`
  *     (on by default) rewrites the skewed partition into parallel
  *     splits at runtime (SortMergeJoinExec.isSkewJoin), with zero
  *     replication cost and no code change. This operator adds nothing
  *     there.
  *  2. Hot-key AGGREGATION of a NON-COMBINABLE aggregate → salt.
  *     OptimizeSkewedJoin only rewrites joins, and a groupBy's exchange
  *     hash-partitions on the raw key — but for algebraic aggregates
  *     (count/sum/min/max/avg) Spark's map-side partial aggregation
  *     already collapses the hot key to one partial row per mapper
  *     before the exchange, so the lone reducer receives ~numMappers
  *     rows, not the hot key's raw rows — no salt needed. Salting
  *     matters where partials don't collapse: collect_list/collect_set,
  *     exact countDistinct (every distinct value of the hot key meets
  *     at one reducer), or high-cardinality intermediate state. Then
  *     use the two-phase salted rollup (graft.sqlx.Skew.saltedCountSum
  *     shows the shape).
  *  3. Bucketed / pre-partitioned joins → salt (or re-bucket). Their
  *     point is having NO exchange, and AQE skew handling works by
  *     re-reading shuffle output — no exchange, nothing to split.
  *  4. Broadcast-able small side → neither; broadcast beats both.
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
