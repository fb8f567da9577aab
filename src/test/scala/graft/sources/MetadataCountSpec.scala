package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** countPruned's contract beyond the registered count: interior files are
  * genuinely metadata-counted (no data IO), boundary classification is
  * conservative (nulls and missing manifest rows disqualify), and the
  * total is always the brute-force filtered count. */
class MetadataCountSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = s"${sys.props("java.io.tmpdir")}/graft-metacount-spec"
    // 10k rows clustered on k into 10 tight files; v carries a null every
    // 25 rows, far denser than any range-partition split can dodge
    (0 until 10000).map(i => (i.toLong, if (i % 25 == 0) None else Some(i.toDouble)))
      .toDF("k", "v")
      .repartitionByRange(10, col("k"))
      .write.mode("overwrite").parquet(d)
    d
  }
  private lazy val mf = StatsManifest.build(spark, dir, Seq("k", "v"))

  test("interior files are counted from footers; the total equals the brute scan") {
    val (n, interior, boundary) = StatsManifest.countPruned(spark, dir, mf,
      Seq(("k", 1500.0, 8500.0)))
    assert(n == 8500 - 1500 + 1)
    assert(interior.nonEmpty, "a clustered layout must yield metadata-countable interiors")
    assert(interior.size + boundary.size < StatsManifest.listFiles(spark, dir).size,
      "files outside the box must be excluded entirely")
    // boundary-only IO: every interior file's rows arrived without a scan
    val boundaryRows =
      if (boundary.isEmpty) 0L
      else spark.read.parquet(boundary.map(f => s"$dir/$f"): _*)
        .where(col("k").between(1500, 8500)).count()
    assert(n - boundaryRows ==
      interior.map(f => mf.where(col("file") === f && col("column") === "k")
        .head().getLong(2)).sum)
  }

  test("a predicate column with nulls in a file disqualifies it from metadata counting") {
    // every file holds ~1000 rows and one k%997==0 null in v, so a v-box
    // covering a whole file must still classify it boundary
    val (n, interior, _) = StatsManifest.countPruned(spark, dir, mf,
      Seq(("v", 0.0, 10000.0)))
    assert(interior.isEmpty, "files with nulls in the predicate column are never interior")
    assert(n == spark.read.parquet(dir).where(col("v").between(0.0, 10000.0)).count())
  }

  test("a file missing from the manifest is conservatively boundary, never interior") {
    val partial = mf.where(col("file") =!= StatsManifest.listFiles(spark, dir).head)
    val (n, interior, boundary) = StatsManifest.countPruned(spark, dir, partial,
      Seq(("k", 0.0, 10000.0)))
    assert(n == 10000)
    assert(boundary.contains(StatsManifest.listFiles(spark, dir).head))
    assert(!interior.contains(StatsManifest.listFiles(spark, dir).head))
  }

  test("differential: arbitrary boxes (seeded) always equal the brute-force filtered count") {
    val rnd = new scala.util.Random(20260816L)
    val full = spark.read.parquet(dir)
    (1 to 12).foreach { i =>
      val a = rnd.nextInt(12000) - 1000
      val b = a + rnd.nextInt(6000)
      val (lo, hi) = (a.toDouble, b.toDouble)
      val (n, interior, boundary) = StatsManifest.countPruned(spark, dir, mf,
        Seq(("k", lo, hi)))
      val brute = full.where(col("k").between(lo, hi)).count()
      assert(n == brute, s"box [$lo,$hi] metadata count $n != brute $brute " +
        s"(interior=${interior.size}, boundary=${boundary.size}, case $i)")
    }
  }

  test("an all-outside box answers zero with no interior and no scan") {
    val (n, interior, boundary) = StatsManifest.countPruned(spark, dir, mf,
      Seq(("k", 50000.0, 60000.0)))
    assert(n == 0 && interior.isEmpty && boundary.isEmpty)
  }
}
