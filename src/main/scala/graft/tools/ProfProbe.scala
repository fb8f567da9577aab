package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

// scratch dev probe — not part of the library surface (deleted after use)
object ProfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "500")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.1")
    val fields = li.schema.fields.toSeq
    def time(tag: String)(f: => Unit): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 3) { val t0 = System.nanoTime(); f; best = math.min(best, (System.nanoTime() - t0) / 1e9) }
      println(f"PROBE $tag%-28s $best%.3f s")
    }
    val statCols: Seq[Column] = count(lit(1)) +: fields.flatMap { f =>
      val c = col(f.name)
      Seq(count(c)) ++ (f.dataType match {
        case _: NumericType => Seq(min(c).cast("double"), max(c).cast("double"), graft.sqlx.Exact.decSumAgg(c))
        case StringType => Seq(min(c), max(c))
        case _ => Seq(min(c).cast("date"), max(c).cast("date"))
      })
    }
    time("stats-only") { li.agg(statCols.head, statCols.tail: _*).collect() }
    val hll: Seq[Column] = fields.map(f => approx_count_distinct(col(f.name), 0.02))
    time("hll-only rsd=0.02") { li.agg(hll.head, hll.tail: _*).collect() }
    val hll5: Seq[Column] = fields.map(f => approx_count_distinct(col(f.name), 0.05))
    time("hll-only rsd=0.05") { li.agg(hll5.head, hll5.tail: _*).collect() }
    time("stats+hll") { li.agg((statCols ++ hll).head, (statCols ++ hll).tail: _*).collect() }
    println(li.agg((statCols ++ hll).head, (statCols ++ hll).tail: _*)
      .queryExecution.executedPlan.toString.split("\n").take(4).mkString("\n"))
    println(li.agg(statCols.head, statCols.tail: _*)
      .queryExecution.executedPlan.toString.split("\n").take(4).mkString("\n"))
    spark.stop()
  }
}
