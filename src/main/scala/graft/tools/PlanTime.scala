package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: bisect Statements.full's first-touch execution cost —
  * parquet warmup vs decimal base aggregation vs window passes vs JIT. */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.maxFields", "500")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new scala.collection.mutable.ArrayBuffer[(Int, String, Long, Int)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(60), ms, i.numTasks))
      }
    })
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PLANTIME $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warm the parquet scans first so they don't pollute the attribution
    t("warm-scan") {
      graft.Tables.lineitem(spark, d).count()
      graft.Tables.orders(spark, d).count()
      graft.Tables.customer(spark, d).count()
    }
    val base = graft.fundamentals.Statements.base(spark, d)
    t("base-1st") { base.count() }
    t("base-2nd") { base.count() }
    val full = graft.fundamentals.Statements.full(spark, d)
    t("full-1st") { full.count() }
    t("full-2nd") { full.count() }
    // same plan shape on ~100x less data: if this is still seconds, the cost
    // is codegen compile / JIT, not row processing
    val tiny = graft.fundamentals.Statements.full(spark, "/root/testdata/sf0.001")
    t("full-tiny-1st") { tiny.count() }
    println("STAGES (id, name, ms, tasks):")
    stages.sortBy(-_._3).take(20).foreach { case (id, n, ms, nt) =>
      println(f"STAGE $id%5d $ms%7d ms $nt%4d tasks  $n")
    }
    println("STAGETOTAL " + stages.map(_._3).sum + " ms over " + stages.size + " stages")
    val plan = full.queryExecution.executedPlan.toString
    println("PLANSTATS windows=" + "\\bWindow\\b".r.findAllIn(plan).length +
      " sorts=" + "\\bSort\\b".r.findAllIn(plan).length +
      " exchanges=" + "Exchange".r.findAllIn(plan).length +
      " wsc=" + "WholeStageCodegen".r.findAllIn(plan).length)
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/stmt_plan.txt"),
      plan.getBytes("UTF-8"))
    spark.stop()
  }
}
