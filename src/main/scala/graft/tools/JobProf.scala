package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool (round 17): per-query job attribution. Runs each named query
  * twice (cold = first touch pays memoized builds, warm = steady state)
  * with a listener recording every Spark job's wall interval and callsite,
  * then prints, per run: total wall, number of jobs, the driver-side gap
  * (wall minus the union of job intervals — planning, filesystem metadata,
  * commit protocol), and the slowest jobs. The store-churn queries fire
  * dozens of metadata-sized jobs; this answers whether their seconds live
  * in executor work, scheduling fixed costs, or pure driver time.
  *
  * Usage: `sbt "runMain graft.tools.JobProf query1 query2 ..."`
  * (env SPARK_GRAFT_SF_DIR selects the corpus, default sf0.1). */
object JobProf {
  final case class J(id: Int, start: Long, var end: Long, var name: String)

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.maxFields", "500")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new scala.collection.mutable.LinkedHashMap[Int, J]
    val stageJob = new scala.collection.mutable.HashMap[Int, Int]  // stageId -> jobId
    val jobExec = new scala.collection.mutable.HashMap[Int, Long]  // jobId -> Σ executorRunTime ms
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val site = e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')).getOrElse("?")
        jobs(e.jobId) = J(e.jobId, e.time, -1L, site.take(90))
        e.stageInfos.foreach(si => stageJob(si.stageId) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = jobs.synchronized {
        stageJob.get(e.stageInfo.stageId).foreach { jid =>
          jobExec(jid) = jobExec.getOrElse(jid, 0L) +
            e.stageInfo.taskMetrics.executorRunTime
        }
      }
    })

    val names = if (args.nonEmpty) args.toSeq else Seq.empty
    require(names.nonEmpty, "pass query names")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { r =>
        jobs.synchronized { jobs.clear(); stageJob.clear(); jobExec.clear() }
        val t0 = System.nanoTime()
        val n = fn(spark, d).count()
        val wallMs = (System.nanoTime() - t0) / 1e6
        val (snap, execSnap) = jobs.synchronized { (jobs.values.toVector, jobExec.toMap) }
        val done = snap.filter(_.end > 0)
        // union of job intervals (jobs overlap when submitted concurrently)
        val union = {
          val iv = done.map(j => (j.start, j.end)).sortBy(_._1)
          var tot = 0L; var curS = -1L; var curE = -1L
          iv.foreach { case (s0, e0) =>
            if (curE < 0) { curS = s0; curE = e0 }
            else if (s0 <= curE) curE = math.max(curE, e0)
            else { tot += curE - curS; curS = s0; curE = e0 }
          }
          if (curE >= 0) tot += curE - curS
          tot
        }
        // Σ executorRunTime across all stages: the jobtime-vs-drivergap
        // cross-check — jobtime far above exectime/cores means the "job"
        // intervals themselves are mostly scheduling, not task work.
        val execTotal = execSnap.values.sum
        println(f"QUERY $name%-32s run$r wall=${wallMs / 1000}%7.2fs jobs=${done.size}%3d " +
          f"jobtime=${union / 1000.0}%7.2fs drivergap=${(wallMs - union) / 1000.0}%7.2fs " +
          f"exectime=${execTotal / 1000.0}%7.2fs rows=$n")
        done.sortBy(j => -(j.end - j.start)).take(14).foreach { j =>
          println(f"    ${(j.end - j.start) / 1000.0}%7.2fs exec=${execSnap.getOrElse(j.id, 0L) / 1000.0}%7.2fs job${j.id}%-4d ${j.name}")
        }
      }
    }
    spark.stop()
  }
}
