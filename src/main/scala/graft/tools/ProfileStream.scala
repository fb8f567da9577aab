package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for the streaming near-dup bench lines (not registered). */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.maxFields", "500")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warm count")(graft.Tables.documents(s, d).count())
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft-neardup-src2-${graft.sqlx.PathTag.of(d)}")
    if (!java.nio.file.Files.exists(dir.resolve("_SUCCESS")))
      graft.Tables.documents(s, d).repartition(2).write.mode("overwrite").parquet(dir.toString)
    time("static banding count cold")(
      graft.streaming.StreamNearDup.bandedDocs(s.read.parquet(dir.toString)).count())
    time("static banding count warm")(
      graft.streaming.StreamNearDup.bandedDocs(s.read.parquet(dir.toString)).count())
    // static equivalent of the stream's stateful stage: groupByKey over banded
    time("static groupByKey pairs")( {
      import s.implicits._
      graft.streaming.StreamNearDup.bandedDocs(s.read.parquet(dir.toString))
        .as[graft.streaming.StreamNearDup.BandedDoc]
        .groupByKey(bd => (bd.band, bd.bucket))
        .flatMapGroups { (_, rows) =>
          val ids = rows.map(_.doc_id).toSeq.distinct.sorted
          for { i <- ids.indices.iterator; j <- (i + 1 until ids.size).iterator }
            yield (ids(i), ids(j))
        }.count()
    })
    for ((mft, tag) <- Seq(2 -> "1trig"); rep <- 1 to 6) {
      val qname = s"prof_${tag}_$rep"
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = graft.streaming.StreamNearDup.candidatePairs(
            graft.streaming.StreamNearDup.bandedDocs(
              graft.Tables.documentsStream(s, dir.toString, maxFilesPerTrigger = mft)))
          .writeStream.format("memory").queryName(qname)
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .start()
        time(s"$tag rep$rep drain")(q.processAllAvailable())
        q.recentProgress.foreach { p =>
          println(s"[prof] $tag rep$rep batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}") }
        q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }
    s.stop()
  }
}
