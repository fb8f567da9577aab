package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.OutputMode

/** End-to-end file-source streaming: the production path is a parquet/Kafka
  * stream of the events schema — this spec runs the real
  * `readStream.parquet` ([[graft.Tables.eventsStream]]: schema probed from
  * the staged files, same ts normalization as the batch reader, so either
  * testdata encoding streams identically; micro-batched via
  * maxFilesPerTrigger) through the same windowed aggregation and checks it
  * equals the batch answer exactly. */
class FileStreamSpec extends SparkSpec {

  test("readStream over the events parquet matches the batch windowed aggregation") {
    // the file source streams directories; stage the table as one "arriving" file
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf("sf0.001"), "events.parquet"),
      dir.resolve("events.parquet"))
    val stream = graft.Tables.eventsStream(spark, dir.toString)
    val q = EventAggregates.windowedCounts(stream)
      .writeStream.format("memory").queryName("filestream")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable()
    val streamed = spark.table("filestream")
      .select("window_start", "event_type", "n_events", "value_sum")
      .collect().map(_.toString).sorted
    q.stop()

    val batch = EventAggregates.windowedCounts(graft.Tables.events(spark, sf("sf0.001")))
      .select("window_start", "event_type", "n_events", "value_sum")
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch),
      s"stream=${streamed.length} rows batch=${batch.length} rows; " +
        s"first diff=${streamed.zip(batch).find(p => p._1 != p._2)}")
  }
}
