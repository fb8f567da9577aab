package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** End-to-end file-source streaming: the production path is a parquet/Kafka
  * stream of the events schema — this spec runs the real
  * `readStream.parquet` (explicit schema, nanos-as-long like the batch
  * reader, micro-batched via maxFilesPerTrigger) through the same windowed
  * aggregation and checks it equals the batch answer exactly. */
class FileStreamSpec extends SparkSpec {

  test("readStream over the events parquet matches the batch windowed aggregation") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // streaming sources need an explicit schema; ts arrives as raw nanos
    val raw = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // the file source streams directories; stage the table as one "arriving" file
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf("sf0.001"), "events.parquet"),
      dir.resolve("events.parquet"))
    val stream = spark.readStream.schema(raw)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
