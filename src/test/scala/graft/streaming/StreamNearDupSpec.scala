package graft.streaming

import graft.SparkSpec
import graft.dedup.{Jaccard, MinHashLSH}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** Stream ≡ batch for the LSH bucket-state near-dup detector: documents
  * arrive over three MemoryStream micro-batches; the emitted candidate set
  * must equal the batch bucket equi-join's, and some candidates must span
  * arrival batches (i.e. the bucket STATE, not within-trigger pairing, is
  * doing the work). */
case class NearDupDoc(doc_id: Long, text: String)

class StreamNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("bucket-state candidates over three arrival batches equal the batch bucket join") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "text").as[NearDupDoc].collect().toSeq

    val in = MemoryStream[NearDupDoc]
    val q = StreamNearDup.candidatePairs(StreamNearDup.bandedDocs(in.toDF()))
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode(OutputMode.Append()).start()
    // arrival split by doc_id % 3: near-dup pairs land in different batches
    val batches = (0 until 3).map(k => docs.filter(_.doc_id % 3 == k))
    try batches.foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()

    val streamed = spark.table("neardup_stream")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val batch = MinHashLSH.candidatesFromShingles(
        Jaccard.shingles(docs.toDF()))
      .as[(Long, Long)].collect().toSet

    assert(batch.nonEmpty, "fixture has no LSH candidates — spec can't bite")
    assert(streamed == batch,
      s"stream=${streamed.size} batch=${batch.size} " +
        s"onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    val crossBatch = batch.filter { case (a, b) => a % 3 != b % 3 }
    assert(crossBatch.nonEmpty,
      "no candidate pair spans arrival batches — bucket state untested")
  }

  test("preloaded corpus state: streaming only the increment emits exactly the increment-touching pairs") {
    implicit val sqlCtx = spark.sqlContext
    val docsDF = graft.Tables.documents(spark, sf("sf0.001")).select("doc_id", "text")
    val isNew = (id: Long) => id % 7 == 3
    val corpus = docsDF.where(col("doc_id") % 7 =!= 3)
    val incr = docsDF.where(col("doc_id") % 7 === 3).as[NearDupDoc].collect().toSeq

    val in = MemoryStream[NearDupDoc]
    val q = StreamNearDup.candidatePairsFromState(
        StreamNearDup.bandedDocs(in.toDF()),
        StreamNearDup.initialBucketState(corpus))
      .writeStream.format("memory").queryName("neardup_incr_stream")
      .outputMode(OutputMode.Append()).start()
    val batches = (0 until 2).map(k => incr.filter(_.doc_id % 2 == k))
    try batches.foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()

    val streamed = spark.table("neardup_incr_stream")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expected = MinHashLSH.candidatesFromShingles(Jaccard.shingles(docsDF))
      .as[(Long, Long)].collect().toSet
      .filter(p => isNew(p._1) || isNew(p._2))
    assert(expected.nonEmpty, "fixture increment collides with nothing — spec can't bite")
    assert(streamed == expected,
      s"stream=${streamed.size} expected=${expected.size} " +
        s"onlyStream=${(streamed -- expected).take(3)} onlyExpected=${(expected -- streamed).take(3)}")
    // the state preload is doing the work: some pair must touch the corpus side
    assert(expected.exists(p => !isNew(p._1) || !isNew(p._2)),
      "no corpus-vs-increment pair — initial state untested")
  }
}
