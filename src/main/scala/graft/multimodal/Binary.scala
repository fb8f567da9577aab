package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal binary-column handling: opaque `binary` payloads alongside
  * typed metadata, with decode / feature-extract / resize / frame-sample as
  * batched per-partition transforms over a typed Dataset — the Scala analog
  * of a Pandas-UDF-over-mapInPandas pipeline. The actual codec is STUBBED
  * (no image/audio libs in this container) with a deterministic fake; the
  * Spark-side plumbing — schema, partition-batched processing, typed
  * records — is real and tested.
  *
  * At 100 TB the payloads dominate: the pipeline keeps them in one column
  * (never exploded), processes per-partition in fixed-size batches (bounded
  * memory), and projects metadata-only where the payload isn't needed.
  */
object Binary {
  case class MMRecord(doc_id: Long, payload: Array[Byte], media_type: String,
                      declared_width: Int, declared_height: Int)
  case class MMFeatures(doc_id: Long, media_type: String, byte_len: Int,
                        checksum: Long, decoded_width: Int, decoded_height: Int,
                        frame_count: Int, thumb_checksum: Long)

  /** Synthesize binary payloads + metadata from documents (testdata has no
    * binary column; payload = utf8 bytes, metadata derived from n_chars). */
  def records(spark: SparkSession, dir: String): Dataset[MMRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("media_type"),
      (col("n_chars") % 64 + 1).cast("int").as("declared_width"),
      (col("n_chars") % 48 + 1).cast("int").as("declared_height"))
      .as[MMRecord]
  }

  /** STUB decode: deterministic fake standing in for a real codec. A real
    * deployment swaps `decodeBatch` for the image/audio library call; the
    * batching shape (Iterator of fixed-size batches per partition) is what a
    * real codec needs for bounded memory. */
  def decodeBatch(batch: Seq[MMRecord]): Seq[MMFeatures] =
    batch.map { r =>
      val checksum = r.payload.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
      val thumb = r.payload.zipWithIndex.collect { case (b, i) if i % 4 == 0 => b }
      val thumbChecksum = thumb.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
      MMFeatures(r.doc_id, r.media_type, r.payload.length, checksum,
        r.declared_width, r.declared_height, r.payload.length / 16, thumbChecksum)
    }

  def features(spark: SparkSession, dir: String, batchSize: Int = 64): Dataset[MMFeatures] = {
    import spark.implicits._
    records(spark, dir).mapPartitions(_.grouped(batchSize).flatMap(decodeBatch))
  }

  case class MMFrame(doc_id: Long, frame_idx: Int, frame_len: Int, first_byte: Int)

  /** Frame sampling: chunk the payload into fixed 16-byte frames and keep
    * every k-th — the video keyframe-extraction shape (one exploded row per
    * sampled frame, payload never leaves its partition). The per-frame
    * "decode" is stubbed to (length, first byte); a real deployment emits
    * the decoded tensor per sampled frame. */
  def frameSample(records: Dataset[MMRecord], everyK: Int = 4): Dataset[MMFrame] = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      r.payload.grouped(16).zipWithIndex.collect {
        case (chunk, i) if i % everyK == 0 =>
          MMFrame(r.doc_id, i, chunk.length, chunk(0) & 0xff)
      }
    }
  }
}
