package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal binary-column handling: opaque `binary` payloads alongside
  * typed metadata, with decode / feature-extract / frame-sample as batched
  * per-partition transforms over a typed Dataset — the Scala analog of a
  * Pandas-UDF-over-mapInPandas pipeline.
  *
  * The codec is a REAL pure-JVM image decoder for binary PPM (P6): header
  * tokenizer (magic / width / height / maxval over arbitrary whitespace,
  * `#` comment lines) + raw RGB pixel walk producing per-channel means —
  * no external libraries. Payloads are synthesized from the documents
  * table (testdata carries no binary column) as genuinely valid P6 images
  * whose dimensions derive from n_chars and whose channel bytes derive
  * from doc_id, so the DuckDB oracle can recompute every decoded field
  * byte-exactly.
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
                        maxval: Int, r_mean: Double, g_mean: Double, b_mean: Double,
                        frame_count: Int, thumb_checksum: Long)

  /** Deterministic synthetic P6 payload: `P6\n{w} {h}\n255\n` + w·h RGB
    * pixels with channel bytes ((id·31 + 7c) mod 256). A real, parseable
    * image whose every byte is a pure function of (doc_id, n_chars). */
  def ppmPayload(docId: Long, nChars: Long): Array[Byte] = {
    val w = (nChars % 64 + 1).toInt
    val h = (nChars % 48 + 1).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    val n = w * h * 3
    while (i < n) {
      out(header.length + i) = ((docId * 31 + 7 * (i % 3)) % 256).toByte
      i += 1
    }
    out
  }

  /** Synthesize binary payloads + metadata from documents. Declared dims
    * mirror the header (a real pipeline's sidecar metadata, which the
    * decoder deliberately ignores in favour of parsing). */
  def records(spark: SparkSession, dir: String): Dataset[MMRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      .as[(Long, Long)]
      .map { case (id, n) =>
        MMRecord(id, ppmPayload(id, n), "image/ppm",
          (n % 64 + 1).toInt, (n % 48 + 1).toInt)
      }
  }

  /** Parsed P6 image: header fields + per-channel means over the pixel
    * array. */
  final case class Ppm(width: Int, height: Int, maxval: Int,
                       rMean: Double, gMean: Double, bMean: Double)

  /** Real P6 parser: magic check, whitespace/comment-tolerant header
    * tokenizer, then one pass over the raw RGB bytes accumulating channel
    * sums. Throws on malformed input — a decode error at 100 TB should
    * surface per-record, not produce silent garbage. */
  def decodePpm(bytes: Array[Byte]): Ppm = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM payload")
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and '#' comment lines between header tokens
      var done = false
      while (!done) {
        while (pos < bytes.length && (bytes(pos) == ' ' || bytes(pos) == '\n' ||
          bytes(pos) == '\r' || bytes(pos) == '\t')) pos += 1
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else done = true
      }
      var v = 0
      val start = pos
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      require(pos > start, s"expected integer at byte $pos")
      v
    }
    val w = nextInt(); val h = nextInt(); val mv = nextInt()
    pos += 1 // single whitespace byte after maxval, then raw pixel data
    val n = w * h
    require(bytes.length - pos >= n * 3, s"truncated pixel data: ${bytes.length - pos} < ${n * 3}")
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < n) {
      r += bytes(pos + 3 * i) & 0xff
      g += bytes(pos + 3 * i + 1) & 0xff
      b += bytes(pos + 3 * i + 2) & 0xff
      i += 1
    }
    Ppm(w, h, mv, r.toDouble / n, g.toDouble / n, b.toDouble / n)
  }

  /** Batched decode: each fixed-size batch of records through the real PPM
    * codec (the Iterator-of-batches shape a heavier codec needs for bounded
    * memory). Checksums cover the full payload (transport integrity) and
    * the 4×-subsampled "thumbnail" bytes. */
  def decodeBatch(batch: Seq[MMRecord]): Seq[MMFeatures] =
    batch.map { r =>
      val ppm = decodePpm(r.payload)
      val checksum = r.payload.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
      val thumb = r.payload.zipWithIndex.collect { case (b, i) if i % 4 == 0 => b }
      val thumbChecksum = thumb.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
      MMFeatures(r.doc_id, r.media_type, r.payload.length, checksum,
        ppm.width, ppm.height, ppm.maxval, ppm.rMean, ppm.gMean, ppm.bMean,
        r.payload.length / 16, thumbChecksum)
    }

  def features(spark: SparkSession, dir: String, batchSize: Int = 64): Dataset[MMFeatures] = {
    import spark.implicits._
    records(spark, dir).mapPartitions(_.grouped(batchSize).flatMap(decodeBatch))
  }

  case class MMFrame(doc_id: Long, frame_idx: Int, frame_len: Int, first_byte: Int)

  /** Frame sampling: chunk the payload into fixed 16-byte frames and keep
    * every k-th — the video keyframe-extraction shape (one exploded row per
    * sampled frame, payload never leaves its partition). The per-frame
    * summary is (length, first byte); a heavier codec emits the decoded
    * tensor per sampled frame. */
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
