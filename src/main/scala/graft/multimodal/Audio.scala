package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal AUDIO pipeline — the second real pure-JVM codec beside
  * [[Binary]]'s P6 image path: genuinely valid RIFF/WAVE payloads
  * (canonical 44-byte header + 16-bit little-endian mono PCM) synthesized
  * as binary columns, decoded by a real chunk-walking WAV parser, with
  * signal features (RMS energy, zero-crossing count, peak amplitude) and
  * fixed-window frame energies extracted per-partition in bounded
  * batches — the `mapInPandas`-shaped audio front of a training-data
  * pipeline, minus only the heavy external codec the container lacks.
  *
  * Synthesis is deterministic: sample i of doc d is
  * `((d·37 + i·97) mod 65536) − 32768` and the sample count derives from
  * n_chars, so the DuckDB oracle replays every decoded field and feature
  * from the integer formula without materializing bytes (the [[Binary]]
  * contract). Feature exactness: Σ s² rides BIGINT (exact), RMS is one
  * IEEE sqrt of an exact ratio (sqrt is correctly rounded, so it
  * bit-matches across engines), zero crossings and peaks are integers.
  *
  * At 100 TB the payload column dominates: it is never exploded, decode
  * runs where the bytes live, and metadata-only consumers project it
  * away — same posture as the image path.
  */
object Audio {

  val SampleRate = 8000

  final case class WavRecord(doc_id: Long, payload: Array[Byte], media_type: String)
  final case class WavFeatures(doc_id: Long, media_type: String, byte_len: Int,
                               sample_rate: Int, n_samples: Int, duration_ms: Double,
                               rms: Double, zero_crossings: Long, peak: Int)
  final case class WavFrame(doc_id: Long, frame_idx: Int, n_in_frame: Int,
                            energy: Long, frame_peak: Int)

  /** Sample i of doc `docId` — THE formula, shared (conceptually) with the
    * oracle SQL; change one and the bit-exact compare fails. */
  private def sample(docId: Long, i: Long): Int =
    (((docId * 37 + i * 97) % 65536) - 32768).toInt

  private def nSamples(nChars: Long): Int = (nChars % 200 + 16).toInt

  /** A real WAV file: RIFF header, fmt chunk (PCM, mono, 16-bit,
    * [[SampleRate]]), data chunk of little-endian int16 samples. */
  def wavPayload(docId: Long, nChars: Long): Array[Byte] = {
    val n = nSamples(nChars)
    val dataSize = n * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(SampleRate).putInt(SampleRate * 2)
      .putShort(2).putShort(16) // block align, bits/sample
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0L
    while (i < n) { out.putShort(sample(docId, i).toShort); i += 1 }
    out.array()
  }

  def records(spark: SparkSession, dir: String): Dataset[WavRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      .as[(Long, Long)]
      .map { case (id, n) => WavRecord(id, wavPayload(id, n), "audio/wav") }
  }

  /** Parsed WAV: format fields + the PCM samples. */
  final case class Wav(sampleRate: Int, bitsPerSample: Int, channels: Int,
                       samples: Array[Int])

  /** Real RIFF parser: validates the RIFF/WAVE container, WALKS chunks
    * (tolerating unknown ones — real files carry LIST/INFO etc.), parses
    * `fmt `, and decodes the `data` chunk's little-endian int16 samples.
    * Throws on malformed input — decode errors must surface per record,
    * never as silent garbage. */
  def decodeWav(bytes: Array[Byte]): Wav = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(bytes.length >= 12 && fourcc() == "RIFF", "not a RIFF container")
    buf.getInt // declared riff size (trust the actual buffer instead)
    require(fourcc() == "WAVE", "not a WAVE file")
    var rate = -1; var bits = -1; var channels = -1; var fmt = -1
    var samples: Array[Int] = null
    while (buf.remaining() >= 8) {
      val id = fourcc(); val size = buf.getInt
      require(size >= 0 && size <= buf.remaining(), s"chunk '$id' overruns the payload")
      val next = buf.position() + size
      id match {
        case "fmt " =>
          fmt = buf.getShort; channels = buf.getShort
          rate = buf.getInt; buf.getInt; buf.getShort // byte rate, block align
          bits = buf.getShort
        case "data" =>
          require(fmt == 1 && bits == 16 && channels == 1,
            s"unsupported encoding: fmt=$fmt bits=$bits channels=$channels (PCM16 mono only)")
          samples = Array.ofDim[Int](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort.toInt; i += 1 }
        case _ => // skip unknown chunks, like a real reader
      }
      // RIFF chunks are 2-byte aligned, but the pad byte after a final
      // odd-sized chunk may legitimately be omitted at EOF — clamp so a
      // real-world file isn't rejected with a bare ByteBuffer error
      buf.position(math.min(next + (size & 1), buf.limit()))
    }
    require(samples != null, "no data chunk")
    require(samples.nonEmpty,
      "empty data chunk: zero samples decode to NaN features — refuse loudly per record")
    Wav(rate, bits, channels, samples)
  }

  private def featuresOf(r: WavRecord): WavFeatures = {
    val w = decodeWav(r.payload)
    val n = w.samples.length
    var sq = 0L; var zc = 0L; var peak = 0
    var i = 0
    while (i < n) {
      val s = w.samples(i)
      sq += s.toLong * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && w.samples(i - 1).toLong * s < 0) zc += 1
      i += 1
    }
    WavFeatures(r.doc_id, r.media_type, r.payload.length, w.sampleRate, n,
      n * 1000.0 / w.sampleRate, math.sqrt(sq.toDouble / n), zc, peak)
  }

  /** Streaming per-record decode+feature pass: featuresOf is strictly
    * per-record, so a plain map holds exactly ONE payload at a time —
    * grouped batching here would only multiply peak memory (a codec that
    * amortizes real per-batch setup, like [[Binary.decodeBatch]]'s shape,
    * is where batching earns its buffer). */
  def features(spark: SparkSession, dir: String): Dataset[WavFeatures] = {
    import spark.implicits._
    records(spark, dir).map(featuresOf)
  }

  /** Fixed 64-sample frame energies — the audio analog of keyframe
    * sampling: per-frame Σ s² (exact BIGINT) + peak, one row per frame,
    * payload never leaves its partition. */
  def frameEnergies(records: Dataset[WavRecord], frameLen: Int = 64): Dataset[WavFrame] = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      val w = decodeWav(r.payload)
      w.samples.grouped(frameLen).zipWithIndex.map { case (frame, fi) =>
        var e = 0L; var pk = 0
        frame.foreach { s => e += s.toLong * s; if (math.abs(s) > pk) pk = math.abs(s) }
        WavFrame(r.doc_id, fi, frame.length, e, pk)
      }
    }
  }
}
