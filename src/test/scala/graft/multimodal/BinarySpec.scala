package graft.multimodal

import graft.SparkSpec

/** Multimodal plumbing + the real P6 codec: the parser handles arbitrary
  * whitespace and comment headers, computes channel means from actual pixel
  * bytes, and the partition-batched decode is deterministic. */
class BinarySpec extends SparkSpec {

  test("decodePpm parses a handcrafted image: header, comments, channel means") {
    // 2x2 image, comment line in the header, known pixel bytes
    val header = "P6\n# synthetic fixture\n2 2\n255\n".getBytes("US-ASCII")
    val pixels = Array[Int](
      10, 20, 30,   40, 60, 80,      // row 0: two pixels
      200, 220, 250, 250, 100, 0     // row 1
    ).map(_.toByte)
    val ppm = Binary.decodePpm(header ++ pixels)
    assert(ppm.width == 2 && ppm.height == 2 && ppm.maxval == 255)
    assert(ppm.rMean == (10 + 40 + 200 + 250) / 4.0)
    assert(ppm.gMean == (20 + 60 + 220 + 100) / 4.0)
    assert(ppm.bMean == (30 + 80 + 250 + 0) / 4.0)
  }

  test("decodePpm rejects malformed payloads instead of guessing") {
    intercept[IllegalArgumentException](Binary.decodePpm("abc".getBytes))
    // truncated pixel data: header promises 2x2 but carries one pixel
    val bad = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    intercept[IllegalArgumentException](Binary.decodePpm(bad))
  }

  test("synthesized payloads are valid P6 and decode to their formula fields") {
    val p = Binary.ppmPayload(docId = 5L, nChars = 100L)
    val ppm = Binary.decodePpm(p)
    assert(ppm.width == 100 % 64 + 1 && ppm.height == 100 % 48 + 1)
    assert(ppm.rMean == (5 * 31) % 256 && ppm.gMean == (5 * 31 + 7) % 256 &&
      ppm.bMean == (5 * 31 + 14) % 256)
  }

  test("decode is deterministic and batch-size independent") {
    val a = Binary.features(spark, sf("sf0.001"), batchSize = 7).collect().sortBy(_.doc_id)
    val b = Binary.features(spark, sf("sf0.001"), batchSize = 64).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
  }

  test("frame sampling keeps every k-th 16-byte frame with correct lengths") {
    import spark.implicits._
    val recs = Seq(Binary.MMRecord(7L, ("x" * 70).getBytes, "video/mp4", 1, 1)).toDS()
    val frames = Binary.frameSample(recs, everyK = 2).collect().sortBy(_.frame_idx)
    // 70 bytes -> frames 0..4 (last is 6 bytes); every 2nd -> idx 0, 2, 4
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(frames.map(_.frame_len).toSeq == Seq(16, 16, 6))
    assert(frames.forall(_.first_byte == 'x'.toInt))
  }

  test("features derive from payload bytes") {
    val f = Binary.features(spark, sf("sf0.001")).collect()
    assert(f.forall(x => x.byte_len > 0 && x.frame_count == x.byte_len / 16))
    assert(f.forall(x => x.media_type == "image/ppm" && x.maxval == 255))
    // checksum changes when any payload byte changes
    val p = Binary.ppmPayload(1L, 50L)
    val p2 = p.clone(); p2(p2.length - 1) = (p2(p2.length - 1) ^ 1).toByte
    val r1 = Binary.decodeBatch(Seq(Binary.MMRecord(1, p, "image/ppm", 1, 1))).head
    val r2 = Binary.decodeBatch(Seq(Binary.MMRecord(1, p2, "image/ppm", 1, 1))).head
    assert(r1.checksum != r2.checksum)
  }
}
