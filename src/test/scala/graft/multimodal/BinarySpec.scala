package graft.multimodal

import graft.SparkSpec

/** Multimodal plumbing: typed records survive the partition-batched decode
  * stub and the fake features are deterministic. */
class BinarySpec extends SparkSpec {

  test("decode stub is deterministic and batch-size independent") {
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
    assert(f.map(_.media_type).toSet == Set("image/png", "audio/wav", "video/mp4"))
    // checksum changes when payload changes
    val r1 = Binary.decodeBatch(Seq(Binary.MMRecord(1, "abc".getBytes, "image/png", 1, 1))).head
    val r2 = Binary.decodeBatch(Seq(Binary.MMRecord(1, "abd".getBytes, "image/png", 1, 1))).head
    assert(r1.checksum != r2.checksum)
  }
}
