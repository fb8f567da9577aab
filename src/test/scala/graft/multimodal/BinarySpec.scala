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
