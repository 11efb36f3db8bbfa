package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("asBinary derives payload bytes + typed metadata") {
    val df = Seq((1L, "hello")).toDF("doc_id", "text")
    val r = Multimodal.asBinary(df).first()
    assert(r.getAs[Array[Byte]]("payload").toSeq == "hello".getBytes("UTF-8").toSeq)
    assert(r.getAs[Long]("n_bytes") == 5L)
    assert(r.getAs[String]("magic") == "68656c6c") // 'hell'
  }

  test("decode stub is deterministic and partition-shaped (iterator in/out)") {
    val df = Seq((1L, "A0xyz"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.asBinary(df)
      .select($"doc_id", $"payload").as[Multimodal.Media]
    val feats = Multimodal.decodeImageStub(media).collect()
      .map(f => f.doc_id -> f).toMap
    // 'A'=65 -> width 65%64+1=2; '0'=48 -> height 48%64+1=49
    assert(feats(1L).width == 2 && feats(1L).height == 49)
    assert(feats(1L).n_pixels == 2L * 49)
    assert(feats(2L).width == 1 && feats(2L).height == 1) // empty payload
  }

  test("frameSample slices the payload into bounded, stride-sized frames") {
    val text = "x" * 300
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = Multimodal.frameSample(Multimodal.asBinary(df), stride = 64, maxFrames = 8)
      .first()
    val frames = r.getSeq[Array[Byte]](1)
    assert(r.getAs[Long]("n_frames") == 4L) // 300/64 = 4 frames
    assert(frames.head.length == 64)
  }
}
