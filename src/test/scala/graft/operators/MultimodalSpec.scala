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

  test("ImageHeader parses a hand-built PNG IHDR") {
    // signature + IHDR(len 13, 640x480, depth 8, truecolor) — CRC left zero:
    // a header sniffer reads dimensions without verifying chunk CRCs
    val png = Array[Int](
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',
      0x00, 0x00, 0x02, 0x80, // width 640
      0x00, 0x00, 0x01, 0xe0, // height 480
      0x08, 0x02, 0x00, 0x00, 0x00,
      0x00, 0x00, 0x00, 0x00).map(_.toByte)
    assert(ImageHeader.parse(png).contains(("png", 640, 480)))
  }

  test("ImageHeader parses a JPEG SOF0 behind an APP0 segment") {
    // SOI + APP0 (JFIF stub, length 16) + SOF0 with height 333, width 222
    val jpeg = (Array[Int](0xff, 0xd8, 0xff, 0xe0, 0x00, 0x10)
      ++ Array.fill(14)(0x4a) // APP0 body (length covers these 14 + 2)
      ++ Array[Int](0xff, 0xc0, 0x00, 0x11, 0x08,
        0x01, 0x4d, // height 333
        0x00, 0xde, // width 222
        0x03, 0x01, 0x11, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01))
      .map(_.toByte)
    assert(ImageHeader.parse(jpeg).contains(("jpeg", 222, 333)))
  }

  test("ImageHeader rejects garbage, truncated, and empty payloads") {
    assert(ImageHeader.parse(Array.empty[Byte]).isEmpty)
    assert(ImageHeader.parse("not an image".getBytes("UTF-8")).isEmpty)
    // PNG signature but truncated before the dimensions
    assert(ImageHeader.parse(Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a,
      0x1a, 0x0a, 0x00, 0x00).map(_.toByte)).isEmpty)
  }

  test("imagePayload bytes round-trip through the real header decode") {
    val df = Seq((2L, "even doc -> png", 15L), (3L, "odd doc -> jpeg", 15L))
      .toDF("doc_id", "text", "n_chars")
    val media = Multimodal.imagePayload(df)
      .select($"doc_id", $"payload").as[Multimodal.Media]
    val feats = Multimodal.decodeImage(media).collect()
      .map(f => f.doc_id -> f).toMap
    // width = n_chars % 512 + 1 = 16; height = doc_id % 384 + 1
    assert(feats(2L).format == "png")
    assert(feats(2L).width == 16 && feats(2L).height == 3)
    assert(feats(3L).format == "jpeg")
    assert(feats(3L).width == 16 && feats(3L).height == 4)
    assert(feats(3L).n_pixels == 16L * 4)
    // and the synthesized PNG really is a PNG: correct CRC32 over IHDR
    val payload = Multimodal.imagePayload(df).filter($"doc_id" === 2L)
      .select($"payload").as[Array[Byte]].first()
    val crc = new java.util.zip.CRC32()
    crc.update(payload, 12, 17) // "IHDR" + 13 data bytes
    val stored = ((payload(29) & 0xffL) << 24) | ((payload(30) & 0xffL) << 16) |
      ((payload(31) & 0xffL) << 8) | (payload(32) & 0xffL)
    assert(crc.getValue == stored)
  }

  test("WavHeader parses a hand-built PCM WAV and rejects malformed payloads") {
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    val data = Array.fill[Byte](4 * 2 * 2)(0) // 4 samples, stereo, 16-bit
    val wav = "RIFF".getBytes ++ le(36L + data.length, 4) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le(16, 4) ++ le(1, 2) ++ le(2, 2) ++ le(44100, 4) ++
      le(44100L * 2 * 2, 4) ++ le(4, 2) ++ le(16, 2) ++
      "data".getBytes ++ le(data.length, 4) ++ data
    assert(WavHeader.parse(wav).contains((44100L, 2L, 16L, 4L)))
    assert(WavHeader.parse("RIFFxxxxNOPE".getBytes).isEmpty)
    assert(WavHeader.parse(Array.empty[Byte]).isEmpty)
    // fmt present but no data chunk -> malformed
    val noData = "RIFF".getBytes ++ le(28, 4) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le(16, 4) ++ le(1, 2) ++ le(1, 2) ++ le(8000, 4) ++
      le(16000, 4) ++ le(2, 2) ++ le(16, 2)
    assert(WavHeader.parse(noData).isEmpty)
  }

  test("audioPayload bytes round-trip through the RIFF walker") {
    val df = Seq((1L, "x", 7L), (2L, "y", 10L)).toDF("doc_id", "text", "n_chars")
    val feats = Multimodal.audioFeatures(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: rate 8000*(1%3+1)=16000, ch 7%2+1=2, ns 200+7=207
    assert(feats(1L).getAs[Long]("sample_rate") == 16000L)
    assert(feats(1L).getAs[Long]("channels") == 2L)
    assert(feats(1L).getAs[Long]("n_samples") == 207L)
    assert(feats(1L).getAs[Long]("duration_ms") == 207L * 1000 / 16000)
    // doc 2: rate 8000*(2%3+1)=24000, ch 10%2+1=1, ns 210
    assert(feats(2L).getAs[Long]("sample_rate") == 24000L)
    assert(feats(2L).getAs[Long]("channels") == 1L)
    assert(feats(2L).getAs[Long]("bits") == 16L)
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

  test("Mp4Header walks a hand-built container and rejects malformed ones") {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tag: String, body: Array[Byte]): Array[Byte] =
      be32(8L + body.length) ++ tag.getBytes("US-ASCII") ++ body
    val mvhd = box("mvhd",
      Array.fill[Byte](4)(0) ++           // version 0 + flags
      Array.fill[Byte](8)(0) ++           // creation/modification
      be32(600L) ++ be32(1500L) ++        // timescale, duration
      Array.fill[Byte](100 - 24)(0))      // rest of the v0 body
    val mp4 = box("ftyp", "isom".getBytes ++ be32(0L) ++ "isom".getBytes) ++
      box("moov", mvhd) ++ box("mdat", Array.fill[Byte](42)(0))
    assert(Mp4Header.parse(mp4).contains((600L, 1500L, 42L, 3L)))
    // truncated box size beyond buffer, and missing ftyp, both reject
    assert(Mp4Header.parse(mp4.dropRight(10)).isEmpty)
    assert(Mp4Header.parse(box("moov", mvhd)).isEmpty)
    assert(Mp4Header.parse(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("videoPayload bytes round-trip through the box walker") {
    val docs = graft.sources.Tables.documents(spark, sf).limit(50)
    val feats = Multimodal.videoFeatures(docs).collect()
    assert(feats.length == 50)
    feats.foreach { r =>
      assert(r.getLong(1) == 600L)                       // timescale
      assert(r.getLong(3) == r.getLong(2) * 1000 / 600)  // duration_ms
      assert(r.getLong(4) >= 100L && r.getLong(4) < 500L)
      assert(r.getLong(5) == 3L)                         // ftyp/moov/mdat
    }
  }
}
