package graft.operators

import graft.SparkSpec

class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  test("WavPcmCodec roundtrips arbitrary int16 sample streams") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val n = 1 + rnd.nextInt(600)
      val s = Array.fill(n)(rnd.nextInt(65536).toShort)
      val rate = 8000 * (1 + rnd.nextInt(6))
      val wav = WavPcmCodec.encodePcm16(rate, s)
      val back = WavPcmCodec.decodePcm16(wav)
      assert(back.isDefined)
      assert(back.get._1 == rate)
      assert(back.get._2.toSeq == s.toSeq)
    }
  }

  test("decodePcm16 rejects non-PCM / malformed / stereo profiles") {
    assert(WavPcmCodec.decodePcm16(Array[Byte](1, 2, 3)).isEmpty)
    val good = WavPcmCodec.encodePcm16(8000, Array[Short](1, 2, 3))
    assert(WavPcmCodec.decodePcm16(good.take(30)).isEmpty) // truncated data
    val stereo = good.clone; stereo(22) = 2 // channels = 2
    assert(WavPcmCodec.decodePcm16(stereo).isEmpty)
  }

  test("decodePcm16 skips ancillary chunks and honors odd-size padding") {
    val s = Array[Short](10, -20, 30)
    val base = WavPcmCodec.encodePcm16(16000, s)
    // splice a 3-byte LIST chunk (padded to 4) between fmt and data
    val fmtEnd = 12 + 8 + 16
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 'x', 'y', 'z', 0)
    val spliced = base.take(fmtEnd) ++ junk ++ base.drop(fmtEnd)
    val back = WavPcmCodec.decodePcm16(spliced)
    assert(back.isDefined && back.get._2.toSeq == s.toSeq)
  }

  test("fingerprint roundtrip matches the direct-formula hash") {
    val ids = (0L until 60L).map(java.lang.Long.valueOf)
    val rows = AudioFingerprint.fingerprint(
      AudioFingerprint.synthesize(spark.createDataset(ids)))
      .collect().sortBy(_.doc_id)
    assert(rows.length == 60)
    rows.foreach { r =>
      val id = r.doc_id
      val n = AudioFingerprint.nSamples(id)
      assert(r.n_samples == n.toLong)
      assert(r.sample_rate == AudioFingerprint.rate(id).toLong)
      val frames = new Array[Long](32)
      var total = 0L
      for (i <- 0 until n) {
        val a = math.abs(AudioFingerprint.sample(id, i).toLong)
        frames(i * 32 / n) += a; total += a
      }
      assert(r.energy_sum == total)
      var fp = 0L
      for (f <- 0 until 32 if frames(f) * 32 > total) fp |= 1L << f
      assert(r.fp == fp)
    }
    // the gain pattern gives every track loud frames: no degenerate 0 fps,
    // and the hash is discriminative (tracks differ in wave AND length, so
    // their frame-energy profiles differ)
    assert(rows.forall(_.fp != 0L))
    assert(rows.map(_.fp).distinct.length > 1)
  }
}
