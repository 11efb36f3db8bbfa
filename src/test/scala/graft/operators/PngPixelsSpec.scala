package graft.operators

import graft.SparkSpec

class PngPixelsSpec extends SparkSpec {
  import spark.implicits._

  test("PngCodec roundtrips arbitrary grayscale pixels through all five filters") {
    val rnd = new scala.util.Random(42)
    (1 to 25).foreach { _ =>
      // h >= 5 so the y % 5 filter cycle hits None/Sub/Up/Average/Paeth
      val w = 1 + rnd.nextInt(40)
      val h = 5 + rnd.nextInt(20)
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val png = PngCodec.encodeGray(w, h, px)
      val back = PngCodec.decodeGray(png)
      assert(back.isDefined)
      val (dw, dh, dpx) = back.get
      assert(dw == w && dh == h)
      assert(dpx.toSeq == px.toSeq)
    }
  }

  test("decodeGray rejects malformed containers instead of failing") {
    assert(PngCodec.decodeGray(Array[Byte](1, 2, 3)).isEmpty)
    val good = PngCodec.encodeGray(4, 4, new Array[Byte](16))
    assert(PngCodec.decodeGray(good.take(30)).isEmpty) // truncated
    val sig = good.clone; sig(0) = 0 // broken signature
    assert(PngCodec.decodeGray(sig).isEmpty)
    // truecolor profile (color type 2) is out of the grayscale profile
    val ct = good.clone; ct(25) = 2
    assert(PngCodec.decodeGray(ct).isEmpty)
  }

  test("decodeGray concatenates split IDAT chunks per spec") {
    val px = Array.tabulate(8 * 8)(i => (i * 7).toByte)
    val one = PngCodec.encodeGray(8, 8, px)
    // re-chunk: split the single IDAT payload into two IDATs
    def be(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]) = {
      val crc = new java.util.zip.CRC32
      val tb = typ.getBytes("US-ASCII")
      crc.update(tb); crc.update(data)
      be(data.length) ++ tb ++ data ++ be(crc.getValue.toInt)
    }
    val ihdrLen = 13
    val idatStart = 8 + 12 + ihdrLen
    val idatLen = ((one(idatStart) & 0xff) << 24) | ((one(idatStart + 1) & 0xff) << 16) |
      ((one(idatStart + 2) & 0xff) << 8) | (one(idatStart + 3) & 0xff)
    val z = one.slice(idatStart + 8, idatStart + 8 + idatLen)
    val split = one.take(idatStart) ++
      chunk("IDAT", z.take(z.length / 2)) ++
      chunk("IDAT", z.drop(z.length / 2)) ++
      chunk("IEND", Array.emptyByteArray)
    val back = PngCodec.decodeGray(split)
    assert(back.isDefined && back.get._3.toSeq == px.toSeq)
  }

  test("phash roundtrip matches the direct-formula hash (codec is transparent)") {
    val ids = (0L until 50L).map(java.lang.Long.valueOf)
    val rows = ImagePhash.phash(ImagePhash.synthesize(spark.createDataset(ids)))
      .collect().sortBy(_.img_id)
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.width == 32 && r.height == 32)
      // recompute from the formula without any PNG in the path
      var total = 0L
      val cells = new Array[Long](64)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = ImagePhash.pixel(r.img_id, x, y).toLong
        total += v
        cells((y / 4) * 8 + (x / 4)) += v
      }
      assert(r.px_sum == total)
      var hi = 0L; var lo = 0L
      for (ci <- 0 until 64 if cells(ci) * 64 > total)
        if (ci < 32) lo |= 1L << ci else hi |= 1L << (ci - 32)
      assert(r.a_hash_hi == hi && r.a_hash_lo == lo)
    }
  }

  test("corruption flips exactly one hash bit; noise flips none") {
    def hash(id: Long): (Long, Long) = {
      var total = 0L
      val cells = new Array[Long](64)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = ImagePhash.pixel(id, x, y).toLong
        total += v; cells((y / 4) * 8 + (x / 4)) += v
      }
      var hi = 0L; var lo = 0L
      for (ci <- 0 until 64 if cells(ci) * 64 > total)
        if (ci < 32) lo |= 1L << ci else hi |= 1L << (ci - 32)
      (hi, lo)
    }
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    // ids 1 and 8: same base (1 mod 7), neither corrupted (1, 8 not % 3 == 0)
    assert(ham(hash(1L), hash(8L)) == 0)
    // id 15: base 1, corrupted (15 % 3 == 0) — exactly one cell inverted
    assert(ham(hash(1L), hash(15L)) == 1)
    // different bases diverge by many bits
    assert(ham(hash(1L), hash(2L)) > 3)
  }

  test("nearPairs banded join finds exactly the brute-force Hamming 1..3 pairs") {
    val ids = (0L until 120L).map(java.lang.Long.valueOf)
    val ph = ImagePhash.phash(ImagePhash.synthesize(spark.createDataset(ids))).toDF()
    val banded = ImagePhash.nearPairs(ph, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val hs = ph.select("a_hash_hi", "a_hash_lo").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      a <- hs; b <- hs
      if a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      d = java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
      if d >= 1 && d <= 3
    } yield (a._1, a._2, b._1, b._2, d.toLong)).toSet
    assert(banded == brute)
    assert(brute.nonEmpty) // the fixture formula plants such pairs
  }

  test("exactGroups collapses clean same-base images to one representative") {
    val ids = (0L until 42L).map(java.lang.Long.valueOf)
    val groups = ImagePhash.exactGroups(
      ImagePhash.phash(ImagePhash.synthesize(spark.createDataset(ids))).toDF())
      .collect()
    // every clean (id % 3 != 0) image of base b shares one hash; reps are
    // minimal ids; corrupted images form their own small groups
    val multi = groups.filter(_.getAs[Long]("n_images") > 1)
    assert(multi.length >= 7) // one per base at least
    assert(groups.map(_.getAs[Long]("rep_id")).distinct.length == groups.length)
  }
}
