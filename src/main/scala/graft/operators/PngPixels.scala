package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A REAL grayscale PNG pixel codec — the full-decode step the header-sniff
  * lane ([[ImageHeader]]) deliberately stops short of: zlib-compressed IDAT
  * scanlines with all five PNG filter types (None/Sub/Up/Average/Paeth,
  * RFC 2083 §6), encoded with `java.util.zip.Deflater` and decoded back
  * with `Inflater` + spec-complete unfiltering. The encoder cycles the
  * filter type per scanline, so a decoder bug in ANY filter breaks the
  * bit-exact pixel oracle downstream.
  *
  * Pure JVM, no codec libraries — this is the "decode step" of the
  * multimodal contract made real for the one format where the container
  * math (DEFLATE + byte-prediction filters) is itself public spec. */
object PngCodec {
  private val Sig = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def chunk(out: ByteArrayOutputStream, typ: String,
                    data: Array[Byte]): Unit = {
    val len = data.length
    out.write(Array[Byte](((len >> 24) & 0xff).toByte, ((len >> 16) & 0xff).toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte))
    val tb = typ.getBytes("US-ASCII")
    val crc = new CRC32
    crc.update(tb); crc.update(data)
    out.write(tb); out.write(data)
    val c = crc.getValue
    out.write(Array[Byte](((c >> 24) & 0xff).toByte, ((c >> 16) & 0xff).toByte,
      ((c >> 8) & 0xff).toByte, (c & 0xff).toByte))
  }

  /** PaethPredictor per the PNG spec: nearest of left/above/upper-left to
    * the linear estimate a + b - c, ties in that order. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode 8-bit grayscale pixels (row-major, length w*h) as a complete
    * PNG; scanline y uses filter type y % 5, exercising every predictor. */
  def encodeGray(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    require(px.length == w * h, s"pixel buffer ${px.length} != ${w}x$h")
    val raw = new Array[Byte](h * (w + 1))
    var y = 0
    while (y < h) {
      val f = y % 5
      raw(y * (w + 1)) = f.toByte
      var x = 0
      while (x < w) {
        val cur = px(y * w + x) & 0xff
        val left = if (x > 0) px(y * w + x - 1) & 0xff else 0
        val above = if (y > 0) px((y - 1) * w + x) & 0xff else 0
        val ul = if (x > 0 && y > 0) px((y - 1) * w + x - 1) & 0xff else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - above
          case 3 => cur - ((left + above) / 2)
          case 4 => cur - paeth(left, above, ul)
        }
        raw(y * (w + 1) + 1 + x) = (filtered & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION)
    defl.setInput(raw); defl.finish()
    val zout = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new ByteArrayOutputStream()
    Sig.foreach(b => out.write(b))
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >> 24) & 0xff).toByte; ihdr(1) = ((w >> 16) & 0xff).toByte
    ihdr(2) = ((w >> 8) & 0xff).toByte; ihdr(3) = (w & 0xff).toByte
    ihdr(4) = ((h >> 24) & 0xff).toByte; ihdr(5) = ((h >> 16) & 0xff).toByte
    ihdr(6) = ((h >> 8) & 0xff).toByte; ihdr(7) = (h & 0xff).toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type: grayscale
    // ihdr(10..12): compression 0, filter 0, interlace 0
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zout.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode an 8-bit grayscale non-interlaced PNG back to (w, h, pixels):
    * chunk walk (multiple IDATs concatenate per spec), one Inflater pass,
    * per-scanline unfilter of whichever of the five types the encoder
    * chose. Returns None for anything malformed or out of this profile —
    * corrupt media is data, not an error. */
  def decodeGray(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 8 || !(0 until 8).forall(i => (b(i) & 0xff) == Sig(i)))
      return None
    var pos = 8
    var w = -1; var h = -1
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done && pos + 8 <= b.length) {
      val len = ((b(pos) & 0xff) << 24) | ((b(pos + 1) & 0xff) << 16) |
        ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
      val typ = new String(b.slice(pos + 4, pos + 8), "US-ASCII")
      if (len < 0 || pos + 12 + len > b.length) return None
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = ((b(pos + 8) & 0xff) << 24) | ((b(pos + 9) & 0xff) << 16) |
            ((b(pos + 10) & 0xff) << 8) | (b(pos + 11) & 0xff)
          h = ((b(pos + 12) & 0xff) << 24) | ((b(pos + 13) & 0xff) << 16) |
            ((b(pos + 14) & 0xff) << 8) | (b(pos + 15) & 0xff)
          // profile: 8-bit grayscale, deflate, adaptive filters, no interlace
          if ((b(pos + 16) & 0xff) != 8 || (b(pos + 17) & 0xff) != 0 ||
            (b(pos + 18) & 0xff) != 0 || (b(pos + 19) & 0xff) != 0 ||
            (b(pos + 20) & 0xff) != 0) return None
        case "IDAT" => idat.write(b, pos + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skip
      }
      pos += 12 + len
    }
    if (w <= 0 || h <= 0 || idat.size() == 0) return None
    val raw = new Array[Byte](h * (w + 1))
    val infl = new Inflater()
    infl.setInput(idat.toByteArray)
    var off = 0
    while (!infl.finished() && off < raw.length) {
      val n = infl.inflate(raw, off, raw.length - off)
      if (n == 0 && infl.needsInput()) return None // truncated stream
      off += n
    }
    infl.end()
    if (off != raw.length) return None
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val f = raw(y * (w + 1)) & 0xff
      var x = 0
      while (x < w) {
        val v = raw(y * (w + 1) + 1 + x) & 0xff
        val left = if (x > 0) px(y * w + x - 1) & 0xff else 0
        val above = if (y > 0) px((y - 1) * w + x) & 0xff else 0
        val ul = if (x > 0 && y > 0) px((y - 1) * w + x - 1) & 0xff else 0
        val rec = f match {
          case 0 => v
          case 1 => v + left
          case 2 => v + above
          case 3 => v + ((left + above) / 2)
          case 4 => v + paeth(left, above, ul)
          case _ => return None
        }
        px(y * w + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }
}

/** Perceptual image dedup — the LAION-style pipeline stage: decode pixels,
  * compute an 8x8 AVERAGE HASH (grayscale block means thresholded against
  * the global mean → 64 bits), then near-duplicate images are hash pairs
  * within a small Hamming distance. Recompression, format shifts, and
  * pixel-level noise perturb bytes but not block structure, so exact-byte
  * dedup misses what this catches.
  *
  * The fixtures carry no image files, so [[synthesize]] builds one REAL
  * 32x32 grayscale PNG per document from a deterministic pixel formula
  * (also the oracle's formula — see [[pixel]]); [[phashTable]] then decodes
  * those containers back through the full [[PngCodec]] path (zlib + all
  * five filters) and hashes the recovered pixels. `px_sum` is the total
  * pixel mass — any decode defect anywhere breaks its bit-exact match.
  *
  * The formula plants structure worth finding: 7 base patterns (doc_id
  * mod 7) so each pattern recurs across many docs; every third document
  * additionally INVERTS one 4x4 cell (doc_id mod 64), producing hashes at
  * Hamming distance 1-2 from their clean siblings; and a +0..2 per-pixel
  * noise term that perturbs bytes without ever flipping a hash bit (cell
  * margins are ~1400 counts vs noise <= 32). So exact-hash groups catch
  * the clean copies and the banded Hamming join catches the corrupted
  * ones — each lane has real work.
  *
  * Scale shape at 100 TB: payload bytes never shuffle — synth/decode/hash
  * are partition-local maps and only (img_id, 2x32-bit hash, px_sum) rows
  * move. Near-dup candidates come from a 4x16-bit BAND join at the
  * DISTINCT-HASH grain (images collapse to hashes first — the population
  * of distinct perceptual hashes is orders smaller than the image count);
  * pigeonhole guarantees recall for Hamming <= 3 with 4 bands. Exactly the
  * [[NearDup.simhash]] discipline applied to pixels. */
object ImagePhash {
  val Dim = 32

  /** Deterministic pixel value (also the oracle's formula, in DuckDB SQL):
    * cell ci = (y/4)*8 + x/4; bright iff ((ci+1)*(id%7+2)) % 11 < 5,
    * XOR-inverted for cell id%64 when id%3 == 0; 200/40 base + (x*31 +
    * y*17 + id) % 3 noise. */
  def pixel(id: Long, x: Int, y: Int): Int = {
    val base = (id % 7).toInt
    val ci = (y / 4) * 8 + (x / 4)
    val bright = ((ci + 1) * (base + 2)) % 11 < 5
    val corrupt = id % 3 == 0 && ci == (id % 64).toInt
    val lit0 = if (bright != corrupt) 200 else 40
    lit0 + ((x * 31 + y * 17 + id) % 3).toInt
  }

  case class Img(img_id: Long, payload: Array[Byte])
  case class PhashRow(img_id: Long, width: Long, height: Long, px_sum: Long,
                      a_hash_hi: Long, a_hash_lo: Long)

  /** One real PNG per id — partition-local synthesis (Deflater needs the
    * JVM; the bytes are the point). */
  def synthesize(ids: Dataset[java.lang.Long]): Dataset[Img] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      it.map { boxed =>
        val id = boxed.longValue()
        val px = new Array[Byte](Dim * Dim)
        var y = 0
        while (y < Dim) {
          var x = 0
          while (x < Dim) { px(y * Dim + x) = pixel(id, x, y).toByte; x += 1 }
          y += 1
        }
        Img(id, PngCodec.encodeGray(Dim, Dim, px))
      }
    }
  }

  /** Decode + average-hash, partition-local. The 64-bit hash travels as
    * two 32-bit halves in BIGINTs (no sign traps in either engine);
    * bit ci lives in (ci < 32 ? lo : hi) at position ci % 32. Threshold is
    * the integer cross-multiply cell_sum * 64 > total — no division. */
  def phash(images: Dataset[Img]): Dataset[PhashRow] = {
    import images.sparkSession.implicits._
    images.mapPartitions { it =>
      it.map { img =>
        PngCodec.decodeGray(img.payload) match {
          case Some((w, h, px)) =>
            val cells = new Array[Long](64)
            var total = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = (px(y * w + x) & 0xff).toLong
                cells((y * 8 / h) * 8 + (x * 8 / w)) += v
                total += v
                x += 1
              }
              y += 1
            }
            var hi = 0L; var lo = 0L
            var ci = 0
            while (ci < 64) {
              if (cells(ci) * 64 > total) {
                if (ci < 32) lo |= 1L << ci else hi |= 1L << (ci - 32)
              }
              ci += 1
            }
            PhashRow(img.img_id, w.toLong, h.toLong, total, hi, lo)
          case None => PhashRow(img.img_id, 0L, 0L, 0L, 0L, 0L)
        }
      }
    }
  }

  /** End-to-end per-image hash table over the documents' id space. */
  def phashTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    phash(synthesize(docs.select(col("doc_id")).as[java.lang.Long]))
      .toDF().orderBy("img_id")
  }

  /** Exact-hash dedup groups: one row per distinct perceptual hash with
    * the min-id representative and member count — the hard-dedup lane. */
  def exactGroups(ph: DataFrame): DataFrame =
    ph.groupBy("a_hash_hi", "a_hash_lo")
      .agg(min(col("img_id")).as("rep_id"), count(lit(1)).as("n_images"))
      .select("rep_id", "n_images", "a_hash_hi", "a_hash_lo")
      .orderBy("rep_id")

  /** Near-duplicate HASH pairs at 1 <= Hamming <= maxHamming, found by a
    * banded self-join over distinct hashes: each hash explodes into 4
    * 16-bit bands; pairs sharing any band meet once per shared band and
    * collapse through distinct(); bit_count(xor) verifies. With 4 bands,
    * recall is exact for maxHamming <= 3 (pigeonhole: 3 flipped bits
    * cannot touch all 4 bands). */
  def nearPairs(ph: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4, "4 bands guarantee recall only below 4 bit flips")
    val hashes = ph.select(col("a_hash_hi").as("hi"), col("a_hash_lo").as("lo"))
      .distinct()
    val bands = hashes.select(col("hi"), col("lo"),
      posexplode(array(
        col("lo").bitwiseAND(lit(0xffffL)),
        shiftright(col("lo"), 16).bitwiseAND(lit(0xffffL)),
        col("hi").bitwiseAND(lit(0xffffL)),
        shiftright(col("hi"), 16).bitwiseAND(lit(0xffffL)))))
      .toDF("hi", "lo", "band_idx", "band_val")
    val x = bands.as("x"); val y = bands.as("y")
    val cand = x.join(y,
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_val") === col("y.band_val") &&
        (col("x.hi") < col("y.hi") ||
          (col("x.hi") === col("y.hi") && col("x.lo") < col("y.lo"))))
      .select(col("x.hi").as("a_hi"), col("x.lo").as("a_lo"),
        col("y.hi").as("b_hi"), col("y.lo").as("b_lo"))
      .distinct()
    cand.withColumn("hamming",
        (bit_count(col("a_hi").bitwiseXOR(col("b_hi"))) +
         bit_count(col("a_lo").bitwiseXOR(col("b_lo")))).cast("long"))
      .filter(col("hamming") >= 1 && col("hamming") <= maxHamming)
      .orderBy("a_hi", "a_lo", "b_hi", "b_lo")
  }
}
