package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Pure-JVM image header decoding — no codec libraries, just the public
  * container formats:
  *
  *   - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the IHDR chunk
  *     (4-byte length, "IHDR", 4-byte big-endian width, 4-byte big-endian
  *     height, ...). Width/height live at fixed offsets 16..23.
  *   - JPEG: `FF D8` (SOI), then marker segments; the frame header (SOFn,
  *     `FF C0..CF` except C4/C8/CC) carries 1-byte precision, 2-byte
  *     big-endian height, 2-byte big-endian width after the segment length.
  *     Segments are skipped via their big-endian length field, so APPn/COM
  *     metadata before the SOF is handled.
  *
  * This is a real decode of real bytes — exactly what a header-sniffing
  * ingest stage does at scale, where decoding full pixels to learn
  * dimensions would be a 1000x waste.
  */
object ImageHeader {
  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  def parsePng(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length < 24) return None
    if (!(0 until 8).forall(i => u8(b, i) == PngSig(i))) return None
    // bytes 12..15 must be the IHDR chunk type
    if (!(u8(b, 12) == 'I' && u8(b, 13) == 'H' && u8(b, 14) == 'D' && u8(b, 15) == 'R'))
      return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(("png", w.toInt, h.toInt))
  }

  /** SOFn markers carrying frame dimensions (C4 = DHT, C8 = JPG extension,
    * CC = DAC are NOT frame headers). */
  private def isSof(marker: Int): Boolean =
    marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc

  def parseJpeg(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // desynced — not a marker stream
      val marker = u8(b, i + 1)
      if (marker == 0xff) { i += 1 } // fill byte padding
      else if (marker >= 0xd0 && marker <= 0xd9) { i += 2 } // standalone RSTn/EOI
      else if (isSof(marker)) {
        if (i + 8 >= b.length) return None
        val h = be16(b, i + 5)
        val w = be16(b, i + 7)
        return if (w > 0 && h > 0) Some(("jpeg", w, h)) else None
      } else {
        val segLen = be16(b, i + 2)
        if (segLen < 2) return None
        i += 2 + segLen
      }
    }
    None
  }

  /** (format, width, height) from the first matching container signature. */
  def parse(b: Array[Byte]): Option[(String, Int, Int)] =
    parsePng(b).orElse(parseJpeg(b))
}

/** Pure-JVM WAV (RIFF) header decoding — the audio counterpart of
  * [[ImageHeader]]: `RIFF <size> WAVE`, then chunks of (4-byte id, 4-byte
  * LITTLE-endian size, body); `fmt ` carries format/channels/rate/bits at
  * fixed offsets, `data`'s size gives the sample count. Chunk bodies pad to
  * even offsets per the RIFF spec. */
object WavHeader {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b.slice(i, i + 4), "US-ASCII")

  /** (sample_rate, channels, bits, n_samples) for a PCM WAV, None if the
    * container is malformed or the fmt/data chunks are missing. */
  def parse(b: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var pos = 12
    var rate = -1L; var ch = -1L; var bits = -1L; var dataSize = -1L
    while (pos + 8 <= b.length) {
      val id = tag(b, pos)
      val size = le32(b, pos + 4)
      if (id == "fmt " && pos + 8 + 16 <= b.length) {
        ch = le16(b, pos + 10).toLong
        rate = le32(b, pos + 12)
        bits = le16(b, pos + 22).toLong
      } else if (id == "data") {
        dataSize = size
      }
      pos += 8 + size.toInt + (size.toInt & 1) // chunks pad to even offsets
    }
    if (rate <= 0 || ch <= 0 || bits <= 0 || dataSize < 0) None
    else Some((rate, ch, bits, dataSize / (ch * bits / 8)))
  }
}

/** Pure-JVM ISO-BMFF (MP4) box walking — the video counterpart of
  * [[ImageHeader]]/[[WavHeader]]: top-level boxes of (4-byte BIG-endian
  * size, 4cc type, body); `moov` nests child boxes the same way; `mvhd`
  * version 0 carries timescale at body offset 12 and duration at 16;
  * `mdat`'s size minus its header is the media payload size
  * (ISO/IEC 14496-12 §8.2.2). */
object Mp4Header {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  private def tag(b: Array[Byte], i: Int): String =
    new String(b.slice(i, i + 4), "US-ASCII")

  /** (timescale, duration, mdat_bytes, n_top_boxes), None if malformed. */
  def parse(b: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    var pos = 0
    var ts = -1L; var dur = -1L; var mdat = -1L; var boxes = 0L
    var sawFtyp = false
    while (pos + 8 <= b.length) {
      val size = be32(b, pos)
      if (size < 8 || pos + size > b.length) return None
      tag(b, pos + 4) match {
        case "ftyp" => sawFtyp = true
        case "mdat" => mdat = size - 8
        case "moov" =>
          var cp = pos + 8
          while (cp + 8 <= pos + size.toInt) {
            val cs = be32(b, cp)
            if (cs < 8 || cp + cs > pos + size) return None
            if (tag(b, cp + 4) == "mvhd" && u8(b, cp + 8) == 0 && cs >= 28) {
              ts = be32(b, cp + 20)  // body offset 12 after 8-byte header
              dur = be32(b, cp + 24)
            }
            cp += cs.toInt
          }
        case _ => ()
      }
      boxes += 1
      pos += size.toInt
    }
    if (!sawFtyp || ts <= 0 || dur < 0 || mdat < 0) None
    else Some((ts, dur, mdat, boxes))
  }
}

/** Multimodal column handling (north star scope): media payloads are opaque
  * `binary` columns with typed metadata travelling alongside; decode /
  * feature-extraction runs partition-wise so batch-oriented decoders amortize
  * setup per partition, not per row.
  *
  * The text fixtures carry no image files, so [[imagePayload]] SYNTHESIZES a
  * valid PNG or JPEG container per document (signature + real IHDR/SOF0
  * header with deterministic dimensions, document bytes as the body) — and
  * [[decodeImage]] then genuinely PARSES those headers back byte-by-byte
  * ([[ImageHeader]]). The synthesis stands in for fixture generation; the
  * decode path is the real thing and round-trips through real container
  * bytes.
  *
  * Scale notes: payload bytes never shuffle in any op here; metadata and
  * features are narrow maps. For 100 TB of media you partition by file/object
  * locality at ingest and keep features (tiny) separate from payloads (huge)
  * so downstream analytics never rescans the bytes.
  */
object Multimodal {

  /** Typed row for the partition-wise decode path. */
  case class Media(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, format: String, width: Int,
                           height: Int, n_pixels: Long, n_bytes: Long)
  case class AudioFeatures(doc_id: Long, sample_rate: Long, channels: Long,
                           bits: Long, n_samples: Long, duration_ms: Long)

  /** Attach an opaque binary payload + typed metadata to each document.
    * (Fixture stand-in: the utf-8 bytes of `text` play the role of an
    * encoded media object.) */
  def asBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("magic", lower(hex(substring(col("payload"), 1, 4))))
      .withColumn("content_type", lit("application/octet-stream"))

  /** Big-endian unsigned int as `width` bytes (hex-string round-trip — all
    * codegen'd built-ins, no UDF). */
  private def bytesBE(v: Column, width: Int): Column =
    unhex(lpad(hex(v.cast("bigint")), width * 2, "0"))

  /** Deterministic per-document image dimensions (also the oracle's formula):
    * width from the document's character count, height from its id — spans
    * 1..512 x 1..384 so the resize path sees both scaled and pass-through
    * shapes. */
  def imgWidth: Column = (pmod(col("n_chars"), lit(512)) + 1).cast("int")
  def imgHeight: Column = (pmod(col("doc_id"), lit(384)) + 1).cast("int")

  /** Build a VALID image container per document: even doc_ids get a PNG
    * (signature + IHDR with correct CRC32), odd doc_ids a baseline JPEG
    * (SOI + SOF0 frame header), with the document's utf-8 bytes as the
    * opaque body. The headers are bit-correct — [[ImageHeader.parse]] (and
    * any standards-conforming sniffer) reads the dimensions back. Pure
    * codegen'd expressions: concat/unhex/lpad/hex/crc32. */
  def imagePayload(docs: DataFrame): DataFrame = {
    val w = imgWidth
    val h = imgHeight
    val body = encode(col("text"), "utf-8")
    // IHDR chunk body: type + 4B width + 4B height + bit depth 8, color type
    // 2 (truecolor), compression 0, filter 0, interlace 0. CRC32 covers
    // type+data, per the PNG spec.
    val ihdrBody = concat(unhex(lit("49484452")), bytesBE(w, 4), bytesBE(h, 4),
      unhex(lit("0802000000")))
    val png = concat(
      unhex(lit("89504E470D0A1A0A")), // signature
      unhex(lit("0000000D")),         // IHDR data length = 13
      ihdrBody,
      bytesBE(crc32(ihdrBody), 4),
      body)
    // SOI + SOF0 (len 0x11 = 17: len2 + precision1 + h2 + w2 + ncomp1 + 3*3)
    val jpeg = concat(
      unhex(lit("FFD8")),
      unhex(lit("FFC0001108")),
      bytesBE(h, 2), bytesBE(w, 2),
      unhex(lit("03011100021101031101")), // 3 components, standard sampling
      body)
    docs.select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(2)) === 0, png).otherwise(jpeg).as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("magic", lower(hex(substring(col("payload"), 1, 4))))
  }

  /** Partition-wise decode: iterator-in/iterator-out, the Scala analogue of
    * a batched pandas-UDF decode stage — a REAL byte-level header parse
    * ([[ImageHeader]]), not a placeholder. The per-partition prologue is
    * where a full pixel decoder would initialize its codec once; a
    * header-only sniff needs no init, but the plumbing (payload bytes stay
    * on their partition, features come back tiny) is the shape that matters
    * at 100 TB. Undecodable payloads degrade to ("unknown", 0x0) rather
    * than failing the stage — corrupt media is data, not an error. */
  def decodeImage(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        ImageHeader.parse(m.payload) match {
          case Some((fmt, w, h)) =>
            MediaFeatures(m.doc_id, fmt, w, h, w.toLong * h, m.payload.length.toLong)
          case None =>
            MediaFeatures(m.doc_id, "unknown", 0, 0, 0L, m.payload.length.toLong)
        }
      }
    }
  }

  /** Little-endian unsigned int as `width` bytes (RIFF/WAV is LE where PNG
    * is BE) — single-byte hex assembly, all codegen'd built-ins. */
  private def bytesLE(v: Column, width: Int): Column =
    concat((0 until width).map(i =>
      unhex(lpad(hex(shiftright(v.cast("bigint"), 8 * i).bitwiseAND(lit(255L))), 2, "0"))): _*)

  /** Deterministic per-document audio parameters (also the oracle's
    * formulas): PCM 16-bit, rate from the id, channels from the char count,
    * sample count spanning enough range to exercise duration math. */
  def wavRate: Column = (lit(8000L) * (pmod(col("doc_id"), lit(3)) + 1))
  def wavChannels: Column = pmod(col("n_chars"), lit(2)) + 1
  def wavSamples: Column = lit(200L) + pmod(col("n_chars"), lit(300))

  /** Build a VALID WAV (RIFF) container per document: RIFF size header,
    * `fmt ` chunk (PCM, channels, rate, byte rate, block align, 16 bits)
    * and a zero-filled `data` chunk of the declared size — bit-correct
    * little-endian layout that [[WavHeader.parse]] (or any RIFF walker)
    * reads back. Pure codegen'd expressions, no UDF. */
  def audioPayload(docs: DataFrame): DataFrame = {
    val rate = wavRate.cast("bigint")
    val ch = wavChannels.cast("bigint")
    val ns = wavSamples.cast("bigint")
    val dataSize = ns * ch * 2
    val fmt = concat(
      unhex(lit("666D7420")),            // "fmt "
      bytesLE(lit(16L), 4),              // fmt chunk size
      bytesLE(lit(1L), 2),               // PCM
      bytesLE(ch, 2),
      bytesLE(rate, 4),
      bytesLE(rate * ch * 2, 4),         // byte rate
      bytesLE(ch * 2, 2),                // block align
      bytesLE(lit(16L), 2))              // bits per sample
    val wav = concat(
      unhex(lit("52494646")),            // "RIFF"
      bytesLE(dataSize + 36, 4),
      unhex(lit("57415645")),            // "WAVE"
      fmt,
      unhex(lit("64617461")),            // "data"
      bytesLE(dataSize, 4),
      // zero-filled PCM body of exactly dataSize bytes (formula inlined as
      // SQL text — repeat() takes a column count only in SQL form)
      unhex(expr(
        "repeat('00', cast((200 + (n_chars % 300)) * ((n_chars % 2) + 1) * 2 as int))")))
    docs.select(col("doc_id"), wav.as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
  }

  /** Partition-wise audio header decode — the [[decodeImage]] pattern over
    * the RIFF walker. Malformed payloads degrade to zeros, not failures. */
  def decodeAudio(media: Dataset[Media]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        WavHeader.parse(m.payload) match {
          case Some((rate, ch, bits, ns)) =>
            AudioFeatures(m.doc_id, rate, ch, bits, ns,
              if (rate > 0) ns * 1000L / rate else 0L)
          case None => AudioFeatures(m.doc_id, 0L, 0L, 0L, 0L, 0L)
        }
      }
    }
  }

  /** End-to-end audio lane: synthesize WAV bytes, decode them back. */
  def audioFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    decodeAudio(audioPayload(docs)
        .select(col("doc_id"), col("payload")).as[Media])
      .toDF().orderBy("doc_id")
  }

  /** Frame sampling: every `stride`-th byte of the payload as a "frame"
    * (binary slicing plumbing; a video decoder would emit key frames). */
  def frameSample(media: DataFrame, stride: Int = 64, maxFrames: Int = 8): DataFrame =
    media.select(
      col("doc_id"),
      transform(
        sequence(lit(1), least(lit(maxFrames),
          greatest((octet_length(col("payload")) / stride).cast("int"), lit(1)))),
        i => substring(col("payload"), (i - 1) * stride + 1, lit(stride))
      ).as("frames"))
      .withColumn("n_frames", size(col("frames")).cast("long"))

  /** Aspect-preserving resize of decoded dimensions to fit `maxDim` —
    * integer math only (floor-scaled, never upscaled), so the plan is exact
    * and portable. A real implementation would resample pixels partition-wise
    * in the same slot as [[decodeImage]]; the dimension arithmetic — which
    * is what downstream schemas consume — is the real thing. */
  def resizeDims(features: DataFrame, maxDim: Int = 32): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val scaleNeeded = longest > maxDim
    def fit(side: Column) =
      when(scaleNeeded, greatest((side * maxDim).divide(longest).cast("int"), lit(1)))
        .otherwise(side)
    features
      .withColumn("out_width", fit(col("width")))
      .withColumn("out_height", fit(col("height")))
      .withColumn("out_pixels",
        col("out_width").cast("long") * col("out_height"))
  }

  /** End-to-end: synthesize container bytes, header-decode them back, join
    * decoded features to payload metadata. The join is doc_id-to-doc_id on
    * co-partitioned derivatives of the same scan — features are tiny, so at
    * scale you'd persist them standalone and never carry payloads along. */
  def mediaFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val media = imagePayload(docs)
    val decoded = decodeImage(
      media.select(col("doc_id"), col("payload")).as[Media])
    media.select("doc_id", "n_bytes", "magic")
      .join(decoded.toDF().select(col("doc_id"), col("format"), col("width"),
        col("height"), col("n_pixels")), "doc_id")
      .withColumn("content_type", concat(lit("image/"), col("format")))
      .orderBy("doc_id")
  }

  case class VideoFeatures(doc_id: Long, timescale: Long, duration: Long,
                           duration_ms: Long, mdat_bytes: Long, n_boxes: Long)

  /** Deterministic per-document video parameters (also the oracle's
    * formulas): ~1-10 s clips at movie timescale 600. */
  def mp4Timescale: Column = lit(600L)
  def mp4Duration: Column = (pmod(col("doc_id"), lit(240)) + 1) * lit(25L)
  def mp4MdatBytes: Column = pmod(col("n_chars"), lit(400)) + lit(100L)

  /** Build a VALID minimal ISO-BMFF (MP4) container per document:
    * `ftyp(isom)` + `moov[mvhd v0]` (timescale/duration at the spec's fixed
    * offsets, identity matrix, rate 1.0) + a zero-filled `mdat`. Same
    * discipline as [[imagePayload]]/[[audioPayload]]: the payload column is
    * real bytes built from codegen'd built-ins, no UDF; big-endian box
    * sizes per ISO 14496-12. */
  def videoPayload(docs: DataFrame): DataFrame = {
    val mvhd = concat(
      bytesBE(lit(108L), 4), unhex(lit("6D766864")), // size + 'mvhd'
      bytesBE(lit(0L), 4),                           // version 0 + flags
      bytesBE(lit(0L), 4), bytesBE(lit(0L), 4),      // creation/modification
      bytesBE(mp4Timescale, 4),
      bytesBE(mp4Duration, 4),
      unhex(lit("00010000")),                        // rate 1.0
      unhex(lit("0100")),                            // volume 1.0
      unhex(lit(("00" * 10))),                       // reserved
      unhex(lit("000100000000000000000000000000000001000000000000000000000000000040000000")), // identity matrix
      unhex(lit("00" * 24)),                         // pre_defined
      bytesBE(lit(2L), 4))                           // next_track_ID
    val mp4 = concat(
      bytesBE(lit(20L), 4), unhex(lit("66747970")),  // 'ftyp'
      unhex(lit("69736F6D")), bytesBE(lit(0L), 4),   // major 'isom', minor 0
      unhex(lit("69736F6D")),                        // compatible 'isom'
      bytesBE(lit(116L), 4), unhex(lit("6D6F6F76")), // 'moov' wrapping mvhd
      mvhd,
      bytesBE(mp4MdatBytes + 8, 4), unhex(lit("6D646174")), // 'mdat'
      unhex(expr("repeat('00', cast(n_chars % 400 + 100 as int))")))
    docs.select(col("doc_id"), mp4.as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
  }

  /** Partition-wise MP4 box walk — the [[decodeAudio]] pattern over
    * [[Mp4Header.parse]]. Malformed payloads degrade to zeros. */
  def decodeVideo(media: Dataset[Media]): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        Mp4Header.parse(m.payload) match {
          case Some((ts, dur, mdat, boxes)) =>
            VideoFeatures(m.doc_id, ts, dur,
              if (ts > 0) dur * 1000L / ts else 0L, mdat, boxes)
          case None => VideoFeatures(m.doc_id, 0L, 0L, 0L, 0L, 0L)
        }
      }
    }
  }

  /** End-to-end video lane: synthesize MP4 bytes, box-walk them back. */
  def videoFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    decodeVideo(videoPayload(docs)
        .select(col("doc_id"), col("payload")).as[Media])
      .toDF().orderBy("doc_id")
  }
}
