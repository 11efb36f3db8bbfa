package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Real 16-bit PCM WAV codec — the sample-level counterpart of
  * [[WavHeader]]'s chunk walk (and the audio sibling of [[PngCodec]]):
  * encode writes an actual RIFF/fmt/data container with little-endian
  * int16 samples, decode walks the chunks back and recovers every sample.
  * Pure JVM, no codec libraries — PCM-in-RIFF is bytes and public spec. */
object WavPcmCodec {
  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def le32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }
  private def tag(out: ByteArrayOutputStream, t: String): Unit =
    out.write(t.getBytes("US-ASCII"))

  /** Mono 16-bit PCM WAV with real sample payload. */
  def encodePcm16(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2L
    val out = new ByteArrayOutputStream()
    tag(out, "RIFF"); le32(out, dataSize + 36); tag(out, "WAVE")
    tag(out, "fmt "); le32(out, 16)
    le16(out, 1)            // PCM
    le16(out, 1)            // mono
    le32(out, rate.toLong)
    le32(out, rate.toLong * 2) // byte rate
    le16(out, 2)            // block align
    le16(out, 16)           // bits
    tag(out, "data"); le32(out, dataSize)
    samples.foreach(s => le16(out, s & 0xffff))
    out.toByteArray
  }

  /** (sample_rate, samples) from a mono 16-bit PCM WAV; None outside that
    * profile or for malformed containers — corrupt media is data. Chunk
    * bodies pad to even offsets per the RIFF spec; ancillary chunks skip. */
  def decodePcm16(b: Array[Byte]): Option[(Int, Array[Short])] = {
    def u8(i: Int) = b(i) & 0xff
    def rle16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def rle32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tg(i: Int) = new String(b.slice(i, i + 4), "US-ASCII")
    if (b.length < 12 || tg(0) != "RIFF" || tg(8) != "WAVE") return None
    var pos = 12
    var rate = -1; var ok = false
    var samples: Array[Short] = null
    while (pos + 8 <= b.length) {
      val id = tg(pos)
      val size = rle32(pos + 4)
      if (pos + 8 + size > b.length) return None
      if (id == "fmt " && size >= 16) {
        val fmt = rle16(pos + 8); val ch = rle16(pos + 10)
        val bits = rle16(pos + 22)
        rate = rle32(pos + 12).toInt
        ok = fmt == 1 && ch == 1 && bits == 16
      } else if (id == "data") {
        if (size % 2 != 0) return None
        samples = new Array[Short]((size / 2).toInt)
        var i = 0
        while (i < samples.length) {
          samples(i) = rle16(pos + 8 + i * 2).toShort
          i += 1
        }
      }
      pos += 8 + size.toInt + (size.toInt & 1)
    }
    if (!ok || rate <= 0 || samples == null) None else Some((rate, samples))
  }
}

/** Audio energy fingerprinting — the Chromaprint/Shazam pipeline shape cut
  * to its engine-portable core: decode PCM, split into 32 equal-time
  * frames, sum |amplitude| per frame, and set bit f where the frame's
  * energy exceeds the track average (the same integer cross-multiply
  * threshold as [[ImagePhash]] — no division, no FFT: a real spectral
  * frontend slots into the same partition-local decode seam, but
  * libm-dependent transforms are not engine-reproducible, which is why the
  * oracle-checked form is energy-domain).
  *
  * The fixtures carry no audio files, so [[synthesize]] builds one REAL
  * mono PCM WAV per document from a deterministic waveform (also the
  * oracle's formula — [[sample]]): a per-frame gain pattern keyed by
  * doc_id mod 6 gives each track loud/quiet structure worth hashing, and
  * the raw waveform underneath varies per doc. [[fingerprintTable]]
  * decodes those containers back through [[WavPcmCodec]] and fingerprints
  * the recovered samples — `energy_sum` parity is bit-exact only if every
  * sample survives the encode → decode roundtrip.
  *
  * Scale shape: payload bytes never shuffle — synthesis, decode, and
  * fingerprint are partition-local; only (doc_id, rate, n, energy, 32-bit
  * fp) rows move. Downstream dedup joins on the fp (or its bands) exactly
  * like the image lane. */
object AudioFingerprint {
  val Frames = 32

  /** Deterministic per-track shape (also the oracle's formulas). */
  def nSamples(id: Long): Int = 320 + (id % 193).toInt
  def rate(id: Long): Int = 8000 * ((id % 3).toInt + 1)

  /** Deterministic sample i of track id: frame gain (loud/quiet pattern
    * per doc_id mod 6) x a [-100, 99] raw wave x 25 — max |7500|, well
    * inside int16. */
  def sample(id: Long, i: Int): Int = {
    val n = nSamples(id)
    val f = i * Frames / n
    val base = (id % 6).toInt
    val gain = if ((f * (base + 3)) % 7 < 3) 3 else 1
    val raw = ((i.toLong * ((id % 5) + 2) + id) % 200).toInt - 100
    gain * raw * 25
  }

  case class Track(doc_id: Long, payload: Array[Byte])
  case class FpRow(doc_id: Long, sample_rate: Long, n_samples: Long,
                   energy_sum: Long, fp: Long)

  def synthesize(ids: Dataset[java.lang.Long]): Dataset[Track] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      it.map { boxed =>
        val id = boxed.longValue()
        val n = nSamples(id)
        val s = new Array[Short](n)
        var i = 0
        while (i < n) { s(i) = sample(id, i).toShort; i += 1 }
        Track(id, WavPcmCodec.encodePcm16(rate(id), s))
      }
    }
  }

  /** Decode + fingerprint, partition-local: frame energies are exact
    * integer |sample| sums; bit f set iff energy(f) * 32 > total. */
  def fingerprint(tracks: Dataset[Track]): Dataset[FpRow] = {
    import tracks.sparkSession.implicits._
    tracks.mapPartitions { it =>
      it.map { t =>
        WavPcmCodec.decodePcm16(t.payload) match {
          case Some((r, s)) =>
            val n = s.length
            val frames = new Array[Long](Frames)
            var total = 0L
            var i = 0
            while (i < n) {
              val a = math.abs(s(i).toLong)
              frames(i * Frames / n) += a
              total += a
              i += 1
            }
            var fp = 0L
            var f = 0
            while (f < Frames) {
              if (frames(f) * Frames > total) fp |= 1L << f
              f += 1
            }
            FpRow(t.doc_id, r.toLong, n.toLong, total, fp)
          case None => FpRow(t.doc_id, 0L, 0L, 0L, 0L)
        }
      }
    }
  }

  /** End-to-end per-track fingerprint table over the documents' id space. */
  def fingerprintTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fingerprint(synthesize(docs.select(col("doc_id")).as[java.lang.Long]))
      .toDF().orderBy("doc_id")
  }
}
