package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north star scope): media payloads are opaque
  * `binary` columns with typed metadata travelling alongside; decode /
  * feature-extraction runs partition-wise so batch-oriented decoders amortize
  * setup per partition, not per row.
  *
  * The sandbox has no image/audio codecs, so [[decodeImageStub]]'s pixel
  * decode is a clearly-marked DETERMINISTIC FAKE (bytes -> pseudo dimensions);
  * everything around it — binary schema, metadata derivation, partition-wise
  * iterator plumbing, feature schema — is real and tested. Swapping the stub
  * body for a real JNI/javacv decoder changes no plan shape.
  *
  * Scale notes: payload bytes never shuffle in any op here; metadata and
  * features are narrow maps. For 100 TB of media you partition by file/object
  * locality at ingest and keep features (tiny) separate from payloads (huge)
  * so downstream analytics never rescans the bytes.
  */
object Multimodal {

  /** Typed row for the partition-wise decode path. */
  case class Media(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, width: Int, height: Int,
                           n_pixels: Long, n_bytes: Long)

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

  /** Partition-wise "decode": iterator-in/iterator-out, the Scala analogue of
    * a batched pandas-UDF decode stage. The per-partition prologue is where a
    * real decoder would initialize its codec once.
    *
    * STUB: width/height are derived deterministically from the first payload
    * bytes — stands in for reading an image header. */
  def decodeImageStub(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: val codec = Decoder.open() once per partition
      rows.map { m =>
        val b0 = if (m.payload.length > 0) m.payload(0) & 0xff else 0
        val b1 = if (m.payload.length > 1) m.payload(1) & 0xff else 0
        val width = b0 % 64 + 1   // STUB: fake header parse
        val height = b1 % 64 + 1  // STUB
        MediaFeatures(m.doc_id, width, height,
          width.toLong * height, m.payload.length.toLong)
      }
    }
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
    * in the same stub slot as [[decodeImageStub]]; the dimension arithmetic —
    * which is what downstream schemas consume — is the real thing. */
  def resizeDims(features: DataFrame, maxDim: Int = 32): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val scaleNeeded = longest > maxDim
    def fit(side: org.apache.spark.sql.Column) =
      when(scaleNeeded, greatest((side * maxDim).divide(longest).cast("int"), lit(1)))
        .otherwise(side)
    features
      .withColumn("out_width", fit(col("width")))
      .withColumn("out_height", fit(col("height")))
      .withColumn("out_pixels",
        col("out_width").cast("long") * col("out_height"))
  }

  /** End-to-end metadata + stub-decoded features as a flat DataFrame. */
  def mediaFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val media = asBinary(docs)
    val decoded = decodeImageStub(
      media.select(col("doc_id"), col("payload")).as[Media])
    media.select("doc_id", "n_bytes", "magic", "content_type")
      .join(decoded.toDF().select(col("doc_id"), col("width"), col("height"), col("n_pixels")),
        "doc_id")
      .orderBy("doc_id")
  }
}
