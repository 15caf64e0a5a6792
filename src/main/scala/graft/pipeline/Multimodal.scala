package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video payloads as opaque
 * `binary` columns with typed metadata, processed in partition-level
 * batches.
 *
 * The Spark-side mechanics are real and tested — schema, partitioning,
 * batched iterator-to-iterator transforms (`mapPartitions` on a typed
 * Dataset, the Scala analogue of `mapInPandas` batch UDFs) — while the
 * actual codec work is STUBBED with a deterministic fake (this
 * environment has no image/audio libraries): `decodeStub` derives
 * width/height/duration from the payload bytes, so every downstream
 * stage (resize planning, frame sampling, feature shape) exercises the
 * true data flow with reproducible values. Swap `fakeDecode` for a real
 * codec call to productionize; nothing else changes.
 */
object Multimodal {

  final case class MediaRow(id: Long, media: Array[Byte], format: String)
  final case class DecodedRow(id: Long, format: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int)

  implicit val mediaEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val decodedEnc: Encoder[DecodedRow] = Encoders.product[DecodedRow]

  /** Wrap a text corpus as fake media payloads: utf-8 bytes as the
    * binary column, format assigned round-robin. Stands in for
    * `spark.read.format("binaryFile")` at the same schema. */
  def ingest(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("media"),
      element_at(array(lit("png"), lit("jpeg"), lit("wav")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("format"))

  /** STUB decode: deterministic pseudo-metadata from the payload. A
    * real implementation would parse the container header here. */
  private def fakeDecode(m: MediaRow): DecodedRow = {
    val n = m.media.length.toLong
    val w = (n % 640 + 16).toInt
    val h = (n % 480 + 16).toInt
    val frames = if (m.format == "wav") (n / 100 + 1).toInt else 1
    DecodedRow(m.id, m.format, n, w, h, frames)
  }

  /**
   * Batched decode over partitions: one iterator pass per partition
   * (constant memory, pipelined) — the shape a real codec batch (GPU
   * decode, ffmpeg subprocess) plugs into.
   */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] =
    media.mapPartitions(_.map(fakeDecode))

  /** Resize planning: clamp decoded dims to a max side, preserving
    * aspect (metadata-only — the byte transform is the codec's job). */
  def resizePlan(decoded: Dataset[DecodedRow], maxSide: Int): DataFrame =
    decoded.toDF().withColumn("scale",
        least(lit(maxSide) / greatest(col("width"), col("height")),
          lit(1.0)))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))

  /** Frame sampling: every `step`-th frame index per clip, exploded to
    * (id, frame_idx) rows — the fan-out stage before per-frame feature
    * extraction. */
  def sampleFrames(decoded: Dataset[DecodedRow], step: Int): DataFrame =
    decoded.toDF().select(col("id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(step)))
        .as("frame_idx"))

  final case class MediaFeatures(id: Long, n_bytes: Long,
      mean_byte: Double, byte_entropy: Double)
  implicit val featEnc: Encoder[MediaFeatures] =
    Encoders.product[MediaFeatures]

  /**
   * Payload feature extraction — and unlike [[decode]], NOT a stub:
   * byte-level statistics (mean byte value, Shannon entropy of the
   * byte histogram) need no codec and are the standard cheap filters
   * for corrupt/padded/low-information media payloads (a truncated
   * JPEG or zero-padded buffer shows up immediately in entropy).
   * Same iterator-to-iterator partition batch shape as decode: one
   * pass, constant memory (256-long histogram per row).
   */
  def features(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    media.mapPartitions(_.map { m =>
      val n = m.media.length
      if (n == 0) MediaFeatures(m.id, 0L, 0.0, 0.0)
      else {
        val hist = new Array[Long](256)
        var sum = 0L
        var i = 0
        while (i < n) {
          val u = m.media(i) & 0xff
          hist(u) += 1; sum += u; i += 1
        }
        val ln2 = math.log(2)
        var clog = 0.0
        var j = 0
        while (j < 256) {
          val c = hist(j)
          if (c > 0) clog += c * (math.log(c.toDouble) / ln2)
          j += 1
        }
        MediaFeatures(m.id, n.toLong, sum.toDouble / n,
          math.log(n.toDouble) / ln2 - clog / n)
      }
    })
}
