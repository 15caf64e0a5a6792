package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream,
  AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio payloads as opaque `binary`
 * columns with typed metadata, processed in partition-level batches.
 *
 * Decode is REAL, not stubbed: PNG/BMP payloads parse through
 * `javax.imageio` and WAV through `javax.sound.sampled` — both JDK
 * built-ins, no external codec libraries. The oracle story is a
 * deterministic payload spec ([[specFormat]]/[[specWidth]]/…): fixtures
 * are synthesized from id-derived dimensions and pixel values, encoded
 * through the actual codec, then decoded back — so width/height/frames
 * /pixel statistics verify the full encode→container→decode round trip
 * against SQL recomputing the spec formulas.
 *
 * All per-row work is iterator-to-iterator `mapPartitions` (constant
 * memory, pipelined) — the batch shape a production codec stage (GPU
 * decode, ffmpeg subprocess) plugs into unchanged.
 */
object Multimodal {

  // javax.imageio defaults to a DISK-BACKED stream cache: every
  // ImageIO.read/write spills through a temp file (two create/delete
  // syscalls per row). On a contended /tmp that per-row I/O dominates
  // the decode itself (BENCH_r08: mm_resize 67 s driver vs 1.2 s on a
  // quiet host, same commit). All payloads here are in-memory byte
  // arrays, so the in-memory cache is strictly better at any scale.
  // Object-body placement runs this once per JVM — the codec closures
  // reference this object, so executors initialize it too.
  ImageIO.setUseCache(false)

  final case class MediaRow(id: Long, media: Array[Byte], format: String)
  final case class DecodedRow(id: Long, format: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int)
  final case class PixelStats(id: Long, n_px: Long, px_sum: Long,
      mean_px: Double, px_entropy: Double)

  implicit val mediaEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val decodedEnc: Encoder[DecodedRow] = Encoders.product[DecodedRow]
  implicit val pixelEnc: Encoder[PixelStats] = Encoders.product[PixelStats]

  // ---- Deterministic payload spec (mirrored by the SQL oracles) ----
  // Images stay tiny (8..31 px sides) so fixture synthesis is cheap;
  // the codec path is identical at any size.
  def specFormat(id: Long): String =
    (id % 3) match { case 0 => "png"; case 1 => "bmp"; case _ => "wav" }
  def specWidth(id: Long): Int = (id % 24 + 8).toInt
  def specHeight(id: Long): Int = (id * 7 % 24 + 8).toInt
  def specFrames(id: Long): Int = (id % 50 + 1).toInt
  def specPixel(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  private val WavFormat =
    new AudioFormat(8000f, 8, 1, /*signed=*/ false, /*bigEndian=*/ false)

  /** Encode one spec-derived payload through the REAL codec. */
  private def makeMedia(id: Long): MediaRow = {
    val fmt = specFormat(id)
    val out = new ByteArrayOutputStream()
    fmt match {
      case "wav" =>
        val n = specFrames(id)
        val pcm = Array.tabulate[Byte](n)(i => specPixel(id, i, 0).toByte)
        val ais = new AudioInputStream(
          new ByteArrayInputStream(pcm), WavFormat, n.toLong)
        AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      case _ =>
        val (w, h) = (specWidth(id), specHeight(id))
        // gray PNG writes single-band; BMP rides 24-bit BGR with r=g=b
        val img =
          if (fmt == "png") new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
          else new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = specPixel(id, x, y)
            if (fmt == "png") img.getRaster.setSample(x, y, 0, v)
            else img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        ImageIO.write(img, fmt, out)
    }
    MediaRow(id, out.toByteArray, fmt)
  }

  /** Synthesize real PNG/BMP/WAV payloads from an id column — the
    * fixture stand-in for `spark.read.format("binaryFile")` with the
    * same (id, media, format) schema. One codec encode per row inside
    * a partition batch. */
  def synthesize(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    val ids = df.select(col(idCol).cast("long")).as(Encoders.scalaLong)
    ids.mapPartitions(_.map(makeMedia))(mediaEnc)
  }

  /** Wrap a text corpus as opaque payloads (utf-8 bytes as the binary
    * column) — the generic binary-column ingest used by byte-level
    * [[features]] (no codec touches these); container formats use
    * [[synthesize]]. The format label set matches [[specFormat]] so
    * every label corresponds to a codec this module can read/write. */
  def ingest(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("media"),
      element_at(array(lit("png"), lit("bmp"), lit("wav")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("format"))

  /** REAL container decode: PNG/BMP headers+pixels via javax.imageio,
    * WAV frame counts via javax.sound.sampled. Images report
    * n_frames=1; audio reports width=height=0. Unknown labels fail
    * fast instead of routing into the wrong codec branch. */
  private def decodeOne(m: MediaRow): DecodedRow = m.format match {
    case "wav" =>
      val ais = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(m.media))
      try DecodedRow(m.id, m.format, m.media.length.toLong, 0, 0,
        ais.getFrameLength.toInt)
      finally ais.close()
    case "png" | "bmp" =>
      val img = ImageIO.read(new ByteArrayInputStream(m.media))
      require(img != null, s"undecodable ${m.format} payload for id ${m.id}")
      DecodedRow(m.id, m.format, m.media.length.toLong,
        img.getWidth, img.getHeight, 1)
    case other =>
      throw new IllegalArgumentException(
        s"unsupported media format '$other' for id ${m.id}")
  }

  /**
   * Batched decode over partitions: one iterator pass per partition
   * (constant memory, pipelined).
   */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] =
    media.mapPartitions(_.map(decodeOne))

  /** Per-image pixel statistics computed from the DECODED raster (the
    * round-trip proof: synthesize wrote spec pixels through the codec,
    * this reads them back out of it). Audio rows pass through with the
    * PCM samples as the "pixels" — same histogram law. */
  def pixelStats(media: Dataset[MediaRow]): Dataset[PixelStats] =
    media.mapPartitions(_.map { m =>
      val samples: Array[Int] = m.format match {
        case "wav" =>
          val ais = AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(m.media))
          try ais.readAllBytes().map(_ & 0xff)
          finally ais.close()
        case _ =>
          val img = ImageIO.read(new ByteArrayInputStream(m.media))
          require(img != null, s"undecodable ${m.format} for id ${m.id}")
          val (w, h) = (img.getWidth, img.getHeight)
          val out = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              // raw raster sample, NOT getRGB: gray->sRGB conversion is
              // non-identity; band 0 suffices since synthesis uses r=g=b
              out(y * w + x) = img.getRaster.getSample(x, y, 0)
              x += 1
            }
            y += 1
          }
          out
      }
      histStats(m.id, samples)
    })

  private def histStats(id: Long, samples: Array[Int]): PixelStats = {
    val n = samples.length
    if (n == 0) PixelStats(id, 0L, 0L, 0.0, 0.0)
    else {
      val hist = new Array[Long](256)
      var sum = 0L
      var i = 0
      while (i < n) { hist(samples(i)) += 1; sum += samples(i); i += 1 }
      val ln2 = math.log(2)
      var clog = 0.0
      var j = 0
      while (j < 256) {
        val c = hist(j)
        if (c > 0) clog += c * (math.log(c.toDouble) / ln2)
        j += 1
      }
      PixelStats(id, n.toLong, sum, sum.toDouble / n,
        math.log(n.toDouble) / ln2 - clog / n)
    }
  }

  /** Resize planning: clamp decoded dims to a max side, preserving
    * aspect (metadata-only — the byte transform is the codec's job). */
  def resizePlan(decoded: Dataset[DecodedRow], maxSide: Int): DataFrame =
    decoded.toDF().withColumn("scale",
        // audio rows decode to width=height=0: no raster to scale (and
        // ANSI mode makes the unguarded division a hard error)
        when(greatest(col("width"), col("height")) > 0,
          least(lit(maxSide) / greatest(col("width"), col("height")),
            lit(1.0)))
          .otherwise(lit(1.0)))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))

  /** Frame sampling: every `step`-th frame index per clip, exploded to
    * (id, frame_idx) rows — the fan-out stage before per-frame feature
    * extraction. */
  def sampleFrames(decoded: Dataset[DecodedRow], step: Int): DataFrame =
    decoded.toDF().select(col("id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(step)))
        .as("frame_idx"))

  final case class MediaFeatures(id: Long, n_bytes: Long, byte_sum: Long,
      mean_byte: Double, byte_entropy: Double)
  implicit val featEnc: Encoder[MediaFeatures] =
    Encoders.product[MediaFeatures]

  /**
   * Payload byte-level feature extraction: mean byte value and Shannon
   * entropy of the byte histogram — the standard cheap filters for
   * corrupt/padded/low-information media payloads (a truncated JPEG or
   * zero-padded buffer shows up immediately in entropy). Works on ANY
   * binary payload, no codec involved. Same iterator-to-iterator
   * partition batch shape as decode: one pass, constant memory
   * (256-long histogram per row). `byte_sum` is the exact-integer
   * surrogate the oracle hashes (entropy is a libm-dependent float —
   * bit-portable across engines only by luck, so it is spec-tested in
   * sbt instead of oracle-hashed).
   */
  def features(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    media.mapPartitions(_.map { m =>
      val st = histStats(m.id, m.media.map(_ & 0xff))
      MediaFeatures(m.id, st.n_px, st.px_sum, st.mean_px, st.px_entropy)
    })

  final case class AudioRow(id: Long, n_frames: Long, zero_cross: Long,
      energy: Long)
  implicit val audioEnc: Encoder[AudioRow] = Encoders.product[AudioRow]

  /**
   * Audio feature extraction from the DECODED PCM stream: zero-crossing
   * count (sign changes around the unsigned-8-bit midpoint 128 — the
   * classical pitch/noisiness proxy) and total energy Σ(s−128)² — both
   * EXACT integers, so the round-trip through the real WAV codec is
   * oracle-checkable, unlike float spectral features. The standard
   * cheap filters before an expensive audio-embedding stage (silence /
   * constant-tone / clipped clips show up immediately). Images are
   * skipped (no PCM). Same iterator-to-iterator batch as [[decode]].
   */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioRow] =
    media.filter(m => m.format == "wav")
      .mapPartitions(_.map { m =>
        val ais = AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(m.media))
        val s = try ais.readAllBytes() finally ais.close()
        var zc = 0L; var en = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i) & 0xff
          val d = v - 128
          en += d.toLong * d
          if (i > 0 && ((v >= 128) != ((s(i - 1) & 0xff) >= 128))) zc += 1
          i += 1
        }
        AudioRow(m.id, s.length.toLong, zc, en)
      })

  final case class SilenceRow(id: Long, n_frames: Long, n_silent: Long,
      n_runs: Long, longest_run: Long)
  implicit val silenceEnc: Encoder[SilenceRow] =
    Encoders.product[SilenceRow]

  /**
   * Silence-run detection over the decoded PCM (the gaps-and-islands
   * sequence analysis): a sample is silent when |s − 128| ≤ `eps`;
   * report per clip the silent-sample count, the number of maximal
   * silent RUNS, and the longest run — the cheap trim/VAD pre-filter
   * before any expensive audio model (all-silent and mostly-silent
   * clips drop before embedding). Exact integers; one decoded pass.
   */
  def silenceRuns(media: Dataset[MediaRow], eps: Int):
      Dataset[SilenceRow] = {
    require(eps >= 0 && eps < 128, "eps in [0,128)")
    media.filter(m => m.format == "wav")
      .mapPartitions(_.map { m =>
        val ais = AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(m.media))
        val s = try ais.readAllBytes() finally ais.close()
        var nSil = 0L; var runs = 0L; var longest = 0L; var cur = 0L
        var i = 0
        while (i < s.length) {
          val silent = math.abs((s(i) & 0xff) - 128) <= eps
          if (silent) {
            nSil += 1; cur += 1
            if (cur == 1) runs += 1
            if (cur > longest) longest = cur
          } else cur = 0
          i += 1
        }
        SilenceRow(m.id, s.length.toLong, nSil, runs, longest)
      })
  }

  final case class PatchRow(id: Long, px: Int, py: Int, n_px: Long,
      px_sum: Long)
  implicit val patchEnc: Encoder[PatchRow] = Encoders.product[PatchRow]

  /**
   * ViT-style patch tiling over the DECODED raster: a `grid`×`grid`
   * cover where pixel (x, y) belongs to patch (x·grid div w,
   * y·grid div h) — exact integer boundaries, every patch non-empty
   * whenever w, h ≥ grid. Emits per-patch pixel counts and sums — the
   * fan-out stage feeding per-patch embedding/feature extraction (the
   * preprocessing shape of every patch-based vision model). Audio rows
   * are skipped. One decoded pass per image, grid² accumulator.
   */
  def imagePatches(media: Dataset[MediaRow], grid: Int):
      Dataset[PatchRow] = {
    require(grid >= 1 && grid <= 8, "grid in [1,8]: spec images are 8px+")
    media.filter(m => m.format == "png" || m.format == "bmp")
      .mapPartitions(_.flatMap { m =>
        val img = ImageIO.read(new ByteArrayInputStream(m.media))
        require(img != null, s"undecodable ${m.format} for id ${m.id}")
        val (w, h) = (img.getWidth, img.getHeight)
        val cnt = new Array[Long](grid * grid)
        val sum = new Array[Long](grid * grid)
        var y = 0
        while (y < h) {
          val py = y * grid / h
          var x = 0
          while (x < w) {
            val i = py * grid + x * grid / w
            cnt(i) += 1
            sum(i) += img.getRaster.getSample(x, y, 0)
            x += 1
          }
          y += 1
        }
        (0 until grid * grid).iterator.map(i =>
          PatchRow(m.id, i % grid, i / grid, cnt(i), sum(i)))
      })
  }

  final case class DHashRow(id: Long, w: Int, h: Int,
      dh_hi: Long, dh_lo: Long)
  implicit val dhashEnc: Encoder[DHashRow] = Encoders.product[DHashRow]

  /**
   * Perceptual difference hash (dHash — Krawetz 2013, the standard
   * cheap image fingerprint): sample the DECODED raster on a 9×8
   * nearest-neighbor grid, emit bit (j·8+i) = 1 iff the right neighbor
   * in row j is brighter — 64 gradient-sign bits that survive
   * re-encoding, scaling, and brightness shifts. Stored as two 32-bit
   * halves in BIGINTs (dh_hi = bits 32..63, dh_lo = bits 0..31) so no
   * engine has to shift into a 64-bit sign bit. Audio rows are skipped
   * (no raster). Same iterator-to-iterator codec batch shape as
   * [[decode]].
   */
  def dHash(media: Dataset[MediaRow]): Dataset[DHashRow] =
    media.filter(m => m.format == "png" || m.format == "bmp")
      .mapPartitions(_.map { m =>
        val img = ImageIO.read(new ByteArrayInputStream(m.media))
        require(img != null, s"undecodable ${m.format} for id ${m.id}")
        val (w, h) = (img.getWidth, img.getHeight)
        def px(x: Int, y: Int): Int = img.getRaster.getSample(x, y, 0)
        var hi = 0L; var lo = 0L
        var j = 0
        while (j < 8) {
          val y = j * h / 8
          var i = 0
          while (i < 8) {
            if (px((i + 1) * w / 9, y) > px(i * w / 9, y)) {
              val k = j * 8 + i
              if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
            }
            i += 1
          }
          j += 1
        }
        DHashRow(m.id, w, h, hi, lo)
      })

  /**
   * Image near-duplicate pairs by dHash Hamming distance — the
   * multimodal twin of the SimHash text near-dup: pairs of images whose
   * 64 gradient bits differ in ≤ `maxHamming` positions. Candidate
   * generation blocks on the DECODED (w, h) dims (near-dup rasters at
   * different dims are different images for training-dedup purposes;
   * production adds 16-bit hash bands as sub-blocks for the
   * resize-invariant case). Blocks above `maxBlockSize` are dropped
   * deterministically — the hot-bucket cap every LSH-family op here
   * carries (a block that large is a degenerate fixture, not signal).
   *
   * Scale shape: one dims-keyed aggregate collects each block ONCE
   * (bounded arrays, capped), pairs generate intra-block from the
   * sorted array — never an all-pairs or per-band self-join — and the
   * Hamming filter is two xor+bit_count scalar ops per candidate.
   */
  def dhashNearDup(hashes: DataFrame, maxHamming: Int,
      maxBlockSize: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64, "maxHamming in [0,64]")
    require(maxBlockSize >= 2, "maxBlockSize must be >= 2")
    val blocks = hashes
      .groupBy(col("w"), col("h"))
      .agg(sort_array(collect_list(
        struct(col("id"), col("dh_hi"), col("dh_lo")))).as("xs"))
      .filter(size(col("xs")).between(2, maxBlockSize))
    val nestedPairs = transform(col("xs"), (x, i) =>
      transform(slice(col("xs"), i + 2, size(col("xs"))),
        y => struct(x.as("a"), y.as("b"))))
    blocks.select(explode(flatten(nestedPairs)).as("p"))
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
        (expr("bit_count(p.a.dh_hi ^ p.b.dh_hi)") +
          expr("bit_count(p.a.dh_lo ^ p.b.dh_lo)")).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
