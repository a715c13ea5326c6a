package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal (image/audio/video) column plumbing: media payloads travel as
 * opaque `binary` columns with typed metadata (the Spark shape of the
 * reference's `binary` primitive + `piqi-any` dynamic payloads,
 * `doc/piqi.md:404-415`), and decode/feature-extraction runs as a
 * batched per-partition map.
 *
 * Decoders are REAL for the formats the JDK ships codecs for:
 *  - `image/png` — `javax.imageio.ImageIO` (true width/height/pixel stats);
 *  - `audio/wav` — `javax.sound.sampled.AudioSystem` (true sample
 *    rate/channel/PCM stats).
 * `video/mp4` has no JDK codec; those payloads use a clearly-labeled
 * synthetic container ([[VideoStub]]: magic + frame count) whose "decode"
 * validates the magic and derives deterministic pseudo-features — the one
 * remaining stub, with the poison/null paths as real as the others.
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_ref", StringType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),      // images/video
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", IntegerType, nullable = true) // audio/video
  ))

  final case class MediaRow(media_ref: String, mime: String, payload: Array[Byte],
      width: Option[Int], height: Option[Int], duration_ms: Option[Int])

  /** Deterministic tiny RGB image for id: pixels are a pure function of
    * (id, x, y), so the encoded PNG — and every decoded feature — is stable
    * across runs and partitionings. */
  private[graft] def makePng(id: Long): (Array[Byte], Int, Int) = {
    val w = 8 + (id % 16).toInt * 4
    val h = 8 + (id % 12).toInt * 4
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 3 + y * 29) % 256).toInt
        val b = ((id * 53 + x * 11 + y * 5) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    (bos.toByteArray, w, h)
  }

  /** Deterministic mono 16-bit 8 kHz PCM WAV for id. */
  private[graft] def makeWav(id: Long): (Array[Byte], Int) = {
    val n = 16 + (id % 32).toInt * 8
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = ((id * 31 + i * 17) % 2000 - 1000).toShort
      pcm(2 * i) = (s & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    (bos.toByteArray, n * 1000 / 8000)
  }

  /** Synthetic video container — LABELED STUB (no JDK video codec exists):
    * 8-byte magic + big-endian frame count + deterministic filler bytes. */
  private[ops] object VideoStub {
    val Magic: Array[Byte] = "GRAFTVID".getBytes("US-ASCII")
    def make(id: Long): (Array[Byte], Int) = {
      val frames = (id % 750).toInt + 25
      val filler = 32 + (id % 64).toInt
      val out = new Array[Byte](12 + filler)
      System.arraycopy(Magic, 0, out, 0, 8)
      out(8) = (frames >> 24).toByte; out(9) = (frames >> 16).toByte
      out(10) = (frames >> 8).toByte; out(11) = frames.toByte
      var i = 0
      while (i < filler) { out(12 + i) = ((id * 131 + i * 7) % 256).toByte; i += 1 }
      (out, frames * 40) // 25 fps
    }
    def frames(payload: Array[Byte]): Int = {
      if (payload.length < 12) throw new IllegalArgumentException("truncated video container")
      var i = 0
      while (i < 8) {
        if (payload(i) != Magic(i)) throw new IllegalArgumentException("bad video magic")
        i += 1
      }
      ((payload(8) & 0xff) << 24) | ((payload(9) & 0xff) << 16) |
        ((payload(10) & 0xff) << 8) | (payload(11) & 0xff)
    }
  }

  /**
   * Deterministic synthetic media table with REAL payload bytes: PNG for
   * images, WAV for audio, [[VideoStub]] containers for video. Every 50th
   * row has a NULL payload (missing blob); every 7th a POISON payload (the
   * real bytes truncated to 8 — fails every decoder). Metadata columns
   * carry the true decoded values (width/height for images, duration for
   * audio/video).
   */
  def synthesizeMedia(spark: SparkSession, n: Long, numPartitions: Int = 8): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, numPartitions).as[Long].mapPartitions { it =>
      ImageIO.setUseCache(false) // no temp-file cache inside executors
      it.map { id =>
        val ref = s"m-$id"
        val (mime, full, w, h, dur) = (id % 3) match {
          case 0 =>
            val (bytes, pw, ph) = makePng(id)
            ("image/png", bytes, Some(pw), Some(ph), None)
          case 1 =>
            val (bytes, ms) = makeWav(id)
            ("audio/wav", bytes, None, None, Some(ms))
          case _ =>
            val (bytes, ms) = VideoStub.make(id)
            ("video/mp4", bytes, None, None, Some(ms))
        }
        val payload =
          if (id % 50 == 0) null
          else if (id % 7 == 0) java.util.Arrays.copyOf(full, 8) // poison
          else full
        MediaRow(ref, mime, payload, w, h, dur)
      }
    }.toDF()
  }

  final case class MediaFeature(media_ref: String, mime: String, ok: Boolean,
      feat_dim: Int, features: Array[Float], checksum: Long)

  private def pad(vals: Seq[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim && i < vals.length) { out(i) = vals(i); i += 1 }
    out
  }

  /** PNG/JPEG decode via ImageIO → [w, h, meanR, meanG, meanB, minLum,
    * maxLum, stdLum, 0…].
    *
    * Pixel access is BULK row reads (`Raster.getPixels` into a reusable int
    * buffer) for the 3-band 8-bit layouts ImageIO actually produces
    * (TYPE_3BYTE_BGR / TYPE_INT_RGB / TYPE_INT_BGR — band order is always
    * R,G,B through the Raster API regardless of memory layout): per-pixel
    * `getRGB` routes every pixel through ColorModel conversion, measured
    * several× slower and the reason m_features regressed 0.16→0.57 s in r3.
    * Exotic layouts (palette, gray, alpha) keep the exact `getRGB` path —
    * both paths consume identical 0-255 ints, so sums are bit-identical.
    */
  private[graft] def imageFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    if (img == null) throw new IllegalArgumentException("undecodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    var sr = 0L; var sg = 0L; var sb = 0L
    var minL = Double.MaxValue; var maxL = Double.MinValue
    var sumL = 0.0; var sumL2 = 0.0
    @inline def acc(r: Int, g: Int, b: Int): Unit = {
      sr += r; sg += g; sb += b
      val lum = (r + g + b) / 3.0
      if (lum < minL) minL = lum
      if (lum > maxL) maxL = lum
      sumL += lum; sumL2 += lum * lum
    }
    val bulk = img.getType match {
      case BufferedImage.TYPE_3BYTE_BGR | BufferedImage.TYPE_INT_RGB |
           BufferedImage.TYPE_INT_BGR => img.getRaster.getNumBands == 3
      case _ => false
    }
    if (bulk) {
      val raster = img.getRaster
      val row = new Array[Int](w * 3)
      var y = 0
      while (y < h) {
        raster.getPixels(0, y, w, 1, row)
        var i = 0
        while (i < w * 3) { acc(row(i), row(i + 1), row(i + 2)); i += 3 }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          acc((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
          x += 1
        }
        y += 1
      }
    }
    val n = (w * h).toDouble
    val meanL = sumL / n
    val stdL = math.sqrt(math.max(0.0, sumL2 / n - meanL * meanL))
    pad(Seq(w.toFloat, h.toFloat, (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
      minL.toFloat, maxL.toFloat, stdL.toFloat), dim)
  }

  /** getRGB-only reference implementation — equivalence-test twin of the
    * bulk-raster fast path in [[imageFeatures]]. */
  private[graft] def imageFeaturesRef(payload: Array[Byte], dim: Int): Array[Float] = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    if (img == null) throw new IllegalArgumentException("undecodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    var sr = 0L; var sg = 0L; var sb = 0L
    var minL = Double.MaxValue; var maxL = Double.MinValue
    var sumL = 0.0; var sumL2 = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        sr += r; sg += g; sb += b
        val lum = (r + g + b) / 3.0
        if (lum < minL) minL = lum
        if (lum > maxL) maxL = lum
        sumL += lum; sumL2 += lum * lum
        x += 1
      }
      y += 1
    }
    val n = (w * h).toDouble
    val meanL = sumL / n
    val stdL = math.sqrt(math.max(0.0, sumL2 / n - meanL * meanL))
    pad(Seq(w.toFloat, h.toFloat, (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
      minL.toFloat, maxL.toFloat, stdL.toFloat), dim)
  }

  /** WAV decode via AudioSystem → [sampleRate, channels, nSamples, mean,
    * rms, min, max, zeroCrossings, 0…]. Non-16-bit-LE-PCM inputs (8-bit,
    * big-endian, µ-law, …) are transcoded to signed 16-bit little-endian
    * first — the sample loop would otherwise silently misread them as
    * 16-bit LE while reporting the real header's rate/channels. Reported
    * sampleRate/channels stay the ORIGINAL header's; formats the JDK cannot
    * transcode throw, landing the row in the `ok=false` path. */
  private def audioFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val ais0 = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    val fmt = ais0.getFormat
    val is16le = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
      fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian
    val ais =
      if (is16le) ais0
      else AudioSystem.getAudioInputStream(
        new AudioFormat(fmt.getSampleRate, 16, fmt.getChannels, true, false), ais0)
    try {
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      var sum = 0.0; var sum2 = 0.0
      var mn = Double.MaxValue; var mx = Double.MinValue
      var zc = 0; var prevSign = 0
      var i = 0
      while (i < n) {
        val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toDouble
        sum += s; sum2 += s * s
        if (s < mn) mn = s
        if (s > mx) mx = s
        val sign = if (s > 0) 1 else if (s < 0) -1 else 0
        if (sign != 0 && prevSign != 0 && sign != prevSign) zc += 1
        if (sign != 0) prevSign = sign
        i += 1
      }
      val mean = if (n > 0) sum / n else 0.0
      val rms = if (n > 0) math.sqrt(sum2 / n) else 0.0
      pad(Seq(fmt.getSampleRate, fmt.getChannels.toFloat, n.toFloat, mean.toFloat,
        rms.toFloat, mn.toFloat, mx.toFloat, zc.toFloat), dim)
    } finally ais.close()
  }

  /** Video "decode" — the labeled stub path: validates the [[VideoStub]]
    * container, derives deterministic pseudo-features from the bytes. */
  private def videoFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val frames = VideoStub.frames(payload)
    val out = new Array[Float](dim)
    if (dim > 0) out(0) = frames.toFloat
    if (dim > 1) out(1) = payload.length.toFloat
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    i = 2
    while (i < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(i) = ((h >>> 40).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /**
   * Batched feature extraction over payload binaries. The execution shape
   * is the one decoders need: per-partition iteration in bounded batches
   * (decoder init cost amortized per batch, memory bounded by
   * `batchSize × payload`), null payloads short-circuited, per-row failure
   * isolated (`ok=false`) instead of task failure — a poison payload (bad
   * bytes) must never kill a 10^12-row job.
   */
  def extractFeatures(media: DataFrame, dim: Int = 16, batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_ref"), col("mime"), col("payload"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false) // decoder init, once per partition
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (ref, mime, payload) =>
            if (payload == null) MediaFeature(ref, mime, ok = false, 0, Array.empty, 0L)
            else {
              try {
                val f =
                  if (mime.startsWith("image/")) imageFeatures(payload, dim)
                  else if (mime.startsWith("audio/")) audioFeatures(payload, dim)
                  else videoFeatures(payload, dim)
                val checksum = f.foldLeft(17L)((a, v) => a * 31 + java.lang.Float.floatToIntBits(v))
                MediaFeature(ref, mime, ok = true, dim, f, checksum)
              } catch {
                case _: Exception => MediaFeature(ref, mime, ok = false, 0, Array.empty, 0L)
              }
            }
          }
        }
      }
  }

  /**
   * Video frame-sampling plumbing: one row per sampled frame timestamp
   * (every `everyMs` ms of duration) — pure column expressions
   * (sequence + explode), the real decode of each frame goes through
   * [[extractFeatures]]' slot.
   */
  def sampleFrames(media: DataFrame, everyMs: Int = 1000): DataFrame =
    media
      .where(col("mime").startsWith("video/") && col("duration_ms").isNotNull)
      .select(col("media_ref"),
        explode(sequence(lit(0), col("duration_ms") - 1, lit(everyMs))).as("frame_ts_ms"))

  /** Resize metadata transform (aspect-preserving bound to `maxSide`) — metadata math is real. */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide).cast(DoubleType) / greatest(col("width"), col("height")).cast(DoubleType))
    media.where(col("width").isNotNull && col("height").isNotNull)
      .select(col("media_ref"), col("width"), col("height"),
        round(col("width") * scale).cast(IntegerType).as("out_width"),
        round(col("height") * scale).cast(IntegerType).as("out_height"))
  }
}
