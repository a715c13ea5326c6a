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
 * Decoders are REAL for all three modalities, using only JDK codecs:
 *  - `image/png` — `javax.imageio.ImageIO` (true width/height/pixel stats);
 *  - `audio/wav` — `javax.sound.sampled.AudioSystem` (true sample
 *    rate/channel/PCM stats);
 *  - `video/avi` — Motion-JPEG in a RIFF/AVI container ([[Avi]]): the RIFF
 *    tree is parsed per the public AVI spec and every frame is a real JPEG
 *    decoded with ImageIO (true frame count/dims/fps/luminance/motion).
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

  /**
   * Minimal REAL video container: Motion-JPEG inside a RIFF/AVI file.
   * The AVI (RIFF) layout is the public Microsoft "AVI RIFF File
   * Reference" structure — `RIFF('AVI ' LIST('hdrl' avih LIST('strl'
   * strh strf)) LIST('movi' 00dc...))` — and each `00dc` chunk is a
   * complete JPEG frame, so both the writer and the reader use only the
   * JDK's real JPEG codec (ImageIO). Nothing here is synthetic beyond the
   * pixel CONTENT of the generated frames; parsing, decoding, and every
   * reported feature are real.
   */
  private[ops] object Avi {
    private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    private def fourcc(out: ByteArrayOutputStream, s: String): Unit =
      out.write(s.getBytes("US-ASCII"), 0, 4)

    /** Encode one deterministic RGB frame as a real JPEG. */
    private def jpegFrame(id: Long, f: Int, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((id * 31 + f * 41 + x * 7 + y * 13) % 256).toInt
          val g = ((id * 17 + f * 23 + x * 3 + y * 29) % 256).toInt
          val b = ((id * 53 + f * 11 + x * 11 + y * 5) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }

    /** Deterministic MJPEG-AVI for id: (bytes, durationMs). 25 fps. */
    def make(id: Long): (Array[Byte], Int) = {
      val frames = 2 + (id % 6).toInt
      val w = 16 + (id % 4).toInt * 4
      val h = 12 + (id % 3).toInt * 4
      val jpegs = Array.tabulate(frames)(f => jpegFrame(id, f, w, h))

      def list(kind: String)(body: ByteArrayOutputStream => Unit): Array[Byte] = {
        val b = new ByteArrayOutputStream(); body(b)
        val out = new ByteArrayOutputStream()
        fourcc(out, "LIST"); le32(out, 4 + b.size()); fourcc(out, kind)
        out.write(b.toByteArray); out.toByteArray
      }
      def chunk(kind: String, data: Array[Byte]): Array[Byte] = {
        val out = new ByteArrayOutputStream()
        fourcc(out, kind); le32(out, data.length); out.write(data)
        if (data.length % 2 != 0) out.write(0) // RIFF chunks are word-aligned
        out.toByteArray
      }

      val avih = { // MainAVIHeader (56 bytes)
        val b = new ByteArrayOutputStream()
        le32(b, 40000); le32(b, 0); le32(b, 0); le32(b, 0) // usec/frame, maxBps, pad, flags
        le32(b, frames); le32(b, 0); le32(b, 1); le32(b, 0) // totalFrames, initial, streams, bufSize
        le32(b, w); le32(b, h); le32(b, 0); le32(b, 0); le32(b, 0); le32(b, 0)
        b.toByteArray
      }
      val strh = { // AVIStreamHeader (56 bytes)
        val b = new ByteArrayOutputStream()
        fourcc(b, "vids"); fourcc(b, "MJPG")
        le32(b, 0); le32(b, 0); le32(b, 0)           // flags, prio+lang, initialFrames
        le32(b, 1); le32(b, 25); le32(b, 0)          // scale, rate (25 fps), start
        le32(b, frames); le32(b, 0); le32(b, 0); le32(b, 0) // length, bufSize, quality, sampleSize
        le16(b, 0); le16(b, 0); le16(b, w); le16(b, h)      // rcFrame
        b.toByteArray
      }
      val strf = { // BITMAPINFOHEADER (40 bytes)
        val b = new ByteArrayOutputStream()
        le32(b, 40); le32(b, w); le32(b, h); le16(b, 1); le16(b, 24)
        fourcc(b, "MJPG"); le32(b, w * h * 3)
        le32(b, 0); le32(b, 0); le32(b, 0); le32(b, 0)
        b.toByteArray
      }
      val hdrl = list("hdrl") { b =>
        b.write(chunk("avih", avih))
        b.write(list("strl") { s => s.write(chunk("strh", strh)); s.write(chunk("strf", strf)) })
      }
      val movi = list("movi") { b => jpegs.foreach(j => b.write(chunk("00dc", j))) }

      val body = new ByteArrayOutputStream()
      fourcc(body, "AVI "); body.write(hdrl); body.write(movi)
      val out = new ByteArrayOutputStream()
      fourcc(out, "RIFF"); le32(out, body.size()); out.write(body.toByteArray)
      (out.toByteArray, frames * 40)
    }

    // ---- reader ----
    private def rd32(p: Array[Byte], off: Int): Int = {
      if (off + 4 > p.length) throw new IllegalArgumentException("truncated AVI")
      (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
        ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
    }
    private def cc(p: Array[Byte], off: Int): String = {
      if (off + 4 > p.length) throw new IllegalArgumentException("truncated AVI")
      new String(p, off, 4, "US-ASCII")
    }

    final case class Parsed(width: Int, height: Int, fps: Double, frames: Seq[BufferedImage])

    /** Walk the RIFF tree; decode every `xxdc` frame chunk with ImageIO. */
    def parse(payload: Array[Byte]): Parsed = {
      if (cc(payload, 0) != "RIFF" || cc(payload, 8) != "AVI ")
        throw new IllegalArgumentException("not a RIFF/AVI container")
      val end = math.min(payload.length.toLong, 8L + rd32(payload, 4)).toInt
      var usecPerFrame = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[BufferedImage]
      def walk(from: Int, to: Int): Unit = {
        var off = from
        while (off + 8 <= to) {
          val kind = cc(payload, off)
          val size = rd32(payload, off + 4)
          if (size < 0 || off + 8 + size > to) throw new IllegalArgumentException("bad chunk size")
          if (kind == "LIST") walk(off + 12, off + 8 + size)
          else if (kind == "avih") usecPerFrame = rd32(payload, off + 8)
          else if (kind.endsWith("dc")) {
            val img = ImageIO.read(new ByteArrayInputStream(payload, off + 8, size))
            if (img == null) throw new IllegalArgumentException("undecodable frame")
            frames += img
          }
          off += 8 + size + (size & 1)
        }
      }
      walk(12, end)
      if (frames.isEmpty) throw new IllegalArgumentException("no video frames")
      val fps = if (usecPerFrame > 0) 1e6 / usecPerFrame else 0.0
      Parsed(frames.head.getWidth, frames.head.getHeight, fps, frames.toSeq)
    }
  }

  /**
   * Deterministic synthetic media table with REAL payload bytes: PNG for
   * images, WAV for audio, MJPEG-AVI ([[Avi]]) for video. Every 50th
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
            val (bytes, ms) = Avi.make(id)
            ("video/avi", bytes, None, None, Some(ms))
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

  /** MJPEG-AVI decode via [[Avi.parse]] + per-frame ImageIO JPEG decode →
    * [frames, width, height, fps, meanLum (all pixels, all frames), minLum,
    * maxLum, motion, 0…] where motion = mean |Δ frame-mean-luminance| over
    * successive frames. Every value is computed from really-decoded pixels;
    * malformed containers throw, landing the row in the `ok=false` path. */
  private[graft] def videoFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val p = Avi.parse(payload)
    var sumL = 0.0; var nPix = 0L
    var minL = Double.MaxValue; var maxL = Double.MinValue
    val frameMeans = p.frames.map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      var s = 0.0
      @inline def acc(r: Int, g: Int, b: Int): Unit = {
        val lum = (r + g + b) / 3.0
        s += lum
        if (lum < minL) minL = lum
        if (lum > maxL) maxL = lum
      }
      // same bulk Raster.getPixels fast path as imageFeatures (JPEG decodes
      // to TYPE_3BYTE_BGR): per-pixel getRGB routes through ColorModel
      // conversion and was the r3 m_features regression
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
      sumL += s; nPix += w.toLong * h
      s / (w.toLong * h)
    }
    val motion =
      if (frameMeans.length < 2) 0.0
      else frameMeans.sliding(2).map { case Seq(a, b) => math.abs(b - a) }.sum / (frameMeans.length - 1)
    pad(Seq(p.frames.length.toFloat, p.width.toFloat, p.height.toFloat, p.fps.toFloat,
      (sumL / nPix).toFloat, minL.toFloat, maxL.toFloat, motion.toFloat), dim)
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
