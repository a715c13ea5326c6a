package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal (image/audio/video) column plumbing: media payloads travel as
 * opaque `binary` columns with typed metadata (the Spark shape of the
 * reference's `binary` primitive + `piqi-any` dynamic payloads,
 * `doc/piqi.md:404-415`), and decode/feature-extraction runs as a
 * batched per-partition map.
 *
 * NOTE ON THE STUB: this container has no image/audio codecs, so the
 * actual decode step is a clearly-marked deterministic fake
 * ([[stubDecode]]). Everything AROUND it — the schema, the partition-wise
 * batched execution shape, null/poison-payload handling, the feature
 * column contract — is real and tested. Swapping in a real decoder means
 * replacing ONE function body.
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

  /** Deterministic synthetic media table (payload bytes derived from the ref). */
  def synthesizeMedia(spark: SparkSession, n: Long, numPartitions: Int = 8): DataFrame = {
    val mimes = array(lit("image/png"), lit("audio/wav"), lit("video/mp4"))
    spark.range(0, n, 1, numPartitions)
      .select(
        concat(lit("m-"), col("id").cast(StringType)).as("media_ref"),
        element_at(mimes, pmod(col("id"), lit(3)).cast(IntegerType) + 1).as("mime"),
        // payload: deterministic pseudo-bytes; ~1/50 rows null (missing blob)
        when(pmod(col("id"), lit(50)) === 0, lit(null).cast(BinaryType))
          .otherwise(unhex(sha2(concat(lit("payload-"), col("id").cast(StringType)), 256)))
          .as("payload"),
        when(pmod(col("id"), lit(3)) === 0, (pmod(col("id"), lit(64)) * 16 + 16).cast(IntegerType)).as("width"),
        when(pmod(col("id"), lit(3)) === 0, (pmod(col("id"), lit(48)) * 16 + 16).cast(IntegerType)).as("height"),
        when(pmod(col("id"), lit(3)) =!= 0, (pmod(col("id"), lit(30000)) + 1000).cast(IntegerType)).as("duration_ms"))
  }

  final case class MediaFeature(media_ref: String, mime: String, ok: Boolean,
      feat_dim: Int, features: Array[Float], checksum: Long)

  /**
   * ??? REAL-DECODER SLOT ??? — deterministic fake standing in for
   * image/audio decode + feature extraction (no codec libs in this
   * container). Derives a fixed-dim pseudo-feature vector from payload
   * bytes. Deterministic: same payload → same features.
   */
  private def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    i = 0
    while (i < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L // SplitMix-ish LCG step
      out(i) = ((h >>> 40).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /**
   * Batched feature extraction over payload binaries. The execution shape
   * is the one a real decoder needs: per-partition iteration in bounded
   * batches (decoder init cost amortized per batch, memory bounded by
   * `batchSize × payload`), null payloads short-circuited, per-row failure
   * isolated (`ok=false`) instead of task failure.
   */
  def extractFeatures(media: DataFrame, dim: Int = 16, batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_ref"), col("mime"), col("payload"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real decoder would init once per batch here
          batch.iterator.map { case (ref, mime, payload) =>
            if (payload == null) MediaFeature(ref, mime, ok = false, 0, Array.empty, 0L)
            else {
              try {
                val f = stubDecode(payload, dim)
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
