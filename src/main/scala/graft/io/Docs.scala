package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.spec._

/**
 * The canonical interleaved text+media document domain
 * (`BASELINE.json.input_hint`): one row per document,
 * `(doc_id string, spans array<struct<kind,text,media_ref,offset>>)` —
 * the Spark shape of a piqi record with a repeated sub-record field
 * (modes per `/root/reference/doc/piqi.md:482-494`).
 */
object Docs {

  val spanType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("media_ref", StringType, nullable = true),
    StructField("offset", IntegerType, nullable = false)))

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = true),
    StructField("spans", ArrayType(spanType, containsNull = false), nullable = true)))

  /**
   * The document validation spec — FIXTURES.md §1's piqi record re-expressed
   * in our ADT. Field/enum/variant semantics cite the reference:
   * required (`piqobj_of_json.ml:192-197`), enum membership
   * (`piqobj_of_json.ml:270-284`), exactly-one variant rule
   * (`piqobj_of_json.ml:248-253`); int32 range + span order are
   * north-rule/per-row-invariant additions.
   */
  val docSpec: Spec = Spec(
    module = "document",
    defs = Seq(
      EnumDef("span-kind", Seq("text", "media")),
      RecordDef("span", Seq(
        PField("kind", TypeRef("span-kind"), Required),
        PField("text", PString, Optional()),
        PField("media_ref", PString, Optional()),
        PField("offset", PInt(0L, Int.MaxValue.toLong), Required))),
      RecordDef("document", Seq(
        PField("doc_id", PString, Required,
          constraints = Seq(MatchesRegex("^doc-[0-9a-zA-Z-]+$"))),
        PField("spans", TypeRef("span"), Repeated)))),
    root = "document",
    rowRules = Seq(
      ExactlyOneOf("span-payload", Seq("spans.text", "spans.media_ref")),
      StrictlyIncreasing("span-offset", "spans", "offset")))

  private val KnuthA = 2654435761L // Knuth multiplicative hash constant
  private val HB = 2246822519L     // xxhash prime (public constant)

  /**
   * Deterministic synthetic generator (FIXTURES.md §1, seed fixed by
   * construction): doc i → doc_id "doc-%012d", 1..7 spans, ~1/3 media,
   * strictly increasing offsets. Fully distributed: `spark.range` +
   * column expressions only — no driver-side materialization, no UDFs, so
   * generation itself scales to any row count and stays in codegen.
   *
   * @param hotEvery     every k-th doc reuses doc_id "doc-hot" (skew knob
   *                     for the salted-uniqueness path); 0 = off
   * @param corruptEvery every k-th doc gets one injected violation,
   *                     rotating over the 4 mutation kinds of FIXTURES.md
   *                     §2 (I2 unknown enum, I5 negative offset, I3 both
   *                     payloads, I4 neither payload); 0 = off
   */
  def generate(spark: SparkSession, numDocs: Long, numPartitions: Int = 32,
      catalogSize: Int = 1000, hotEvery: Long = 0L, corruptEvery: Long = 0L): DataFrame = {
    val df = spark.range(0, numDocs, 1, numPartitions)
    val i = col("id")
    def h(j: Column): Column = pmod(i * KnuthA + (j + 1) * HB, lit(1000003L))

    val nSpans = (pmod(i * KnuthA, lit(7L)) + 1).cast(IntegerType)
    val corrupt = if (corruptEvery > 0) pmod(i, lit(corruptEvery)) === 0 else lit(false)
    val corruptKind = if (corruptEvery > 0) pmod(i / corruptEvery, lit(4L)) else lit(-1L)

    val spans = transform(sequence(lit(0), nSpans - 1), j => {
      val hij = h(j.cast(LongType))
      val isMedia = pmod(hij, lit(3L)) === 0
      val isFirst = j === 0
      val kind0 = when(isMedia, lit("media")).otherwise(lit("text"))
      val kind = when(corrupt && corruptKind === 0 && isFirst, lit("video")).otherwise(kind0)
      val text0 = when(!isMedia, concat(lit("t-"), i.cast(StringType), lit("-"), j.cast(StringType)))
      val media0 = when(isMedia, concat(lit("m-"), pmod(hij, lit(catalogSize.toLong)).cast(StringType)))
      val bothPayloads = corrupt && corruptKind === 2 && isFirst
      val noPayload = corrupt && corruptKind === 3 && isFirst
      val text = when(noPayload, lit(null).cast(StringType))
        .when(bothPayloads, coalesce(text0, lit("t-x")))
        .otherwise(text0)
      val media = when(noPayload, lit(null).cast(StringType))
        .when(bothPayloads, coalesce(media0, lit("m-0")))
        .otherwise(media0)
      val offset0 = (j * 16 + pmod(hij, lit(16L))).cast(IntegerType)
      val offset = when(corrupt && corruptKind === 1 && isFirst, lit(-1)).otherwise(offset0)
      struct(kind.as("kind"), text.as("text"), media.as("media_ref"), offset.as("offset"))
    })

    val docId =
      if (hotEvery > 0)
        when(pmod(i, lit(hotEvery)) === 0, lit("doc-hot"))
          .otherwise(format_string("doc-%012d", i))
      else format_string("doc-%012d", i)

    df.select(docId.as("doc_id"), spans.as("spans"))
  }

  /** Reference media catalog `m-0 … m-{size-1}` (FIXTURES.md §1). */
  def mediaCatalog(spark: SparkSession, size: Long, numPartitions: Int = 8): DataFrame =
    spark.range(0, size, 1, numPartitions)
      .select(concat(lit("m-"), col("id").cast(StringType)).as("media_ref"))

  /**
   * Per-row span-sequence equality (kind, text, media_ref, order) — the
   * per-row invariant vs the reference (`BASELINE.json.input_hint`; repeated
   * fields keep input order, `piqobj_of_json.ml:153-161`). Array-of-struct
   * equality in Spark compares element-wise in order, which is exactly the
   * required semantics; offsets are excluded per the invariant's field list
   * by projecting (kind, text, media_ref) — pass `withOffsets = true` to
   * include them.
   */
  def spansEqual(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      withOffsets: Boolean = false): org.apache.spark.sql.Column = {
    def proj(c: org.apache.spark.sql.Column) = transform(c, s =>
      if (withOffsets)
        struct(s.getField("kind"), s.getField("text"), s.getField("media_ref"), s.getField("offset"))
      else struct(s.getField("kind"), s.getField("text"), s.getField("media_ref")))
    proj(a) <=> proj(b)
  }
}
