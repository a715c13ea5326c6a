package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.spec._
import graft.compile.SpecCompiler
import graft.exec.ValidationRunner
import graft.io.Docs

/**
 * Ports of the reference's valid/invalid fixture semantics into the
 * interleaved-doc domain (FIXTURES.md §2; pattern from
 * `/root/reference/tests/piq/Makefile:18-22`: valid → pass, invalid →
 * exactly these violations).
 */
class ValidationSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private def span(kind: String, text: String, media: String, offset: Int): Row =
    Row(kind, text, media, offset)

  private def docs(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, Docs.docSchema)

  private lazy val plan = SpecCompiler.compile(Docs.docSpec)

  private def rulesFor(row: Row): Set[String] = {
    val validated = ValidationRunner.validate(docs(Seq(row)), plan)
    validated.select(explode(col("violations"))).collect()
      .map(_.getStruct(0).getString(0)).toSet
  }

  // --- V1-V5: well-formed docs → zero violations ---
  test("V1-V5: valid docs pass") {
    val valid = Seq(
      Row("doc-empty", Seq()),                                        // 0 spans
      Row("doc-1", Seq(span("text", "hello", null, 0))),              // 1 span
      Row("doc-all-text", (0 until 7).map(j => span("text", s"t$j", null, j * 16))),
      Row("doc-all-media", (0 until 7).map(j => span("media", null, s"m-$j", j * 16))),
      Row("doc-mixed", Seq(span("text", "a", null, 0), span("media", null, "m-1", 5))))
    val validated = ValidationRunner.validate(docs(valid), plan)
    assert(validated.where(!col("valid")).count() === 0)
  }

  test("I1: null doc_id → missing-field") {
    assert(rulesFor(Row(null, Seq(span("text", "x", null, 0)))) === Set("missing-field:doc_id"))
  }

  test("I2: unknown span kind → unknown-enum") {
    assert(rulesFor(Row("doc-1", Seq(span("video", "x", null, 0)))) ===
      Set("unknown-enum:spans.kind"))
  }

  test("I3: both text and media_ref set → exactly-one") {
    assert(rulesFor(Row("doc-1", Seq(span("text", "x", "m-1", 0)))) ===
      Set("exactly-one:span-payload"))
  }

  test("I4: neither text nor media_ref → exactly-one") {
    assert(rulesFor(Row("doc-1", Seq(span("text", null, null, 0)))) ===
      Set("exactly-one:span-payload"))
  }

  test("I5: negative offset → range") {
    assert(rulesFor(Row("doc-1", Seq(span("text", "x", null, -1)))) ===
      Set("range:spans.offset"))
  }

  test("I6: non-monotone offsets → order") {
    val r = Row("doc-1", Seq(span("text", "a", null, 0), span("text", "b", null, 32),
      span("text", "c", null, 16)))
    assert(rulesFor(r) === Set("order:span-offset"))
  }

  test("multiple violations collected per row (not fail-fast)") {
    val r = Row(null, Seq(span("video", "x", "m-1", -1)))
    assert(rulesFor(r) === Set("missing-field:doc_id", "unknown-enum:spans.kind",
      "exactly-one:span-payload", "range:spans.offset"))
  }

  test("violation rows carry element index in path") {
    val r = Row("doc-1", Seq(span("text", "ok", null, 0), span("video", "x", null, 16)))
    val validated = ValidationRunner.validate(docs(Seq(r)), plan)
    val rows = ValidationRunner.violationRows(validated, "doc_id").collect()
    assert(rows.length === 1)
    assert(rows(0).getString(1) === "unknown-enum:spans.kind")
    assert(rows(0).getString(2) === "spans[1].kind")
  }

  test("I7: duplicate doc_id reported by uniqueness check (both rows)") {
    val d = docs(Seq(
      Row("doc-a", Seq(span("text", "x", null, 0))),
      Row("doc-a", Seq(span("text", "y", null, 0))),
      Row("doc-b", Seq(span("text", "z", null, 0)))))
    val dups = ValidationRunner.uniqueDuplicates(d, "doc_id").collect()
    assert(dups.map(r => (r.getString(0), r.getLong(1))).toSet === Set(("doc-a", 2L)))
    val rows = ValidationRunner.duplicateRows(d, "doc_id")
    assert(rows.count() === 2)
  }

  test("salted uniqueness agrees with plain groupBy under skew") {
    val d = Docs.generate(spark, 2000, numPartitions = 8, hotEvery = 10)
    val plain = ValidationRunner.uniqueDuplicates(d, "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = ValidationRunner.uniqueDuplicatesSalted(d, "doc_id", 16).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(plain === salted)
    assert(plain === Set(("doc-hot", 200L)))
  }

  test("I8: media_ref not in catalog → ref violation rows") {
    val d = docs(Seq(
      Row("doc-a", Seq(span("media", null, "m-1", 0))),
      Row("doc-b", Seq(span("media", null, "m-missing", 0)))))
    val exploded = d.select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.media_ref").as("media_ref"))
    val cat = Docs.mediaCatalog(spark, 10)
    val bad = ValidationRunner.refCheck(exploded, "media_ref", cat, "media_ref").collect()
    assert(bad.map(_.getAs[String]("doc_id")).toSet === Set("doc-b"))
  }

  test("generator: deterministic, valid by construction, spans strictly increasing") {
    val d = Docs.generate(spark, 500, numPartitions = 4)
    val validated = ValidationRunner.validate(d, plan)
    assert(validated.where(!col("valid")).count() === 0)
    // deterministic: same args → identical content
    val d2 = Docs.generate(spark, 500, numPartitions = 7) // partitioning must not matter
    assert(d.exceptAll(d2).count() === 0 && d2.exceptAll(d).count() === 0)
  }

  test("generator: corruption knob injects exactly the expected rules") {
    val d = Docs.generate(spark, 400, numPartitions = 4, corruptEvery = 100)
    val validated = ValidationRunner.validate(d, plan)
    val rows = ValidationRunner.violationRows(validated, "doc_id")
      .select("rule").collect().map(_.getString(0)).toSet
    assert(rows === Set("unknown-enum:spans.kind", "range:spans.offset",
      "exactly-one:span-payload"))
    assert(validated.where(!col("valid")).count() === 4)
  }

  test("summary: per-partition pass/fail counts") {
    val d = Docs.generate(spark, 300, numPartitions = 4, corruptEvery = 50)
      .withColumn("bucket", pmod(crc32(col("doc_id")), lit(3)))
    val validated = ValidationRunner.validate(d, plan)
    val s = ValidationRunner.summary(validated, Seq("bucket")).collect()
    assert(s.map(_.getAs[Long]("n_docs")).sum === 300)
    assert(s.map(_.getAs[Long]("n_invalid")).sum === 6)
  }

  test("roundtrip: write → read preserves span sequences exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rt").toString
    val d = Docs.generate(spark, 200, numPartitions = 4)
    d.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(d.exceptAll(back).count() === 0 && back.exceptAll(d).count() === 0)
    val joined = d.alias("a").join(back.alias("b"), "doc_id")
    assert(joined.where(!Docs.spansEqual(col("a.spans"), col("b.spans"), withOffsets = true))
      .count() === 0)
  }

  test("deprecated-field usage report counts non-null occurrences") {
    import graft.spec._
    val spark0 = spark
    import spark0.implicits._
    val spec = Spec("dep", Seq(RecordDef("r", Seq(
      PField("id", PInt.int64, Required),
      PField("old_name", PString, Optional(None), deprecated = true),
      PField("new_name", PString, Optional(None))))), "r")
    val plan = graft.compile.SpecCompiler.compile(spec)
    val df = Seq(
      (1L, Some("a"), None: Option[String]),
      (2L, Some("b"), Some("x")),
      (3L, None: Option[String], Some("y"))).toDF("id", "old_name", "new_name")
    val rep = ValidationRunner.deprecatedUsage(df, plan).collect()
    assert(rep.length === 1)
    assert(rep(0).getString(0) === "old_name")
    assert(rep(0).getLong(1) === 2L && rep(0).getLong(2) === 3L)
    // no deprecated fields → empty report with a stable schema
    val none = ValidationRunner.deprecatedUsage(df,
      graft.compile.SpecCompiler.compile(spec.copy(defs = Seq(RecordDef("r", Seq(
        PField("id", PInt.int64, Required)))))))
    assert(none.columns.toSeq === Seq("field", "n_present", "n_docs") && none.count() === 0)
  }
}
