package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.spec._
import graft.compile.SpecCompiler
import graft.exec.ValidationRunner

/** Extensions (A7), invalid-UTF-8 ingest (I9), AtMostOneOf row rule. */
class ExtensionSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  test("A7: extendRecord splices a validated field; checks re-run") {
    val base = Spec("m", Seq(
      RecordDef("r", Seq(PField("a", PString, Required)))), "r")
    val extended = base.extendRecord("r", PField("b", PInt(0, 9), Required))
    val plan = SpecCompiler.compile(extended)
    val schema = StructType(Seq(StructField("a", StringType), StructField("b", LongType)))
    val df = spark.createDataFrame(Seq(Row("x", 5L), Row("y", 50L), Row("z", null)).asJava, schema)
    val out = ValidationRunner.validate(df, plan)
      .select(col("a"), col("violations.rule")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(out("x") === Set.empty)
    assert(out("y") === Set("range:b"))
    assert(out("z") === Set("missing-field:b"))
    // extension respects structural checks: duplicate field rejected
    intercept[SpecException] { base.extendRecord("r", PField("a", PBool)) }
    intercept[IllegalArgumentException] { base.extendRecord("nope", PField("x", PBool)) }
  }

  test("A7: extendEnum adds options; membership widens") {
    val base = Spec("m", Seq(
      EnumDef("k", Seq("text", "media")),
      RecordDef("r", Seq(PField("kind", TypeRef("k"), Required)))), "r")
    val extended = base.extendEnum("k", "video")
    val schema = StructType(Seq(StructField("kind", StringType)))
    val df = spark.createDataFrame(Seq(Row("video")).asJava, schema)
    assert(ValidationRunner.validate(df, SpecCompiler.compile(base))
      .where(!col("valid")).count() === 1)
    assert(ValidationRunner.validate(df, SpecCompiler.compile(extended))
      .where(!col("valid")).count() === 0)
    intercept[SpecException] { base.extendEnum("k", "text") } // dup option
  }

  test("I9: invalid UTF-8 from binary ingest → utf8 violation") {
    val spec = Spec("m", Seq(
      RecordDef("r", Seq(PField("text", PString, Required, Seq(ValidUtf8))))), "r")
    val plan = SpecCompiler.compile(spec)
    val schema = StructType(Seq(StructField("raw", BinaryType)))
    val good = "hello wörld".getBytes("UTF-8")
    val bad = Array(0xC3.toByte, 0x28.toByte, 0xFF.toByte) // malformed sequences
    val df = spark.createDataFrame(Seq(Row(good), Row(bad)).asJava, schema)
      .select(col("raw").cast(StringType).as("text")) // binary→string: NOT validated by Spark
    val out = ValidationRunner.validate(df, plan)
      .select(col("violations.rule")).collect().map(_.getSeq[String](0).toSet)
    assert(out(0) === Set.empty)
    assert(out(1) === Set("utf8:text"))
  }

  test("AtMostOneOf: zero or one allowed, two violates") {
    val spec = Spec("m", Seq(
      RecordDef("r", Seq(
        PField("id", PString, Required),
        PField("x", PString, Optional()),
        PField("y", PString, Optional())))), "r",
      rowRules = Seq(AtMostOneOf("xy", Seq("x", "y"))))
    val plan = SpecCompiler.compile(spec)
    val schema = StructType(Seq(StructField("id", StringType),
      StructField("x", StringType), StructField("y", StringType)))
    val df = spark.createDataFrame(Seq(
      Row("a", null, null), Row("b", "1", null), Row("c", "1", "2")).asJava, schema)
    val out = ValidationRunner.validate(df, plan)
      .select(col("id"), col("violations.rule")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(out("a") === Set.empty)
    assert(out("b") === Set.empty)
    assert(out("c") === Set("at-most-one:xy"))
  }

  test("A8: includeModule splices defs/rules/imports unqualified (doc/piqi.md:295-307)") {
    // library module: a reusable enum + record, plus its own row rule
    val lib = Spec("lib", Seq(
      EnumDef("kind", Seq("text", "media")),
      RecordDef("span", Seq(
        PField("kind", TypeRef("kind"), Required),
        PField("w", PInt(0, 100), Optional())))), "span")
    // the includer references the included type UNQUALIFIED — as if local
    val doc = Spec.including("doc", Seq(
      RecordDef("doc", Seq(
        PField("id", PString, Required),
        PField("spans", TypeRef("span"), Repeated)))), "doc",
      includes = Seq(lib))
    assert(doc.module === "doc" && doc.root === "doc") // includer identity kept
    assert(doc.defTable.contains("span") && doc.defTable.contains("kind"))
    val plan = SpecCompiler.compile(doc)
    val spanT = StructType(Seq(StructField("kind", StringType), StructField("w", LongType)))
    val schema = StructType(Seq(StructField("id", StringType),
      StructField("spans", ArrayType(spanT))))
    val df = spark.createDataFrame(Seq(
      Row("a", Seq(Row("text", 5L))),
      Row("b", Seq(Row("video", 5L))),   // not in the included enum
      Row("c", Seq(Row("text", 500L)))   // included range violated
    ).asJava, schema)
    val out = ValidationRunner.validate(df, plan)
      .select(col("id"), col("violations.rule")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(out("a") === Set.empty)
    assert(out("b").exists(_.startsWith("unknown-enum")) || out("b").nonEmpty)
    assert(out("c").exists(_.startsWith("range")), out("c").toString)
  }

  test("A8: included-name collisions fail the dup check; extension modules compose") {
    val lib = Spec("lib", Seq(RecordDef("r", Seq(PField("a", PString, Required)))), "r")
    // name collision with a local def → the reference's post-expansion dup error
    intercept[SpecException] {
      Spec("m", Seq(RecordDef("r", Seq(PField("b", PBool)))), "r").includeModule(lib)
    }
    // the extension-module pattern (doc/piqi.md:311-327): include a base
    // module you cannot modify, then extend its defs as if local
    val ext = Spec.including("m2", Seq(
      RecordDef("top", Seq(PField("r", TypeRef("r"), Optional())))), "top",
      includes = Seq(lib))
      .extendRecord("r", PField("extra", PInt(0, 9), Optional()))
    val fields = ext.defTable("r").asInstanceOf[RecordDef].fields.map(_.name)
    assert(fields === Seq("a", "extra"))
    // transitive include: C includes B includes A — all names visible raw
    val c = Spec.including("c", Seq(RecordDef("croot", Seq(
      PField("t", TypeRef("top"), Optional())))), "croot", includes = Seq(ext))
    assert(c.defTable.keySet.intersect(Set("croot", "top", "r")) === Set("croot", "top", "r"))
    SpecCompiler.compile(c): Unit // compiles end-to-end
  }
}
