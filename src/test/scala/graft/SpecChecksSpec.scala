package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spec._

/**
 * Schema-compile negative fixtures (FIXTURES.md §3) — plan construction must
 * throw, porting `/root/reference/tests/infinite_types/Makefile:20-28` and
 * the structural checks in `piqilib/piqi.ml:207-498`.
 */
class SpecChecksSpec extends AnyFunSuite {

  private def rec(name: String, fields: PField*) = RecordDef(name, fields)

  test("S1: duplicate field names rejected") {
    val e = intercept[SpecException] {
      Spec("m", Seq(rec("r", PField("a", PString), PField("a", PInt.int32))), "r")
    }
    assert(e.getMessage.contains("duplicate field"))
  }

  test("duplicate type names rejected") {
    intercept[SpecException] {
      Spec("m", Seq(rec("r", PField("a", PString)), EnumDef("r", Seq("x"))), "r")
    }
  }

  test("S3a: variant with zero options rejected") {
    intercept[SpecException] {
      Spec("m", Seq(VariantDef("v", Nil), rec("r", PField("a", TypeRef("v")))), "r")
    }
  }

  test("S3b: enum with zero options rejected") {
    intercept[SpecException] {
      Spec("m", Seq(EnumDef("e", Nil), rec("r", PField("a", TypeRef("e")))), "r")
    }
  }

  test("S4: required-field cycle rejected (infinite record)") {
    // infinite_record.piqi analog: record referencing itself via required field
    val e = intercept[SpecException] {
      Spec("m", Seq(rec("r", PField("self", TypeRef("r"), Required))), "r")
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("S5: optional/repeated cycles also rejected (documented deviation)") {
    // the reference allows these (piqi.ml:434-440); Spark schemas cannot be
    // recursive so our engine rejects all cycles at compile time
    intercept[SpecException] {
      Spec("m", Seq(rec("r", PField("kids", TypeRef("r"), Repeated),
        PField("x", PString))), "r")
    }
  }

  test("unknown type reference rejected (piqi_db.ml:149-153 analog)") {
    val e = intercept[SpecException] {
      Spec("m", Seq(rec("r", PField("a", TypeRef("nope")))), "r")
    }
    assert(e.getMessage.contains("unknown type"))
  }

  test("missing root rejected") {
    intercept[SpecException] {
      Spec("m", Seq(rec("r", PField("a", PString))), "not-there")
    }
  }

  test("flag desugars to optional bool default false (piqi.ml:663-682)") {
    val s = Spec("m", Seq(rec("r", PField("is-set", PBool, Flag),
      PField("x", PString))), "r").resolved
    val f = s.defTable("r").asInstanceOf[RecordDef].fields.head
    assert(f.mode === Optional(Some(false)))
  }

  test("imports merge under qualified names (doc/piqi.md:258-291 analog)") {
    val dep = Spec("base", Seq(EnumDef("color", Seq("red", "green"))), "color")
    val s = Spec("m", Seq(rec("r", PField("c", TypeRef("base/color")))), "r",
      imports = Seq(dep))
    assert(s.defTable.contains("base/color"))
  }

  test("SpecJson: portable blob round-trips structurally (piqi compile analog)") {
    import graft.spec._
    val gnarly = Spec("m", Seq(
      EnumDef("color", Seq("red", "green")),
      AliasDef("port", PInt(1, 65535), Seq(InRange(1024, 49151))),
      VariantDef("payload", Seq(
        POption("num", Some(TypeRef("port"))), POption("flagish"))),
      ListDef("tags", PString, Seq(MatchesRegex("^[a-z]+$"))),
      RecordDef("r", Seq(
        PField("id", PString, Required, Seq(ValidUtf8), jsonName = Some("ID")),
        PField("opt", PString, Optional(Some("dflt"))),
        PField("n", PInt(0, 10), Optional(Some(3L))),
        PField("x", PFloat, Optional(Some(1.5))),
        PField("f32", PFloat32, Optional()),
        PField("on", PBool, Flag),
        PField("bin", PBinary, Optional(), Seq(Base64)),
        PField("raw", PAny, Optional()),
        PField("tags", TypeRef("tags"), Optional(), deprecated = true),
        PField("p", TypeRef("payload"), Optional()),
        PField("c", TypeRef("color"), Repeated)))), "r",
      rowRules = Seq(
        ExactlyOneOf("xy", Seq("opt", "n")),
        AtMostOneOf("ab", Seq("x", "f32")),
        StrictlyIncreasing("ord", "c", "v")),
      imports = Seq(Spec("dep", Seq(RecordDef("d", Seq(PField("k", PString)))), "d")),
      strict = true)
    for (spec <- Seq(gnarly, graft.io.Docs.docSpec, graft.SparkEntry.documentsSpec)) {
      val json = SpecJson.toJson(spec)
      val back = SpecJson.fromJson(json)
      assert(back === spec, s"roundtrip diverged for ${spec.module}")
      assert(SpecJson.toJson(back) === json) // stable re-serialization
    }
  }

  test("S7: default literals type-checked at schema load (piqi.ml:568-615 analog)") {
    // string default on an int field
    val e1 = intercept[SpecException] {
      Spec("m", Seq(rec("r", PField("n", PInt.int32, Optional(Some("oops"))))), "r")
    }
    assert(e1.getMessage.contains("default"))
    // enum non-member default
    val e2 = intercept[SpecException] {
      Spec("m", Seq(EnumDef("c", Seq("red", "green")),
        rec("r", PField("col", TypeRef("c"), Optional(Some("blue"))))), "r")
    }
    assert(e2.getMessage.contains("enum"))
    // out-of-range int default
    intercept[SpecException] {
      Spec("m", Seq(rec("r", PField("n", PInt(0, 10), Optional(Some(11L))))), "r")
    }
    // type resolved THROUGH an alias chain
    intercept[SpecException] {
      Spec("m", Seq(AliasDef("port", PInt(1, 65535)),
        rec("r", PField("p", TypeRef("port"), Optional(Some(true))))), "r")
    }
    // defaults on record/variant/list types are unsupported
    intercept[SpecException] {
      Spec("m", Seq(rec("sub", PField("k", PString)),
        rec("r", PField("s", TypeRef("sub"), Optional(Some("x"))))), "r")
    }
    // valid ones construct fine: enum member, in-range via alias, bool,
    // int-literal float (widened by resolved)
    Spec("m", Seq(EnumDef("c", Seq("red")), AliasDef("port", PInt(1, 65535)),
      rec("r",
        PField("col", TypeRef("c"), Optional(Some("red"))),
        PField("p", TypeRef("port"), Optional(Some(80))),
        PField("b", PBool, Optional(Some(false))),
        PField("x", PFloat, Optional(Some(2))))), "r")
  }

  test("S8: Int/Float default literals normalize to Long/Double in resolved") {
    val s = Spec("m", Seq(rec("r",
      PField("n", PInt.int32, Optional(Some(3))),
      PField("x", PFloat, Optional(Some(1.5f))))), "r")
    val fs = s.resolved.defs.collect { case RecordDef(_, f) => f }.flatten
    assert(fs.find(_.name == "n").get.mode === Optional(Some(3L)))
    assert(fs.find(_.name == "x").get.mode === Optional(Some(1.5d)))
  }

  test("S9: duplicate effective JSON keys rejected (field and variant-option)") {
    val e = intercept[SpecException] {
      Spec("m", Seq(rec("r",
        PField("a", PString), PField("b", PString, jsonName = Some("a")))), "r")
    }
    assert(e.getMessage.contains("JSON keys"))
    intercept[SpecException] {
      Spec("m", Seq(VariantDef("v", Seq(
          POption("x"), POption("y", None, Some("x")))),
        rec("r", PField("p", TypeRef("v")))), "r")
    }
  }
}
