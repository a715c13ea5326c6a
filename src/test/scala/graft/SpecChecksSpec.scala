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

  // ---- S4/S5: the reference's full infinite-types matrix, ported from
  // /root/reference/tests/infinite_types/Makefile:20-28 (8 must-fail
  // fixtures, 2 must-pass). Semantics = check_no_infinite_types
  // (piqi.ml:360-498): productivity, not reject-all-cycles.

  test("S4a: infinite_record — required self-field rejected") {
    val e = intercept[SpecException] {
      Spec("m", Seq(rec("r", PField("self", TypeRef("r"), Required))), "r")
    }
    assert(e.getMessage.contains("forms a loop"))
  }

  test("S4b: infinite_record2 — required field through an alias rejected") {
    val e = intercept[SpecException] {
      Spec("m", Seq(rec("r", PField("f", TypeRef("a"), Required)),
        AliasDef("a", TypeRef("r"))), "r")
    }
    assert(e.getMessage.contains("record 'r'"))
  }

  test("S4c: infinite_alias — self-alias rejected") {
    val e = intercept[SpecException] {
      Spec("m", Seq(AliasDef("a", TypeRef("a")),
        rec("r", PField("x", PString))), "r")
    }
    assert(e.getMessage.contains("alias"))
  }

  test("S4d: infinite_alias2 — mutual alias loop rejected") {
    val e = intercept[SpecException] {
      Spec("m", Seq(AliasDef("a", TypeRef("b")), AliasDef("b", TypeRef("a")),
        rec("r", PField("x", PString))), "r")
    }
    assert(e.getMessage.contains("forms a loop"))
  }

  test("S4e: infinite_list — list of itself rejected (empty list would terminate, reference still rejects)") {
    val e = intercept[SpecException] {
      Spec("m", Seq(ListDef("l", TypeRef("l")),
        rec("r", PField("x", PString))), "r")
    }
    assert(e.getMessage.contains("list 'l' forms a loop"))
  }

  test("S4f: infinite_list2 — list looping through an alias rejected") {
    intercept[SpecException] {
      Spec("m", Seq(ListDef("l", TypeRef("a")), AliasDef("a", TypeRef("l")),
        rec("r", PField("x", PString))), "r")
    }
  }

  test("S4g: infinite_variant — every option loops → rejected") {
    val e = intercept[SpecException] {
      Spec("m", Seq(
        VariantDef("v", Seq(POption("s", Some(TypeRef("v"))),
          POption("o", Some(TypeRef("a"))))),
        AliasDef("a", TypeRef("v")),
        rec("r", PField("x", PString))), "r")
    }
    assert(e.getMessage.contains("variant 'v'"))
  }

  test("S4h: infinite_variant2 — options loop via self and via alias pair → rejected") {
    intercept[SpecException] {
      Spec("m", Seq(
        VariantDef("v", Seq(POption("s", Some(TypeRef("v"))),
          POption("o", Some(TypeRef("a"))))),
        AliasDef("a", TypeRef("b")), AliasDef("b", TypeRef("a")),
        rec("r", PField("x", PString))), "r")
    }
  }

  test("S5a: finite.piqi — variant with one escaping option recursing through a list ACCEPTED") {
    // .variant where [ rec: where-list | uint ]; .list where-list of where
    Spec("m", Seq(
      VariantDef("where", Seq(POption("rec", Some(TypeRef("where-list"))),
        POption("uint", Some(PInt.uint)))),
      ListDef("where-list", TypeRef("where")),
      rec("r", PField("w", TypeRef("where"), Optional()))), "r")
  }

  test("S5b: finite_nested.piqi — mutually recursive variant/records with one finite option ACCEPTED") {
    // used to trigger an assert in the reference's check (its own comment);
    // exercises the white-reset backtracking: v is entered via r1/r2/r3
    // before its own finite option v2 is found
    Spec("m", Seq(
      VariantDef("v", Seq(
        POption("r1", Some(TypeRef("r1"))), POption("r2", Some(TypeRef("r2"))),
        POption("r3", Some(TypeRef("r3"))), POption("v2", Some(TypeRef("v2"))))),
      VariantDef("v2", Seq(POption("a"))),
      rec("r1", PField("f", TypeRef("v"), Required)),
      rec("r2", PField("f", TypeRef("v"), Required)),
      rec("r3", PField("v3", TypeRef("v3"), Required),
        PField("f", TypeRef("v"), Required)),
      VariantDef("v3", Seq(POption("a"))),
      rec("r", PField("x", TypeRef("v"), Optional()))), "r")
  }

  test("S5c: optional/repeated self-cycles ACCEPTED (piqi.ml:434-440)") {
    Spec("m", Seq(rec("tree", PField("kids", TypeRef("tree"), Repeated),
      PField("x", PString))), "tree")
    Spec("m", Seq(rec("node", PField("next", TypeRef("node"), Optional()),
      PField("x", PString))), "node")
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
