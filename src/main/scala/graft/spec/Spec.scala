package graft.spec

/**
 * Piqi-style schema + constraint specification ADT.
 *
 * Re-expresses the reference's type system (alavrik/piqi,
 * `piqi/piqi.piqi:91-105`, `doc/piqi.md:425-763`) as a Scala ADT that a
 * future pass compiles into Catalyst `Column` expression trees. The
 * reference's unit of data is a typed document object validated against a
 * schema (`piqilib/piqobj.ml:18-48`); ours is a Spark row validated against
 * a compiled constraint plan. We reproduce the *semantics* (required /
 * optional / repeated field modes, enum membership, variant exactly-one,
 * alias constraint chains), not the `.piqi` surface syntax (non-goal, see
 * SURVEY.md §1.2).
 */
sealed trait PiqiType

/** Primitive types (`doc/piqi.md:335-398`; builtin aliases `piqi/piqi.piqi:24-70`). */
sealed trait Primitive extends PiqiType
case object PBool extends Primitive
/**
 * All piqi int flavors map to int64 internally with range constraints
 * (`piqilib/piqobj.ml:40-41`). The reference documents missing runtime
 * overflow checks as a known gap (`doc/tools.md:490-493`); we enforce the
 * documented ranges (`doc/piqi.md:345-386`).
 */
final case class PInt(min: Long = Long.MinValue, max: Long = Long.MaxValue) extends Primitive
object PInt {
  val int32: PInt = PInt(Int.MinValue.toLong, Int.MaxValue.toLong)
  val uint32: PInt = PInt(0L, 4294967295L)
  val int64: PInt = PInt()
  /** uint capped at Long.MaxValue (LongType repr) — the cheap flavor when
    * values are known < 2^63; [[PUInt64]] covers the full domain. */
  val uint: PInt = PInt(0L, Long.MaxValue)
  /** Full-domain uint64 (see [[PUInt64]]). */
  val uint64: PiqiType = PUInt64
}
/**
 * Full-range uint64 (0 .. 2^64−1, `doc/piqi.md:345-347`): represented as
 * `DecimalType(20,0)` because LongType cannot hold 2^63..2^64−1. Costs more
 * than LongType per value — prefer [[PInt.uint]] when the domain permits.
 */
case object PUInt64 extends Primitive
case object PFloat extends Primitive  // IEEE754 double, doc/piqi.md:388-389
case object PFloat32 extends Primitive // IEEE754 single (`float32`, doc/piqi.md:388-389)
case object PString extends Primitive // UTF-8 validated, piqilib/piqi_utf8.ml:33-67
/** Byte array; JSON representation base64 (`piqobj_of_json.ml:66-72`). */
case object PBinary extends Primitive
/** Dynamically-typed payload (`doc/piqi.md:404-415`): stored raw, parsed lazily. */
case object PAny extends Primitive

/** Named reference to a typedef in the module (like piqi name→type resolution). */
final case class TypeRef(name: String) extends PiqiType

/** Field modes, `piqi/piqi.piqi:178-184`. */
sealed trait FieldMode
case object Required extends FieldMode
/** Optional with piqi-style default literal (resolved at compile, `piqi.ml:568-615`). */
final case class Optional(default: Option[Any] = None) extends FieldMode
case object Repeated extends FieldMode
/**
 * Flag sugar: nameless bool, present→true absent→false. The reference
 * rewrites flags to `.type bool .default false` (`piqi.ml:663-682`); we do
 * the same desugaring in [[Spec.resolved]].
 */
case object Flag extends FieldMode

/**
 * Extra value constraints attachable to a field or alias — the analog of
 * piqi's alias property bag (piq-format, wire-type overrides,
 * `doc/piqi.md:706-763`) generalized to the validation rules the north rule
 * requires.
 */
sealed trait Constraint
/** Lexical constraint, the analog of `.piq-format word|text` checks (`piqobj_of_piq.ml:136-171`). */
final case class MatchesRegex(regex: String) extends Constraint
/** Base64-decodable content for binary-in-string ingest (`piqobj_of_json.ml:66-72`). */
case object Base64 extends Constraint
/** Valid UTF-8 for string-from-binary ingest (`piqilib/piqi_utf8.ml:33-120`). */
case object ValidUtf8 extends Constraint
/** Numeric/size range; for repeated fields applies to cardinality. */
final case class InRange(min: Double, max: Double) extends Constraint
/** Membership in a fixed set (enum-like constraint on an open string field). */
final case class OneOf(values: Seq[String]) extends Constraint

/** A record field (`piqi/piqi.piqi:132-175`). */
final case class PField(
    name: String,
    tpe: PiqiType,
    mode: FieldMode = Required,
    constraints: Seq[Constraint] = Nil,
    jsonName: Option[String] = None,
    deprecated: Boolean = false) {
  /** Effective JSON key: fields are resolved BY json-name on input and
    * emitted under it (`piqobj_of_json.ml:171`, `piqobj_to_json.ml:115`). */
  def jsonKey: String = jsonName.getOrElse(name)
}

/** A variant option (`piqi/piqi.piqi:187-217`). Options may carry no type
  * (enum-like). `jsonName` overrides the JSON key, like fields
  * (`piqobj_of_json.ml:241,277` resolve options by json-name). */
final case class POption(name: String, tpe: Option[PiqiType] = None,
    jsonName: Option[String] = None) {
  def jsonKey: String = jsonName.getOrElse(name)
}

/** Typedefs (`piqi/piqi.piqi:91-105`). */
sealed trait TypeDef { def name: String }
final case class RecordDef(name: String, fields: Seq[PField]) extends TypeDef
/** Tagged union: exactly one option set (`piqobj_of_json.ml:248-253`). */
final case class VariantDef(name: String, options: Seq[POption]) extends TypeDef
final case class EnumDef(name: String, options: Seq[String]) extends TypeDef
final case class ListDef(name: String, elem: PiqiType,
    elemConstraints: Seq[Constraint] = Nil) extends TypeDef
/** Alias = name + constraint bag over another type (`piqi/piqi.piqi:235-252`). */
final case class AliasDef(name: String, target: PiqiType,
    constraints: Seq[Constraint] = Nil) extends TypeDef

/**
 * Cross-field / cross-row rules the north rule adds beyond per-value checks.
 * Paths are dot-separated; a path segment into a repeated field addresses
 * each element (e.g. "spans.offset").
 */
sealed trait RowRule
/** Exactly one of `paths` non-null per row/element — variant semantics over sparse columns. */
final case class ExactlyOneOf(ruleName: String, paths: Seq[String]) extends RowRule
/** A struct-array's `field` must be strictly increasing in element order. */
final case class StrictlyIncreasing(ruleName: String, arrayPath: String, field: String) extends RowRule
/** At most one of `paths` non-null (optional-exclusive). */
final case class AtMostOneOf(ruleName: String, paths: Seq[String]) extends RowRule

/**
 * A module: the analog of a resolved `.piqi` module after
 * `process_piqi` (`piqilib/piqi.ml:1598-1819`). `imports` model piqi's
 * namespaced module reuse (`doc/piqi.md:258-291`) as plain Scala
 * composition: imported defs are merged under "modname/typename" keys.
 */
final case class Spec(
    module: String,
    defs: Seq[TypeDef],
    root: String,
    rowRules: Seq[RowRule] = Nil,
    imports: Seq[Spec] = Nil,
    strict: Boolean = false) {

  /** All defs visible to this module: own + imported (qualified). */
  lazy val defTable: Map[String, TypeDef] = {
    val imported = imports.flatMap { m =>
      m.defTable.map { case (k, d) => s"${m.module}/$k" -> d }
    }
    (imported ++ defs.map(d => d.name -> d)).toMap
  }

  /**
   * Extension application (piqi `extend`, `doc/piqi.md:766-869`): splice a
   * field into an existing record def — the Scala-composition analog of
   * `apply_extensions` (`piqilib/piqi.ml:1009-1247`). Re-runs all structural
   * checks (dup fields, cycles) on the extended module.
   */
  def extendRecord(recordName: String, field: PField): Spec = {
    require(defs.exists { case RecordDef(n, _) => n == recordName; case _ => false },
      s"extend target record '$recordName' not found")
    copy(defs = defs.map {
      case RecordDef(n, fs) if n == recordName => RecordDef(n, fs :+ field)
      case d => d
    })
  }

  /** Extension for enums: add options (piqi `extend` on enum, `doc/piqi.md:836-846`). */
  def extendEnum(enumName: String, options: String*): Spec = {
    require(defs.exists { case EnumDef(n, _) => n == enumName; case _ => false },
      s"extend target enum '$enumName' not found")
    copy(defs = defs.map {
      case EnumDef(n, os) if n == enumName => EnumDef(n, os ++ options)
      case d => d
    })
  }

  /** Desugared copy: flags become optional bool default false
    * (`piqi.ml:663-682`); default literals normalize to the canonical JSON
    * scalar domain (Int → Long, Float → Double) so compiled plans and the
    * SpecJson blob see one representation. */
  lazy val resolved: Spec = {
    def norm(v: Any): Any = v match {
      case i: Int => i.toLong
      case f: Float => f.toDouble
      case other => other
    }
    val newDefs = defs.map {
      case RecordDef(n, fs) =>
        RecordDef(n, fs.map {
          case f @ PField(_, _, Flag, _, _, _) =>
            f.copy(tpe = PBool, mode = Optional(Some(false)))
          case f @ PField(_, _, Optional(Some(d)), _, _, _) =>
            f.copy(mode = Optional(Some(norm(d))))
          case f => f
        })
      case d => d
    }
    copy(defs = newDefs)
  }

  SpecChecks.checkAll(this)
}

/** Raised on structurally invalid specs — compile-time analog of piqi schema errors. */
final class SpecException(msg: String) extends IllegalArgumentException(msg)

/**
 * Structural schema validity checks, ported semantics of
 * `piqilib/piqi.ml:207-498` (see SURVEY.md §2.A A3-A5).
 */
object SpecChecks {
  private def fail(msg: String): Nothing = throw new SpecException(msg)

  def checkAll(s: Spec): Unit = {
    checkDupTypeNames(s)
    s.defs.foreach(d => checkDef(s, d))
    checkRootExists(s)
    checkNoInfiniteTypes(s)
  }

  /** Duplicate-name detection (`piqi.ml:207-213`, used at `341-356`). */
  private def checkDupTypeNames(s: Spec): Unit = {
    val dups = s.defs.groupBy(_.name).filter(_._2.size > 1).keys
    if (dups.nonEmpty) fail(s"duplicate type definitions: ${dups.mkString(", ")}")
  }

  /** check_field / check_record / check_variant / check_enum (`piqi.ml:216-314`). */
  private def checkDef(s: Spec, d: TypeDef): Unit = d match {
    case RecordDef(n, fields) =>
      if (fields.isEmpty) fail(s"record $n: must have at least one field")
      val dups = fields.groupBy(_.name).filter(_._2.size > 1).keys
      if (dups.nonEmpty) fail(s"record $n: duplicate field names: ${dups.mkString(", ")}")
      // effective JSON keys must be unique too (json-name may collide with
      // another field's name or json-name — the reference resolves fields BY
      // json-name, `piqobj_of_json.ml:171`, so a collision is ambiguous)
      val keyDups = fields.groupBy(f => f.jsonName.getOrElse(f.name))
        .filter(_._2.size > 1).keys
      if (keyDups.nonEmpty) fail(s"record $n: duplicate JSON keys: ${keyDups.mkString(", ")}")
      fields.foreach { f =>
        if (f.name.isEmpty) fail(s"record $n: field must have a name")
        // default literal must parse against the field's type at schema
        // load, like the reference (`piqi.ml:568-615`) — not blow up (or
        // silently coerce) inside coalesce(col, lit(d)) at run time
        f.mode match {
          case Optional(Some(dft)) => checkDefaultLiteral(s, n, f.name, f.tpe, dft)
          case _ => ()
        }
      }
    case VariantDef(n, options) =>
      if (options.isEmpty) fail(s"variant $n: must have at least one option") // piqi.ml:266-272
      val dups = options.groupBy(_.name).filter(_._2.size > 1).keys
      if (dups.nonEmpty) fail(s"variant $n: duplicate option names: ${dups.mkString(", ")}")
      val keyDups = options.groupBy(o => o.jsonName.getOrElse(o.name))
        .filter(_._2.size > 1).keys
      if (keyDups.nonEmpty) fail(s"variant $n: duplicate JSON keys: ${keyDups.mkString(", ")}")
    case EnumDef(n, options) =>
      if (options.isEmpty) fail(s"enum $n: must have at least one option") // piqi.ml:289-295
      val dups = options.groupBy(identity).filter(_._2.size > 1).keys
      if (dups.nonEmpty) fail(s"enum $n: duplicate options: ${dups.mkString(", ")}")
    case _: ListDef | _: AliasDef => ()
  }

  /** Type-check a default literal against the field's RESOLVED base type —
    * the `parse_default`-at-schema-load analog (`piqi.ml:568-615`). Unknown
    * TypeRef targets are skipped here (checkNoInfiniteTypes reports them). */
  private def checkDefaultLiteral(s: Spec, rec: String, fld: String,
      tpe: PiqiType, dft: Any, seen: Set[String] = Set.empty): Unit = {
    def bad(expected: String): Nothing =
      fail(s"record $rec: field $fld: default literal " +
        s"${dft.getClass.getSimpleName}(${dft}) does not match $expected")
    tpe match {
      case PBool => if (!dft.isInstanceOf[Boolean]) bad("bool")
      case PInt(lo, hi) => dft match {
        case i: Int => if (i < lo || i > hi) bad(s"int range [$lo,$hi]")
        case l: Long => if (l < lo || l > hi) bad(s"int range [$lo,$hi]")
        case _ => bad("int")
      }
      case PFloat | PFloat32 => dft match {
        case _: Double | _: Float | _: Int | _: Long => ()
        case _ => bad("float")
      }
      case PUInt64 => dft match {
        // default literals stay in the Long-expressible part of the domain
        // (the canonical SpecJson scalar set); data values get the full range
        case i: Int => if (i < 0) bad("uint64 (non-negative)")
        case l: Long => if (l < 0) bad("uint64 (non-negative)")
        case _ => bad("uint64")
      }
      case PString => if (!dft.isInstanceOf[String]) bad("string")
      case PBinary => dft match {
        case _: Array[Byte] | _: String => () // String = base64 form
        case _ => bad("binary (bytes or base64 string)")
      }
      case PAny => if (!dft.isInstanceOf[String]) bad("any (raw JSON string)")
      case TypeRef(n) if !seen(n) => s.defTable.get(n) match {
        case Some(AliasDef(_, target, _)) =>
          checkDefaultLiteral(s, rec, fld, target, dft, seen + n)
        case Some(EnumDef(_, opts)) => dft match {
          case v: String =>
            if (!opts.contains(v)) bad(s"enum $n member (${opts.mkString("|")})")
          case _ => bad(s"enum $n member")
        }
        case Some(other) =>
          fail(s"record $rec: field $fld: default literals are not supported " +
            s"on ${other.getClass.getSimpleName.stripSuffix("Def").toLowerCase} types")
        case None => () // unknown type: reported by checkNoInfiniteTypes
      }
      case _ => ()
    }
  }

  private def checkRootExists(s: Spec): Unit =
    if (!s.defTable.contains(s.root)) fail(s"root type '${s.root}' is not defined")

  /**
   * Cycle detection, ported from `check_no_infinite_types`
   * (`piqi.ml:360-498`, DFS 3-color). Deviation (documented, FIXTURES.md S5):
   * the reference allows optional/repeated cycles; Spark schemas cannot be
   * recursive, so we reject ALL cycles at compile time.
   */
  private def checkNoInfiniteTypes(s: Spec): Unit = {
    val White = 0; val Gray = 1; val Black = 2
    val color = scala.collection.mutable.Map[String, Int]().withDefaultValue(White)

    def refsOf(t: PiqiType): Seq[String] = t match {
      case TypeRef(n) => Seq(n)
      case _ => Nil
    }
    def edges(name: String): Seq[String] = s.defTable.get(name).toSeq.flatMap {
      case RecordDef(_, fs) => fs.flatMap(f => refsOf(f.tpe))
      case VariantDef(_, os) => os.flatMap(o => o.tpe.toSeq.flatMap(refsOf))
      case ListDef(_, e, _) => refsOf(e)
      case AliasDef(_, t, _) => refsOf(t)
      case _: EnumDef => Nil
    }
    def visit(name: String, path: List[String]): Unit = color(name) match {
      case Black => ()
      case Gray =>
        fail(s"recursive type (cycle): ${(name :: path).reverse.mkString(" -> ")}")
      case _ =>
        color(name) = Gray
        edges(name).foreach { dep =>
          if (s.defTable.contains(dep)) visit(dep, name :: path)
          else fail(s"unknown type '$dep' referenced from '$name'") // piqi_db.ml:149-153
        }
        color(name) = Black
    }
    s.defs.foreach(d => visit(d.name, Nil))
  }
}
