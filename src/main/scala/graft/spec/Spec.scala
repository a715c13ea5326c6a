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
  /** uint64 capped at Long.MaxValue: LongType repr, per SURVEY.md §1.2. */
  val uint: PInt = PInt(0L, Long.MaxValue)
}
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
    deprecated: Boolean = false)

/** A variant option (`piqi/piqi.piqi:187-217`). Options may carry no type (enum-like). */
final case class POption(name: String, tpe: Option[PiqiType] = None)

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

  /** Desugared copy: flags become optional bool default false (`piqi.ml:663-682`). */
  lazy val resolved: Spec = {
    val newDefs = defs.map {
      case RecordDef(n, fs) =>
        RecordDef(n, fs.map {
          case f @ PField(_, _, Flag, _, _, _) =>
            f.copy(tpe = PBool, mode = Optional(Some(false)))
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
    s.defs.foreach(checkDef)
    checkRootExists(s)
    checkNoInfiniteTypes(s)
  }

  /** Duplicate-name detection (`piqi.ml:207-213`, used at `341-356`). */
  private def checkDupTypeNames(s: Spec): Unit = {
    val dups = s.defs.groupBy(_.name).filter(_._2.size > 1).keys
    if (dups.nonEmpty) fail(s"duplicate type definitions: ${dups.mkString(", ")}")
  }

  /** check_field / check_record / check_variant / check_enum (`piqi.ml:216-314`). */
  private def checkDef(d: TypeDef): Unit = d match {
    case RecordDef(n, fields) =>
      if (fields.isEmpty) fail(s"record $n: must have at least one field")
      val dups = fields.groupBy(_.name).filter(_._2.size > 1).keys
      if (dups.nonEmpty) fail(s"record $n: duplicate field names: ${dups.mkString(", ")}")
      fields.foreach { f =>
        // defaults only allowed on optional fields (`piqi.ml:236-238`)
        f.mode match {
          case Required | Repeated =>
            () // no default slot exists on these modes in our ADT
          case _ => ()
        }
        if (f.name.isEmpty) fail(s"record $n: field must have a name")
      }
    case VariantDef(n, options) =>
      if (options.isEmpty) fail(s"variant $n: must have at least one option") // piqi.ml:266-272
      val dups = options.groupBy(_.name).filter(_._2.size > 1).keys
      if (dups.nonEmpty) fail(s"variant $n: duplicate option names: ${dups.mkString(", ")}")
    case EnumDef(n, options) =>
      if (options.isEmpty) fail(s"enum $n: must have at least one option") // piqi.ml:289-295
      val dups = options.groupBy(identity).filter(_._2.size > 1).keys
      if (dups.nonEmpty) fail(s"enum $n: duplicate options: ${dups.mkString(", ")}")
    case _: ListDef | _: AliasDef => ()
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
