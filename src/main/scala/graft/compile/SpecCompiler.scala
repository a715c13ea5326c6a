package graft.compile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.spec._

/**
 * Compiles a [[graft.spec.Spec]] into Catalyst `Column` expression trees.
 *
 * This is the Spark-native analog of the reference's schema compile +
 * parse/validate pipeline: where piqi compiles `.piqi` → resolved typedefs →
 * per-format codecs that validate while parsing
 * (`piqilib/piqi.ml:1598-1819`, `piqilib/piqobj_of_json.ml`), we compile a
 * spec → one wide, codegen-friendly projection producing a per-row
 * `violations: array<struct<rule,path,detail>>` column. Every rule is a
 * built-in Spark function composition (when/filter/transform/zip_with) —
 * zero row-level UDFs, so the whole check runs inside whole-stage codegen.
 *
 * Instead of the reference's fail-fast located exception
 * (`piqobj_of_json.ml:192-197` raises on the first missing field), we
 * collect ALL violations per row — the distributed-validation semantics the
 * north rule requires (exact violation rows + per-partition pass/fail).
 */
object SpecCompiler {

  val violationType: ArrayType = ArrayType(StructType(Seq(
    StructField("rule", StringType),
    StructField("path", StringType),
    StructField("detail", StringType))), containsNull = false)

  /** One conditional violation: single-element array kept iff `cond`. */
  def vio(cond: Column, rule: String, path: String, detail: Column): Column =
    filter(
      array(struct(lit(rule).as("rule"), lit(path).as("path"),
        coalesce(detail.cast(StringType), lit("null")).as("detail"))),
      _ => cond)

  def emptyVio: Column = array().cast(violationType)

  /** Flattens a list of violation arrays into one. */
  def concatVios(vs: Seq[Column]): Column =
    if (vs.isEmpty) emptyVio else if (vs.size == 1) vs.head else concat(vs: _*)

  def compile(spec0: Spec): ValidationPlan = {
    val spec = spec0.resolved
    new ValidationPlan(spec)
  }
}

/**
 * Compiled validation plan. Immutable; closes over nothing but the spec, so
 * Catalyst serializes only expression trees to executors (the analog of
 * piqi broadcasting its resolved typedef table into the convert loop).
 */
final class ValidationPlan(val spec: Spec) extends Serializable {
  import SpecCompiler._

  /** Follow alias chains like `Piqobj.unalias` (`piqobj.ml:157-160`), accumulating constraints. */
  private def unalias(t: PiqiType, acc: Seq[Constraint] = Nil): (PiqiType, Seq[Constraint]) =
    t match {
      case TypeRef(n) => spec.defTable(n) match {
        case AliasDef(_, target, cs) => unalias(target, acc ++ cs)
        case _ => (t, acc)
      }
      case _ => (t, acc)
    }

  private def resolveDef(t: PiqiType): Option[TypeDef] = t match {
    case TypeRef(n) => Some(spec.defTable(n))
    case _ => None
  }

  /** Violations from value-level constraints; checks apply only when value non-null. */
  private def constraintVios(c: Column, path: String, cs: Seq[Constraint]): Seq[Column] =
    cs.map {
      case MatchesRegex(r) =>
        vio(c.isNotNull && !c.cast(StringType).rlike(r), s"format:$path", path, c)
      case Base64 =>
        vio(c.isNotNull && !c.cast(StringType).rlike("^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"),
          s"base64:$path", path, c)
      case ValidUtf8 =>
        // Spark 4 native UTF-8 validity check; codegen'd. Matters for
        // binary-ingested text (`piqilib/piqi_utf8.ml:33-120` analog).
        vio(c.isNotNull && !is_valid_utf8(c), s"utf8:$path", path, lit("invalid utf-8"))
      case InRange(lo, hi) =>
        vio(c.isNotNull && (c.cast(DoubleType) < lo || c.cast(DoubleType) > hi),
          s"range:$path", path, c)
      case OneOf(vals) =>
        vio(c.isNotNull && !c.isin(vals: _*), s"unknown-value:$path", path, c)
    }

  /**
   * Violations for a single value of type `t` at column `c` (non-null
   * handling is the caller's job for required/optional semantics; all
   * value checks here self-guard on non-null).
   */
  private def valueVios(t: PiqiType, c: Column, path: String): Seq[Column] = {
    val (base, aliasCs) = unalias(t)
    val aliasVios = constraintVios(c, path, aliasCs)
    val ownVios: Seq[Column] = base match {
      case PBool | PFloat | PString | PBinary | PAny => Nil
      case PInt(lo, hi) =>
        // range checks the reference documents but does not enforce
        // (doc/tools.md:490-493); we enforce (SURVEY.md B9).
        val needsCheck = lo != Long.MinValue || hi != Long.MaxValue
        if (needsCheck)
          Seq(vio(c.isNotNull && (c.cast(LongType) < lo || c.cast(LongType) > hi),
            s"range:$path", path, c))
        else Nil
      case TypeRef(_) =>
        resolveDef(base) match {
          case Some(EnumDef(_, options)) =>
            // unknown enum option → error (`piqobj_of_json.ml:270-284`)
            Seq(vio(c.isNotNull && !c.isin(options: _*), s"unknown-enum:$path", path, c))
          case Some(RecordDef(_, fields)) =>
            recordVios(fields, c, path, guard = c.isNotNull)
          case Some(VariantDef(_, options)) =>
            variantVios(options, c, path)
          case Some(ListDef(_, elem, elemCs)) =>
            listVios(elem, elemCs, c, path)
          case _ => Nil
        }
      case _ => Nil
    }
    aliasVios ++ ownVios
  }

  /** Record fields: required/optional/repeated semantics (SURVEY.md B1-B8). */
  private def recordVios(fields: Seq[PField], rec: Column, path: String, guard: Column): Seq[Column] = {
    fields.flatMap { f =>
      val c = rec.getField(f.name)
      val p = if (path.isEmpty) f.name else s"$path.${f.name}"
      val modeVios: Seq[Column] = f.mode match {
        case Required =>
          // exactly one instance must be present (`piqobj_of_json.ml:192-197`)
          Seq(vio(guard && c.isNull, s"missing-field:$p", p, lit("required field is missing")))
        case Optional(_) => Nil // JSON null ≡ missing (`piqobj_of_json.ml:214`): not a violation
        case Repeated => Nil   // absent repeated ≡ empty (`piqobj_of_json.ml:221-229`)
        case Flag => Nil       // desugared in Spec.resolved
      }
      val bodyVios = f.mode match {
        case Repeated =>
          // element-wise recursion; array col itself may be null (≡ empty)
          listVios(f.tpe, f.constraints, c, p)
        case _ => valueVios(f.tpe, c, p) ++ constraintVios(c, p, f.constraints)
      }
      modeVios ++ bodyVios
    }
  }

  /** Exactly one non-null option per variant value (`piqobj_of_json.ml:248-253`). */
  private def variantVios(options: Seq[POption], c: Column, path: String): Seq[Column] = {
    val nonNullCnt = options.map(o => c.getField(o.name).isNotNull.cast(IntegerType))
      .reduce(_ + _)
    val exactly = vio(c.isNotNull && nonNullCnt =!= 1, s"exactly-one:$path", path,
      concat_ws("|", options.map(o => when(c.getField(o.name).isNotNull, lit(o.name))): _*))
    val optionChecks = options.flatMap { o =>
      o.tpe.toSeq.flatMap(t => valueVios(t, c.getField(o.name), s"$path.${o.name}"))
    }
    exactly +: optionChecks
  }

  /** Element-wise list validation via `transform` + `flatten` — stays in codegen. */
  private def listVios(elem: PiqiType, elemCs: Seq[Constraint], arr: Column, path: String): Seq[Column] = {
    val perElem = transform(arr, (x, i) => {
      val evios = valueVios(elem, x, path) ++ constraintVios(x, path, elemCs)
      // stamp the element index into the detail for exact violation rows
      transform(concatVios(evios), v =>
        struct(v.getField("rule").as("rule"),
          concat(lit(path), lit("["), i.cast(StringType), lit("]")).as("path"),
          v.getField("detail").as("detail")))
    })
    Seq(when(arr.isNull, emptyVio).otherwise(flatten(perElem)))
  }

  /** Cross-field / ordering rules (north-rule additions, SURVEY.md §2.D). */
  private def rowRuleVios(r: RowRule): Seq[Column] = r match {
    case ExactlyOneOf(name, paths) => oneOfVios(name, paths, exact = true)
    case AtMostOneOf(name, paths) => oneOfVios(name, paths, exact = false)
    case StrictlyIncreasing(name, arrayPath, field) =>
      val arr = col(arrayPath)
      // pair each element with its successor; any non-increase is a violation
      val bad = zip_with(arr, slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
        (cur, nxt) => nxt.isNotNull && nxt.getField(field) <= cur.getField(field))
      Seq(vio(arr.isNotNull && exists(bad, b => b), s"order:$name", arrayPath,
        lit(s"$field must be strictly increasing")))
  }

  private def oneOfVios(name: String, paths: Seq[String], exact: Boolean): Seq[Column] = {
    // supported shapes: all top-level paths, or all inside one repeated field
    val arrayPrefixes = paths.map(_.split("\\.", 2)).collect {
      case Array(head, rest) if isRepeatedRoot(head) => (head, rest)
    }
    if (arrayPrefixes.size == paths.size && arrayPrefixes.map(_._1).distinct.size == 1) {
      val arrName = arrayPrefixes.head._1
      val subFields = arrayPrefixes.map(_._2)
      val arr = col(arrName)
      val perElem = transform(arr, (x, i) => {
        val cnt = subFields.map(f => x.getField(f).isNotNull.cast(IntegerType)).reduce(_ + _)
        val bad = if (exact) cnt =!= 1 else cnt > 1
        filter(array(struct(
          lit(s"exactly-one:$name").as("rule"),
          concat(lit(arrName), lit("["), i.cast(StringType), lit("]")).as("path"),
          concat_ws(",", subFields.map(f => when(x.getField(f).isNotNull, lit(f))): _*).as("detail"))),
          _ => bad)
      })
      Seq(when(arr.isNull, emptyVio).otherwise(flatten(perElem)))
    } else {
      val cols = paths.map(p => col(p))
      val cnt = cols.map(_.isNotNull.cast(IntegerType)).reduce(_ + _)
      val bad = if (exact) cnt =!= 1 else cnt > 1
      Seq(vio(bad, s"exactly-one:$name", paths.mkString("|"),
        concat_ws(",", paths.zip(cols).map { case (p, c) => when(c.isNotNull, lit(p)) }: _*)))
    }
  }

  private def isRepeatedRoot(fieldName: String): Boolean =
    rootRecord.fields.exists(f => f.name == fieldName && f.mode == Repeated)

  lazy val rootRecord: RecordDef = spec.defTable(spec.root) match {
    case r: RecordDef => r
    case other => throw new SpecException(s"root '${spec.root}' must be a record, got $other")
  }

  /** The per-row violations column: `array<struct<rule,path,detail>>`. */
  lazy val violations: Column = {
    val fieldVios = rootRecord.fields.flatMap { f =>
      val c = col(f.name)
      val modeVios: Seq[Column] = f.mode match {
        case Required =>
          Seq(vio(c.isNull, s"missing-field:${f.name}", f.name, lit("required field is missing")))
        case _ => Nil
      }
      val bodyVios = f.mode match {
        case Repeated => listVios(f.tpe, f.constraints, c, f.name)
        case _ => valueVios(f.tpe, c, f.name) ++ constraintVios(c, f.name, f.constraints)
      }
      modeVios ++ bodyVios
    }
    val ruleVios = spec.rowRules.flatMap(rowRuleVios)
    concatVios(fieldVios ++ ruleVios).as("violations")
  }

  lazy val valid: Column = (size(violations) === 0).as("valid")

  /**
   * Defaults materialization — an output-stage projection, exactly like the
   * reference (`C.resolve_defaults` set only for output, `src/convert.ml:316-324`).
   */
  def withDefaults(df: DataFrame): DataFrame = {
    val cols = rootRecord.fields.map { f =>
      f.mode match {
        case Optional(Some(d)) => coalesce(col(f.name), lit(d)).as(f.name)
        case Repeated => coalesce(col(f.name), array().cast(df.schema(f.name).dataType)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols: _*)
  }

  /** Debug dump — the analog of `piqi expand` (`src/expand.ml:55-77`). */
  def describe: String = {
    val sb = new StringBuilder
    sb.append(s"module ${spec.module} (root=${spec.root}, strict=${spec.strict})\n")
    spec.defs.foreach {
      case RecordDef(n, fs) =>
        sb.append(s"  record $n\n")
        fs.foreach(f => sb.append(s"    field ${f.name}: ${f.tpe} [${f.mode}] ${f.constraints.mkString(" ")}\n"))
      case VariantDef(n, os) => sb.append(s"  variant $n: ${os.map(_.name).mkString(" | ")}\n")
      case EnumDef(n, os) => sb.append(s"  enum $n: ${os.mkString(" | ")}\n")
      case ListDef(n, e, _) => sb.append(s"  list $n of $e\n")
      case AliasDef(n, t, cs) => sb.append(s"  alias $n = $t ${cs.mkString(" ")}\n")
    }
    spec.rowRules.foreach(r => sb.append(s"  rule $r\n"))
    sb.toString
  }
}
