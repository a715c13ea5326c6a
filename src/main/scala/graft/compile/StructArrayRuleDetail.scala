package graft.compile

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * One compiled detail rule: the [[ArrayRule]] plus the precomputed strings
 * the violation struct needs. Element paths render as
 * `pathPrefix + i + pathSuffix` (e.g. "spans[" + 3 + "].kind").
 */
final case class DetailRule(rule: ArrayRule, ruleId: String,
    pathPrefix: String, pathSuffix: String, constantDetail: String = "")
    extends Serializable

/**
 * Native codegen'd violation DETAIL builder for a struct-array column: the
 * `array<struct<rule,path,detail>>` twin of [[StructArrayRuleCount]]. The
 * generic Column form builds this array through interpreted HOFs
 * (transform-of-transform + flatten + string concat per element per rule);
 * this expression runs the same single rule-program pass as the counter and
 * only allocates strings/structs when a rule actually FIRES — on real
 * corpora violations are rare, so the happy path costs what counting costs.
 *
 * Violation-struct semantics match the generic DetailEmitter's per rule
 * (same ruleId / stamped path / detail text); the ORDER of entries may
 * differ from the generic concat order (absorbed row rules emit inline per
 * element, not appended at the end), so equivalence is as multisets —
 * exactly what violationRows / the driver's sorted compare consume.
 */
case class StructArrayRuleDetail(child: Expression, rules: Seq[DetailRule])
    extends UnaryExpression {

  override def dataType: DataType = SpecCompiler.violationType
  override def nullable: Boolean = false

  private lazy val structType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private def ord(f: String): Int = structType.fieldIndex(f)
  private def isLongField(f: String): Boolean = structType(ord(f)).dataType match {
    case LongType => true
    case IntegerType | ShortType | ByteType => false
    case StringType => false
    case other => throw new IllegalArgumentException(s"field $f: unsupported type $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StructType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"StructArrayRuleDetail requires array<struct>, got $other")
    }

  /** Interned constant strings per rule: (ruleId, pathPrefix, pathSuffix, detail). */
  private lazy val consts: Array[Array[UTF8String]] = rules.map { d =>
    Array(UTF8String.fromString(d.ruleId), UTF8String.fromString(d.pathPrefix),
      UTF8String.fromString(d.pathSuffix), UTF8String.fromString(d.constantDetail))
  }.toArray

  private lazy val setRefs: Map[String, java.util.HashSet[UTF8String]] =
    rules.collect { case DetailRule(RuleInSet(f, vs), _, _, _, _) =>
      val s = new java.util.HashSet[UTF8String]()
      vs.foreach(v => s.add(UTF8String.fromString(v)))
      f -> s
    }.toMap

  /** Option-name strings for each RuleExactlyOne, in field order. */
  private lazy val oneOfNames: Map[Int, Array[UTF8String]] =
    rules.zipWithIndex.collect { case (DetailRule(RuleExactlyOne(fs), _, _, _, _), k) =>
      k -> fs.map(UTF8String.fromString).toArray
    }.toMap

  // ---- per-element loop state, hoisted out of evalArray (the production
  // path runs this per array element per row; building zipWithIndex seqs
  // or fieldIndex lookups there would dominate the happy path) ----
  private lazy val rulesArr: Array[DetailRule] = rules.toArray
  /** Primary field ordinal per rule (-1 for RuleExactlyOne, which has many). */
  private lazy val ruleOrd: Array[Int] = rulesArr.map(_.rule match {
    case RuleNotNull(f) => ord(f)
    case RuleInSet(f, _) => ord(f)
    case RuleRange(f, _, _) => ord(f)
    case RuleRangeDecimal(f, _, _) => ord(f)
    case RuleIncreasing(f) => ord(f)
    case _: RuleExactlyOne => -1
  })
  /** Physical binding per decimal-range rule; null otherwise. */
  private lazy val decInfo: Array[DecimalRuleBinding.Binding] =
    rulesArr.map(_.rule match {
      case RuleRangeDecimal(f, lo, hi) =>
        DecimalRuleBinding.bind(structType(ord(f)).dataType, f, lo, hi)
      case _ => null
    })
  private lazy val ruleIsLong: Array[Boolean] = rulesArr.map(_.rule match {
    case RuleRange(f, _, _) => isLongField(f)
    case RuleIncreasing(f) => isLongField(f)
    // only consulted when the decimal rule bound to an integral field
    case RuleRangeDecimal(f, _, _) if !structType(ord(f)).dataType.isInstanceOf[DecimalType] =>
      isLongField(f)
    case _ => false
  })
  private lazy val oneOfOrds: Array[Array[Int]] = rulesArr.map(_.rule match {
    case RuleExactlyOne(fs) => fs.map(ord).toArray
    case _ => null
  })
  private lazy val inSetRefs: Array[java.util.HashSet[UTF8String]] =
    rulesArr.map(_.rule match { case RuleInSet(f, _) => setRefs(f); case _ => null })
  /** Rule indices of the RuleIncreasing rules (chain state tracked per element). */
  private lazy val incIdx: Array[Int] =
    rulesArr.zipWithIndex.collect { case (DetailRule(_: RuleIncreasing, _, _, _, _), k) => k }
  /** Rule indices of the RuleExactlyOne rules (fire on null elements too). */
  private lazy val exactlyOneIdx: Array[Int] =
    rulesArr.zipWithIndex.collect { case (DetailRule(_: RuleExactlyOne, _, _, _, _), k) => k }

  private val comma = UTF8String.fromString(",")

  private def path(k: Int, i: Int): UTF8String =
    UTF8String.concat(consts(k)(1), UTF8String.fromString(String.valueOf(i)), consts(k)(2))

  private def vioRow(k: Int, p: UTF8String, detail: UTF8String): InternalRow =
    new GenericInternalRow(Array[Any](consts(k)(0), p, detail))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) StructArrayRuleDetail.emptyResult
    else evalArray(v.asInstanceOf[ArrayData])
  }

  /** Entry point for generated code: evaluate from the already-computed child value. */
  def evalFromChildValue(childValue: Any): Any =
    if (childValue == null) StructArrayRuleDetail.emptyResult
    else evalArray(childValue.asInstanceOf[ArrayData])

  private def evalArray(arr: ArrayData): Any = {
    val nFields = structType.length
    var out: java.util.ArrayList[InternalRow] = null
    def add(r: InternalRow): Unit = {
      if (out == null) out = new java.util.ArrayList[InternalRow](4)
      out.add(r)
    }
    val nRules = rulesArr.length
    val nInc = incIdx.length
    val incViolated = new Array[Boolean](nInc)
    val incPrev = new Array[Long](nInc)
    val incPrevSet = new Array[Boolean](nInc)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) {
        var e1 = 0
        while (e1 < exactlyOneIdx.length) { // 0 of N set
          add(vioRow(exactlyOneIdx(e1), path(exactlyOneIdx(e1), i), UTF8String.EMPTY_UTF8))
          e1 += 1
        }
        var q = 0
        while (q < nInc) { incPrevSet(q) = false; q += 1 } // chain break
      } else {
        val s = arr.getStruct(i, nFields)
        var k = 0
        while (k < nRules) {
          rulesArr(k).rule match {
            case RuleNotNull(_) =>
              if (s.isNullAt(ruleOrd(k))) add(vioRow(k, path(k, i), consts(k)(3)))
            case RuleInSet(_, _) =>
              val o = ruleOrd(k)
              if (!s.isNullAt(o)) {
                val value = s.getUTF8String(o)
                if (!inSetRefs(k).contains(value)) add(vioRow(k, path(k, i), value.clone()))
              }
            case RuleRange(_, lo, hi) =>
              val o = ruleOrd(k)
              if (!s.isNullAt(o)) {
                val x = if (ruleIsLong(k)) s.getLong(o) else s.getInt(o).toLong
                if (x < lo || x > hi)
                  add(vioRow(k, path(k, i), UTF8String.fromString(String.valueOf(x))))
              }
            case RuleRangeDecimal(_, _, _) =>
              val o = ruleOrd(k)
              if (!s.isNullAt(o)) decInfo(k) match {
                case DecimalRuleBinding.AsDecimal(p, sc, lo, hi) =>
                  val d = s.getDecimal(o, p, sc)
                  // detail text = decimal→string cast, same as the generic form
                  if (d.compare(lo) < 0 || d.compare(hi) > 0)
                    add(vioRow(k, path(k, i), UTF8String.fromString(d.toString)))
                case DecimalRuleBinding.AsLong(lo, hi) =>
                  val x = if (ruleIsLong(k)) s.getLong(o) else s.getInt(o).toLong
                  if (x < lo || x > hi)
                    add(vioRow(k, path(k, i), UTF8String.fromString(String.valueOf(x))))
              }
            case RuleExactlyOne(_) =>
              val ords = oneOfOrds(k)
              var nn = 0
              var j = 0
              while (j < ords.length) { if (!s.isNullAt(ords(j))) nn += 1; j += 1 }
              if (nn != 1) {
                val names = oneOfNames(k)
                var detail: UTF8String = null
                j = 0
                while (j < ords.length) {
                  if (!s.isNullAt(ords(j))) {
                    detail = if (detail == null) names(j)
                      else UTF8String.concat(detail, comma, names(j))
                  }
                  j += 1
                }
                add(vioRow(k, path(k, i),
                  if (detail == null) UTF8String.EMPTY_UTF8 else detail))
              }
            case _: RuleIncreasing => ()
          }
          k += 1
        }
        var qi = 0
        while (qi < nInc) {
          val k2 = incIdx(qi)
          val o = ruleOrd(k2)
          if (!s.isNullAt(o)) {
            val x = if (ruleIsLong(k2)) s.getLong(o) else s.getInt(o).toLong
            if (incPrevSet(qi) && x <= incPrev(qi)) incViolated(qi) = true
            incPrev(qi) = x
            incPrevSet(qi) = true
          } else incPrevSet(qi) = false
          qi += 1
        }
      }
      i += 1
    }
    var qi = 0
    while (qi < nInc) {
      if (incViolated(qi)) {
        val k = incIdx(qi)
        add(vioRow(k, consts(k)(1), consts(k)(3))) // path = array name, once per row
      }
      qi += 1
    }
    if (out == null) StructArrayRuleDetail.emptyResult
    else new GenericArrayData(out.toArray)
  }

  // Codegen delegates to eval through a reference object: the work here is
  // branchy object construction (strings, structs, growable buffer), which
  // gains nothing from inlined Java but costs compile size; keeping the
  // expression non-CodegenFallback via this stub keeps the SURROUNDING
  // projection inside whole-stage codegen (a CodegenFallback would break the
  // whole stage out of codegen).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ruleDetail", this,
      classOf[StructArrayRuleDetail].getName)
    val childGen = child.genCode(ctx)
    val code =
      s"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalFromChildValue(
         |    ${childGen.isNull} ? null : ${childGen.value});
       """.stripMargin
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
      .BlockHelper(new StringContext(code)).code(),
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): StructArrayRuleDetail =
    copy(child = newChild)
}

object StructArrayRuleDetail {
  /** Shared empty result — the overwhelmingly common case. */
  val emptyResult: GenericArrayData = new GenericArrayData(new Array[Any](0))

  def column(arr: org.apache.spark.sql.Column, rules: Seq[DetailRule]): org.apache.spark.sql.Column =
    GraftBridge.column(StructArrayRuleDetail(GraftBridge.expression(arr), rules))
}
