package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the embedding hot path.
 *
 * The higher-order-function formulation
 * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) evaluates through interpreted
 * lambda dispatch — Spark's higher-order functions are CodegenFallback.
 * For ANN / near-dup jobs the dot product runs once per (doc × query) pair,
 * so this is THE inner loop at 100 TB; a custom `Expression` with
 * `doGenCode` emits a tight primitive Java loop instead (preference order
 * (b) of the build mandate: native expression > UDF).
 *
 * Semantics match [[Vectors.dot]]: null element or length mismatch → the
 * shorter prefix, null array → null result (nullSafe).
 */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case other => throw new IllegalArgumentException(
        s"VectorDot requires array<float|double>, got array<$other>")
    }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"VectorDot requires array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (af, bf) = (elemIsFloat(left), elemIsFloat(right))
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
        sum += x * y
      }
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Codegen'd dot product over `array<float|double>` columns. */
  def dotNative(a: Column, b: Column): Column =
    GraftBridge.column(VectorDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Codegen'd cosine: dot / (|a| |b|), zero-norm → 0.0. */
  def cosineNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    val d = dotNative(a, b)
    val n = sqrt(dotNative(a, a)) * sqrt(dotNative(b, b))
    when(n === 0, lit(0.0)).otherwise(d / n)
  }
}
