package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: L2-normalize a numeric array (x / ‖x‖₂).
  *
  * The hot-path form of the composed
  * `when(l2 > 0, transform(v, x => x/l2)).otherwise(transform(v, cast))`:
  * inlining `l2` (a zip_with/aggregate fold) into the transform lambda
  * makes the INTERPRETED evaluator re-fold the full dot product per
  * ELEMENT — dim² multiply-adds per row (measured ~1 s per 2000×64 pass).
  * Here it's two primitive loops per row.
  *
  * Semantics are bit-identical to the composed form on every input class:
  * positive norm → each element cast to double and divided by the same
  * left-to-right-accumulated sqrt; zero norm (incl. empty array) → the
  * cast-only array; any null element → the cast-only array WITH its nulls
  * (the composed fold's null dot fails the `when` guard into the cast
  * branch — preserved, not "improved", so spec equivalence is exact).
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_l2_normalize expects array<float>/array<double>, got ${t.sql}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    L2Normalize.kernel(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = isFloat
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.L2Normalize$$.MODULE$$.kernel($a, $f);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object L2Normalize {
  /** Shared interpreted/codegen kernel (one implementation, called per
    * row from generated code — the loops inside are plain JVM bytecode).
    */
  def kernel(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    var i = 0
    var hasNull = false
    while (i < n && !hasNull) { hasNull = a.isNullAt(i); i += 1 }
    if (hasNull) {
      // composed-form fallback: cast-only, nulls preserved
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) =
          if (a.isNullAt(i)) null
          else if (isFloat) a.getFloat(i).toDouble
          else a.getDouble(i)
        i += 1
      }
      return new GenericArrayData(out)
    }
    val x = new Array[Double](n)
    var dot = 0.0
    i = 0
    while (i < n) {
      x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      dot += x(i) * x(i)
      i += 1
    }
    val l2 = math.sqrt(dot)
    if (l2 > 0) {
      i = 0
      while (i < n) { x(i) = x(i) / l2; i += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(x)
  }
}
