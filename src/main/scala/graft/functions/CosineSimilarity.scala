package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two numeric arrays.
  *
  * Whole-stage-codegen'd single pass over both arrays (dot + both norms in
  * one loop, no intermediate array allocation) — the hot-path form of
  * [[VectorOps.cosine]]. Semantics match the zip_with/aggregate fold
  * EXACTLY, including the degenerate inputs: unequal lengths or a null
  * element yield SQL NULL (zip_with pads with null → the fold goes null),
  * and a zero-norm or empty input behaves like the composed form's
  * `Divide` by a zero divisor — an ArithmeticException under ANSI mode
  * (the Spark 4 default), SQL NULL under non-ANSI — never the raw
  * kernel's NaN. `failOnError` is resolved from `SQLConf` at analysis
  * time exactly as `Divide.evalMode` is, so
  * [[graft.plans.CosineFusion]]'s global rewrite is semantics-preserving
  * in both modes, not just fast on well-formed vectors. Accumulation order
  * matches the fold (and DuckDB's list_inner_product), so results are
  * bit-identical to the composed version.
  */
case class CosineSimilarity(left: Expression, right: Expression,
    failOnError: Boolean = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects array<float>/array<double>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val (fa, fb) = (isFloat(left), isFloat(right))
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // divisor 0 (empty or zero-norm input): mirror Divide — ANSI throws,
    // non-ANSI yields SQL NULL. (sqrt(na)*sqrt(nb) == 0 iff na or nb is 0:
    // sqrt maps the smallest denormal to ~2.2e-162, whose square rounds
    // back to a nonzero denormal, so the product never underflows to 0.)
    if (na == 0.0 || nb == 0.0) {
      if (failOnError) throw CosineSimilarity.divideByZeroError() else null
    } else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val accA = if (isFloat(left)) "getFloat" else "getDouble"
    val accB = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double x = (double) $a.$accA($i);
         |    double y = (double) $b.$accB($i);
         |    $dot += x * y; $na += x * x; $nb += y * y;
         |  }
         |  if (!${ev.isNull}) {
         |    if ($na == 0.0 || $nb == 0.0) {
         |      ${if (failOnError) "throw graft.functions.CosineSimilarity.divideByZeroError();"
                 else s"${ev.isNull} = true;"}
         |    } else {
         |      ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |    }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  // SparkArithmeticException is `private[spark]` in its Scala signature
  // (public only in bytecode), so scalac refuses even to NAME it —
  // construct it reflectively, exactly the access javac would have
  // (error-path only, cost irrelevant). 4-arg ctor:
  // (errorClass, messageParameters, queryContexts, summary)
  private lazy val sparkArithmeticCtor =
    Class.forName("org.apache.spark.SparkArithmeticException")
      .getConstructors.find(_.getParameterCount == 4).get

  /** The ANSI-mode zero-divisor error: a real `SparkArithmeticException`
    * with the same DIVIDE_BY_ZERO error class Divide raises (the message
    * renders from Spark's own error-conditions registry, so the text
    * can't drift), minus the per-expression query context
    * `QueryExecutionErrors.divideByZeroError` would attach — that helper
    * is `private[sql]`. `SparkThrowable`-based handlers (including
    * PySpark's error translation) match the fused and the composed
    * plan's error identically. If a future Spark reshapes the ctor, the
    * fallback keeps the CLASS of the failure (ArithmeticException) and
    * its message shape rather than masking it with a reflection error.
    */
  def divideByZeroError(): ArithmeticException =
    try {
      sparkArithmeticCtor.newInstance(
        "DIVIDE_BY_ZERO",
        Map("config" -> "\"spark.sql.ansi.enabled\""),
        java.lang.reflect.Array.newInstance(
          Class.forName("org.apache.spark.QueryContext"), 0),
        "").asInstanceOf[ArithmeticException]
    } catch {
      // NoSuchElementException: the lazy ctor lookup's .get, first deref
      case _: ReflectiveOperationException | _: IllegalArgumentException
           | _: NoSuchElementException =>
        new ArithmeticException(
          "[DIVIDE_BY_ZERO] Division by zero. Use `try_divide` to tolerate " +
            "divisor being 0 and return NULL instead. If necessary set " +
            "\"spark.sql.ansi.enabled\" to \"false\" to bypass this error. " +
            "SQLSTATE: 22012")
    }
}
