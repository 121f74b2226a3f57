package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: product-quantization encoder — the m
  * nearest-codeword ids of a (normalized) vector against a driver-held
  * codebook, in ONE fused codegen loop.
  *
  * This is the hot-path form of the composed fold in
  * `Similarity.pqCodeCol`: higher-order functions (`aggregate`/`zip_with`)
  * have no codegen and evaluate interpreted, so the m·k codeword scores
  * cost ~m·k·subDim `Expression.eval` calls PER ROW (measured: 2–3 s per
  * Lloyd pass over just 2000 rows). Here the codebook rides along as a
  * flat `double[]` reference object and the scan is three primitive loops
  * — the per-row cost a 100 TB corpus encode actually needs.
  *
  * Semantics are bit-identical to the fold: score = 2·(x·c) − ‖c‖², dot
  * accumulated left-to-right, ‖c‖² pre-folded driver-side in the same
  * order, ties broken toward the smaller code id (strict `>`). Inputs
  * whose length differs from m·subDim, or with a null element, yield SQL
  * NULL (the composed form's slice/zip_with null-padding collapses to a
  * degenerate all-zero-code row instead — the native form's NULL is the
  * contract we document and spec).
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = books.length
  private val k = books(0).length
  private val subDim = books(0)(0).length

  // flat [j*k*subDim + c*subDim + p] codeword components + pre-folded ‖c‖²
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * k * subDim)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        System.arraycopy(books(j)(c), 0, a, (j * k + c) * subDim, subDim)
        c += 1
      }
      j += 1
    }
    a
  }
  @transient private lazy val c2: Array[Double] =
    books.flatMap(_.map(_.map(x => x * x).sum))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pq_encode expects array<float>/array<double>, got ${t.sql}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != m * subDim) return null
    val x = new Array[Double](m * subDim)
    var i = 0
    while (i < m * subDim) {
      if (a.isNullAt(i)) return null
      x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.NegativeInfinity
      var bc = 0
      var c = 0
      while (c < k) {
        var dot = 0.0
        val base = (j * k + c) * subDim
        var p = 0
        while (p < subDim) { dot += x(j * subDim + p) * flat(base + p); p += 1 }
        val score = dot * 2.0 - c2(j * k + c)
        if (score > best) { best = score; bc = c }
        c += 1
      }
      codes(j) = bc
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acc = if (isFloat) "getFloat" else "getDouble"
    val flatRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
    val c2Ref = ctx.addReferenceObj("pqC2", c2, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val x = ctx.freshName("x"); val codes = ctx.freshName("codes")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val p = ctx.freshName("p")
      val best = ctx.freshName("best"); val bc = ctx.freshName("bc")
      val dot = ctx.freshName("dot"); val base = ctx.freshName("base")
      val score = ctx.freshName("score")
      s"""
         |if ($a.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $x = new double[${m * subDim}];
         |  for (int $i = 0; $i < ${m * subDim}; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $x[$i] = (double) $a.$acc($i);
         |  }
         |  if (!${ev.isNull}) {
         |    int[] $codes = new int[$m];
         |    for (int $j = 0; $j < $m; $j++) {
         |      double $best = Double.NEGATIVE_INFINITY; int $bc = 0;
         |      for (int $c = 0; $c < $k; $c++) {
         |        double $dot = 0.0;
         |        int $base = ($j * $k + $c) * $subDim;
         |        for (int $p = 0; $p < $subDim; $p++) {
         |          $dot += $x[$j * $subDim + $p] * $flatRef[$base + $p];
         |        }
         |        double $score = $dot * 2.0 - $c2Ref[$j * $k + $c];
         |        if ($score > $best) { $best = $score; $bc = $c; }
         |      }
         |      $codes[$j] = $bc;
         |    }
         |    ${ev.value} =
         |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
