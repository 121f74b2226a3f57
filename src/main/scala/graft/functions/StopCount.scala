package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: how many elements of a token array are in a
  * fixed word list — the codegen'd form of the stoplist idiom
  * `size(filter(w, x -> x IN ('the','a',...)))` behind q36's five per-doc
  * language scores, q37/q65's stopword gates and q219's quality bands.
  * The HOF form interprets its lambda once per TOKEN (five times per
  * token in q36); here the count is one fused loop per document against
  * a prebuilt hash set shipped via a codegen object reference.
  *
  * IntegerType on purpose: the idiom it replaces is `size(...)` (INT), so
  * swapped plans keep their schemas bit-identical. `IN` semantics match:
  * a NULL element never matches (token arrays from `split` carry no
  * nulls, but the contract holds regardless). Spec'd bit-identical in
  * ExtensionsSpec against the HOF form on the real corpus.
  */
case class StopCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_stop_count expects array<string>, got ${other.sql}")
    }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val v = arr.getUTF8String(i)
      if (v != null && set.contains(v)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopWords", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val c = ctx.freshName("c")
      val v = ctx.freshName("v")
      s"""
         |int $c = 0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $v = $a.getUTF8String($i);
         |  if ($v != null && $setRef.contains($v)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StopCount {
  /** Column-level entry point for the native stoplist counter. */
  def apply(c: Column, words: Seq[String]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(StopCount(ColumnBridge.expression(c), words))
  }
}
