package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling-hash fingerprint of a
  * string — `h = fold(codepoints, 0, (acc, cp) -> (acc*31 + cp) mod 1e9+7)`.
  *
  * This is the codegen'd form of the composed
  * `aggregate(split(text, ''), 0, (acc, c) -> (acc*31 + ascii(c)) % p)`
  * plan: higher-order functions run an interpreted lambda per element, so
  * the HOF form allocates one single-char UTF8String per character and
  * re-enters the interpreter millions of times per partition. Here the
  * whole fold is one fused Java loop over the string's code points — no
  * per-char allocation, stays inside whole-stage codegen.
  *
  * Semantics parity (spec'd bit-identical in ExtensionsSpec):
  * - Spark's `ascii(c)` returns `codePointAt(0)` of the first character, and
  *   `split(text, '')` yields one element per code point — so iterating
  *   `String.codePointAt` with `Character.charCount` steps matches exactly,
  *   including multi-byte (zh) text.
  * - DuckDB's `ascii(substring(text, i, 1))` is also the code point, so the
  *   q39 oracle SQL is unchanged.
  * - Empty string → 0 (the HOF form folds `[""]` with ascii('') = 0, which
  *   is `(0*31+0) mod p = 0` — same value).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_rolling_hash expects string, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      val i = ctx.freshName("i"); val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $a.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31 + $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  /** Column-level entry point for the native rolling hash. */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
  }
}
