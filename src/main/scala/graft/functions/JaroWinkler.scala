package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity kernel, EXACT in basis points.
  *
  * The Jaro similarity is a rational number: with string lengths l1, l2,
  * m matched characters and ht half-transpositions (positions where the
  * two matched sequences disagree),
  *
  *   jaro = (m/l1 + m/l2 + (2m − ht)/(2m)) / 3
  *        = (2·m²·l2 + 2·m²·l1 + l1·l2·(2m − ht)) / (6·m·l1·l2)
  *
  * and the Winkler prefix boost (common prefix p ≤ 4, applied when
  * jaro > 0.7 — Winkler 1990's boost-threshold form) keeps it rational:
  *
  *   jw = jaro·(10 − p)/10 + p/10 = (N·(10 − p) + p·D) / (10·D).
  *
  * So `jwBp` floors 10000·jw from pure int64 arithmetic — no doubles
  * anywhere, which makes the score portable across engines and replay-
  * stable (the property every dedup/linkage key in this repo maintains).
  * Inputs are capped at 10k chars (int64 headroom: N ≤ 6·m²·max(l) ≤
  * 6e12, ×10⁵ for the bp scale < 2⁶³); linkage keys are names, not
  * documents.
  */
object JaroWinklerKernel {
  final val MaxLen = 10000

  /** Jaro–Winkler similarity in basis points (0..10000), exact. Only TRUE
    * equality scores 10000: a truncated comparison (either input over
    * [[MaxLen]]) whose truncated views coincide caps at 9999, so the
    * score never claims identity it didn't verify (q143 filters
    * `jw_bp < 10000` to mean "near, not identical").
    */
  def jwBp(a: String, b: String): Long = {
    if (a == b) return 10000L
    val truncated = a.length > MaxLen || b.length > MaxLen
    val l1 = math.min(a.length, MaxLen)
    val l2 = math.min(b.length, MaxLen)
    if (l1 == 0 || l2 == 0) return 0L
    // matching window: chars match if equal and within floor(max/2)−1
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val aMatch = new Array[Boolean](l1)
    val bMatch = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    // half-transpositions: walk both matched subsequences in order
    var ht = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) ht += 1
        j += 1
      }
      i += 1
    }
    val mL = m.toLong; val l1L = l1.toLong; val l2L = l2.toLong
    val num = 2L * mL * mL * l2L + 2L * mL * mL * l1L +
      l1L * l2L * (2L * mL - ht)
    val den = 6L * mL * l1L * l2L
    // common prefix (≤ 4); boost only above the 0.7 jaro threshold
    var p = 0
    while (p < 4 && p < l1 && p < l2 && a.charAt(p) == b.charAt(p)) p += 1
    val boosted =
      if (p > 0 && num * 10L > den * 7L) (num * (10L - p) + p * den, den * 10L)
      else (num, den)
    val bp = 10000L * boosted._1 / boosted._2
    if (truncated) math.min(bp, 9999L) else bp
  }

  /** UTF8String entry used by both eval and generated code. */
  def jwBp(a: UTF8String, b: UTF8String): Long = jwBp(a.toString, b.toString)
}

object JaroWinkler {
  /** DataFrame-API entry: `JaroWinkler.jaroWinklerBp(col("a"), col("b"))`. */
  def jaroWinklerBp(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(JaroWinkler(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}

/** `graft_jaro_winkler(a, b)` — native expression (codegen'd via a static
  * kernel call, so it inlines into whole-stage codegen with no Scala-UDF
  * serialization or Row boxing on the hot path). NULL if either side is
  * NULL, standard binary-expression semantics.
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler expects (string, string), got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.jwBp(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerKernel.jwBp($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
