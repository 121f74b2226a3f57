package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** EXACT Levenshtein distance via Ukkonen's band-doubling scheme —
  * O(min(m,n)·d) instead of the full-matrix O(m·n), where d is the true
  * distance. The dedup confirm stage (q70/q102) runs this over LSH
  * candidate pairs, which are near-duplicates by construction: their d is
  * small relative to their length, exactly the regime where the band wins
  * (an equal-length 1-edit pair costs one 3-wide band pass; the full DP
  * would touch every cell).
  *
  * Algorithm: run the classic DP restricted to the diagonal band of
  * offsets o = j−i with −(k−Δ)/2 ≤ o ≤ (k+Δ)/2 (Δ = |len diff| — any
  * cell outside that band provably lies on no path of cost ≤ k, since
  * reaching offset o and returning to offset Δ costs ≥ |o| + |Δ−o|).
  * If the banded result is ≤ k it is EXACT: the true optimum either stays
  * in the band (and is found) or leaves it (and then costs > k ≥ the
  * found value). Otherwise double k and repeat; the geometric sum keeps
  * total work O(min·d), and k is seeded at max(Δ, 1) — the length-
  * difference lower bound, so a pair of very different lengths starts at
  * a band that already reflects its unavoidable indel cost (the "cheap
  * |Δlen| prefilter" folded INTO the kernel instead of bolted on in
  * front: no result-changing threshold is needed to get the speedup, so
  * q70's DuckDB oracle — full exact levenshtein — is untouched).
  *
  * The value is ALWAYS the exact distance, bit-identical to
  * `functions.levenshtein` — property-pinned in EditDistanceSpec against
  * Spark's own kernel on random strings and on the live candidate pairs.
  */
object EditDistanceKernel {

  def distance(a: String, b: String): Long = {
    if (a == b) return 0L
    // CODE POINTS, not UTF-16 chars: functions.levenshtein (UTF8String)
    // counts code points, so a surrogate pair (emoji) is ONE edit unit —
    // the bit-identity contract would silently break on a charAt DP
    // (review finding, spec-pinned). Single-pass direct conversion, not
    // codePoints().toArray — the stream machinery measurably taxed the
    // confirm hot path.
    val ca = toCodePoints(a)
    val cb = toCodePoints(b)
    val (s, t) = if (ca.length <= cb.length) (ca, cb) else (cb, ca)
    val m = s.length
    val n = t.length
    if (m == 0) return n.toLong
    var k = math.max(n - m, 1)
    var d = banded(s, t, k)
    while (d > k) {
      k = math.min(math.max(2 * k, k + 1), n) // n = the maximum possible distance
      d = banded(s, t, k)
    }
    d.toLong
  }

  private def toCodePoints(x: String): Array[Int] = {
    val n = x.length
    val out = new Array[Int](n)
    var i = 0
    var k = 0
    while (i < n) {
      val cp = x.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    if (k == n) out else java.util.Arrays.copyOf(out, k)
  }

  /** Banded DP, band half-widths derived from k (requires k ≥ n−m, which
    * the caller's seed guarantees). Returns the exact distance when the
    * result is ≤ k; any returned value > k only means "more than k". */
  private def banded(s: Array[Int], t: Array[Int], k: Int): Int = {
    val m = s.length
    val n = t.length
    val delta = n - m
    val loOff = -((k - delta) / 2) // ≤ 0
    val hiOff = (k + delta) / 2 // ≥ delta
    val width = hiOff - loOff + 1
    val Inf = Int.MaxValue / 2
    var prev = new Array[Int](width)
    var cur = new Array[Int](width)
    var idx = 0
    while (idx < width) { // row i = 0: cell (0, j) costs j
      val j = loOff + idx
      prev(idx) = if (j >= 0 && j <= n) j else Inf
      idx += 1
    }
    var i = 1
    while (i <= m) {
      idx = 0
      while (idx < width) {
        val j = i + loOff + idx
        cur(idx) =
          if (j < 0 || j > n) Inf
          else if (j == 0) i
          else {
            // prev(idx) = (i−1, j−1); prev(idx+1) = (i−1, j); cur(idx−1) = (i, j−1)
            val sub = prev(idx) + (if (s(i - 1) == t(j - 1)) 0 else 1)
            val del = if (idx + 1 < width) prev(idx + 1) + 1 else Inf
            val ins = if (idx > 0) cur(idx - 1) + 1 else Inf
            math.min(sub, math.min(del, ins))
          }
        idx += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(delta - loOff) // cell (m, n) sits at offset Δ
  }

  /** UTF8String entry used by both eval and generated code. Byte-equal
    * inputs short-circuit BEFORE any String materialization — identical
    * texts are the single most common pair in the dedup-confirm workload
    * this kernel serves, and the binary compare avoids two allocations
    * plus a full decode for them. */
  def distance(a: UTF8String, b: UTF8String): Long =
    if (a.equals(b)) 0L else distance(a.toString, b.toString)
}

object EditDistance {
  /** DataFrame-API entry: `EditDistance.editDistance(col("a"), col("b"))`. */
  def editDistance(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(EditDistance(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}

/** `graft_edit_distance(a, b)` — native expression (codegen'd via a static
  * kernel call, so it inlines into whole-stage codegen with no Scala-UDF
  * serialization or Row boxing). NULL if either side is NULL. Returns
  * BIGINT (the confirm stage's output type — no post-hoc cast).
  */
case class EditDistance(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_edit_distance expects (string, string), got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EditDistanceKernel.distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.EditDistanceKernel.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditDistance =
    copy(left = newLeft, right = newRight)
}
