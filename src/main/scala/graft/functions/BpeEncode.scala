package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The driver-held BPE merge table, shipped to executors inside the
  * [[BpeEncode]] expression (the k-means/PQ codebook pattern:
  * `addReferenceObj` in codegen, plain field in eval).
  *
  * Semantics are EXACTLY the chained [[graft.operators.TextAnalysis]]
  * `bpeMergeFold` in rank order — one greedy left-to-right
  * non-overlapping pass per merge rank, the merged symbol entering the
  * accumulator whole — but computed with plan depth O(1) in the merge
  * count: instead of materializing one fold per rank (which is plan
  * depth, analysis time and codegen size LINEAR in merges — fatal at a
  * production 50k-merge vocabulary), the kernel repeatedly finds the
  * smallest rank above the last applied one among the pairs actually
  * present in the word and jumps straight to that pass. Ranks the word
  * never exhibits cost one hash probe during the scan, not a plan node.
  *
  * Equivalence to the sequential fold: between passes the symbol array
  * is unchanged, so the minimum applicable rank > floor is precisely the
  * next fold that would fire; folds that don't fire are identities. A
  * pass of (l, r) can also never create a NEW (l, r) adjacency the same
  * pass should have consumed (the merged symbol l+r ≠ l since r is
  * nonempty), so one left-to-right pass per firing rank is exhaustive —
  * the same argument the fold's accumulator form relies on.
  *
  * Duplicate pairs at several ranks (legal in a hand-built table) keep
  * per-pair SORTED rank arrays, so a pair can fire again at its later
  * rank exactly as the chained fold would.
  *
  * Symbol contract: code-point segmentation, matching `split(word, '')`
  * (BMP parity with the spec's UTF-16 reference — the q118 docstring's
  * stated precondition).
  */
final class BpeModel(val merges: Array[(String, String)]) extends Serializable {

  /** Unambiguous pair key: length-prefixed left symbol + right symbol
    * (plain concat would collide ("ab","c") with ("a","bc")). */
  private def key(l: String, r: String): String = s"${l.length}:$l$r"

  @transient private lazy val ranks: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      val k = key(merges(i)._1, merges(i)._2)
      val prev = m.get(k)
      m.put(k, if (prev == null) Array(i + 1) else prev :+ (i + 1))
      i += 1
    }
    m // per-key arrays are ascending by construction (i increases)
  }

  /** Smallest rank of pair (l, r) strictly above `floor`; MaxValue if none. */
  private def firstRankAbove(l: String, r: String, floor: Int): Int = {
    val arr = ranks.get(key(l, r))
    if (arr == null) Int.MaxValue
    else {
      var lo = 0
      var hi = arr.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid) <= floor) lo = mid + 1 else hi = mid
      }
      if (lo < arr.length) arr(lo) else Int.MaxValue
    }
  }

  /** Tokenize one word. Shared by eval and generated code. */
  def encode(word: UTF8String): ArrayData = {
    val s = word.toString
    // code-point segmentation (split(word, '') parity: astral chars whole)
    var syms = new Array[String](s.codePointCount(0, s.length))
    var i = 0
    var len = 0
    while (i < s.length) {
      val cc = Character.charCount(s.codePointAt(i))
      syms(len) = s.substring(i, i + cc)
      len += 1
      i += cc
    }
    if (len > 1) {
      var floor = 0
      var done = false
      while (!done) {
        // the next fold that fires = min applicable rank above the last
        var minRank = Int.MaxValue
        var k = 0
        while (k < len - 1) {
          val r = firstRankAbove(syms(k), syms(k + 1), floor)
          if (r < minRank) minRank = r
          k += 1
        }
        if (minRank == Int.MaxValue) done = true
        else {
          val (l, r) = merges(minRank - 1)
          // one greedy left-to-right non-overlapping pass, in place
          var w = 0
          var p = 0
          while (p < len) {
            if (p < len - 1 && syms(p) == l && syms(p + 1) == r) {
              syms(w) = l + r; p += 2
            } else {
              syms(w) = syms(p); p += 1
            }
            w += 1
          }
          len = w
          floor = minRank
        }
      }
    }
    val out = new Array[AnyRef](len)
    var t = 0
    while (t < len) { out(t) = UTF8String.fromString(syms(t)); t += 1 }
    new GenericArrayData(out)
  }
}

object BpeEncode {
  /** DataFrame-API entry: `BpeEncode.encode(col("word"), merges)` — the
    * learned merge list comes from `TextAnalysis.bpeMerges` (a driver-held
    * model, like the k-means centroids). */
  def encode(c: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(c), merges))
  }
}

/** `graft_bpe_encode(word)` — native expression applying a BPE merge
  * table in rank order (see [[BpeModel]] for the exact semantics and the
  * flat-plan-depth argument). Codegen'd via an `addReferenceObj` model
  * call, so it inlines into whole-stage codegen with no UDF boxing; the
  * vocabulary-dictionary projection it runs in is vocab-bounded, never
  * corpus-hot.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val model = new BpeModel(merges.toArray)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_encode expects string, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    model.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model, "graft.functions.BpeModel")
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
