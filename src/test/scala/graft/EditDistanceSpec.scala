package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.EditDistanceKernel

/** The banded-exact Levenshtein kernel: bit-equality with the classic
  * full-matrix distance everywhere — the band is a cost optimization, not
  * an approximation (q70's DuckDB oracle computes full levenshtein, so
  * any divergence is a correctness failure, not a tolerance).
  */
class EditDistanceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Reference: the textbook O(m·n) DP, independent of both Spark's and
    * the kernel's code paths. */
  private def reference(a: String, b: String): Int = {
    val m = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) m(i)(0) = i
    for (j <- 0 to b.length) m(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length)
      m(i)(j) = math.min(
        m(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1),
        math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1))
    m(a.length)(b.length)
  }

  test("kernel equals the full-matrix reference on 2000 random string pairs") {
    val rnd = new scala.util.Random(4242)
    val alphabets = Seq("ab", "abc", "abcdefgh", " abcdefghijklmnop")
    (1 to 2000).foreach { i =>
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      def str(len: Int) = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val a = str(rnd.nextInt(40))
      // half the pairs are mutations of a (the near-dup regime the band
      // targets), half independent (the far regime that forces doubling)
      val b = if (rnd.nextBoolean()) {
        val sb = new StringBuilder(a)
        (0 until rnd.nextInt(5)).foreach { _ =>
          if (sb.nonEmpty) rnd.nextInt(3) match {
            case 0 => sb.setCharAt(rnd.nextInt(sb.length), alpha(rnd.nextInt(alpha.length)))
            case 1 => sb.deleteCharAt(rnd.nextInt(sb.length))
            case 2 => sb.insert(rnd.nextInt(sb.length + 1), alpha(rnd.nextInt(alpha.length)))
          }
        }
        sb.toString
      } else str(rnd.nextInt(40))
      assert(EditDistanceKernel.distance(a, b) == reference(a, b).toLong,
        s"pair $i: '$a' vs '$b'")
    }
  }

  test("kernel edge cases: empty sides, identical, disjoint, extreme length skew") {
    assert(EditDistanceKernel.distance("", "") == 0L)
    assert(EditDistanceKernel.distance("", "abc") == 3L)
    assert(EditDistanceKernel.distance("abc", "") == 3L)
    assert(EditDistanceKernel.distance("same text", "same text") == 0L)
    assert(EditDistanceKernel.distance("aaaa", "bbbb") == 4L)
    assert(EditDistanceKernel.distance("a", "a" * 500) == 499L)
    assert(EditDistanceKernel.distance("kitten", "sitting") == 3L)
  }

  test("expression equals functions.levenshtein on the live q70 candidate texts") {
    // the actual confirm inputs: ASCII-folded candidate docs at sf0.001 —
    // the column-level A/B that proves the swap changed no output
    val diff = SparkEntry.queries("q70_edit_distance")(spark, sf)
      .join(spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id").as("doc_a"),
          regexp_replace(col("text"), "[^\\x00-\\x7F]", "?").as("fa")), Seq("doc_a"))
      .join(spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id").as("doc_b"),
          regexp_replace(col("text"), "[^\\x00-\\x7F]", "?").as("fb")), Seq("doc_b"))
      .filter(levenshtein(col("fa"), col("fb")).cast("long") =!= col("edit_distance"))
    assert(diff.count() == 0)
  }

  test("code-point semantics match functions.levenshtein on supplementary characters") {
    // an emoji is ONE code point (a UTF-16 surrogate pair): a charAt DP
    // would count 2 edits here and break the bit-identity contract
    val pairs = Seq(
      ("\uD83D\uDE00", "a"), ("x\uD83D\uDE00y", "xy"),
      ("\uD83D\uDE00\uD83D\uDE01", "\uD83D\uDE00"),
      ("caf\u00e9", "cafe"), ("\uD835\uDC9C\uD835\uDC9D", "AB"))
    val df = pairs.toDF("a", "b")
      .select(graft.functions.EditDistance.editDistance(col("a"), col("b")).as("k"),
        levenshtein(col("a"), col("b")).cast("long").as("ref"))
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("graft_edit_distance is SQL-registered and codegen-compatible") {
    graft.plans.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT graft_edit_distance('kitten', 'sitting') AS d, " +
        "graft_edit_distance(CAST(NULL AS STRING), 'x') AS n").collect().head
    assert(got.getLong(0) == 3L && got.isNullAt(1))
  }
}
