package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JaroWinklerKernel
import graft.operators.Linkage

/** Jaro–Winkler kernel + q143 blocking properties. The kernel is pinned to
  * the LITERATURE's hand-computed values (Winkler 1990 / the standard
  * string-matching examples) — an oracle independent of this repo's code —
  * and the blocked query is brute-forced against all-pairs over the same
  * block keys.
  */
class LinkageSpec extends AnyFunSuite {
  import TestSpark._

  test("kernel matches published Jaro-Winkler values exactly (floored bp)") {
    // jaro(MARTHA, MARHTA) = 17/18, jw = 173/180 = 0.96111
    assert(JaroWinklerKernel.jwBp("MARTHA", "MARHTA") == 9611L)
    // jaro(DIXON, DICKSONX) = 23/30, jw = 61/75 = 0.81333
    assert(JaroWinklerKernel.jwBp("DIXON", "DICKSONX") == 8133L)
    assert(JaroWinklerKernel.jwBp("DWAYNE", "DUANE") == 8400L)
    assert(JaroWinklerKernel.jwBp("JONES", "JOHNSON") == 8323L)
  }

  test("kernel identities: reflexive, symmetric, bounded, disjoint = 0") {
    val samples = Seq("", "a", "ab", "abc", "cold widget", "blue gizmo",
      "MARTHA", "aaaa bbbb cccc", "xyzzy")
    for (a <- samples) {
      assert(JaroWinklerKernel.jwBp(a, a) == (if (a.isEmpty) 10000L else 10000L))
      for (b <- samples) {
        val s = JaroWinklerKernel.jwBp(a, b)
        assert(s == JaroWinklerKernel.jwBp(b, a), s"asymmetric on ($a, $b)")
        assert(s >= 0L && s <= 10000L)
      }
    }
    assert(JaroWinklerKernel.jwBp("abc", "xyz") == 0L)
    assert(JaroWinklerKernel.jwBp("", "abc") == 0L)
  }

  test("truncated comparisons never report identity (cap at 9999)") {
    val big = "x" * (JaroWinklerKernel.MaxLen + 5)
    val alsoBig = "x" * JaroWinklerKernel.MaxLen + "yyyyy" // same first 10k chars
    assert(big != alsoBig)
    assert(JaroWinklerKernel.jwBp(big, alsoBig) == 9999L)
    assert(JaroWinklerKernel.jwBp(big, big) == 10000L) // true equality still 10000
  }

  test("boost threshold: no prefix bonus at or below jaro 0.7") {
    // crafted pair with a common prefix but jaro ≤ 0.7 must NOT be boosted:
    // jw == jaro exactly (the Winkler 1990 boost-threshold form)
    val (a, b) = ("aXXXXXX", "aYYYYYY") // prefix 1, jaro = (1/7+1/7+1)/3 = 3/7 ≈ 0.43
    assert(JaroWinklerKernel.jwBp(a, b) == 10000L * 9L / 21L) // 3/7 floored bp
  }

  test("native expression agrees with the kernel and works from SQL") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS a, " +
      "       graft_jaro_winkler(CAST(NULL AS STRING), 'x') AS n").head()
    assert(r.getLong(0) == 9611L)
    assert(r.isNullAt(1))
  }

  test("q143 blocked pairs equal brute force over the same blocks (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    val got = Linkage.q143LinkagePairs(spark, dir)
      .select(col("id_a"), col("id_b"), col("jw_bp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // driver-side brute force with the SAME kernel over all within-block
    // pairs (dev scale: 2000 parts) — proves the join/filter plumbing
    // drops nothing and adds nothing
    val parts = graft.Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byBlock = parts.groupBy { case (_, brand, name) => (brand, name.split(" ")(0)) }
    val want = byBlock.values.flatMap { block =>
      for {
        (ia, _, na) <- block.toSeq
        (ib, _, nb) <- block.toSeq
        if ia < ib
        s = JaroWinklerKernel.jwBp(na, nb)
        if s >= 9000L && s < 10000L
      } yield (ia, ib, s)
    }.toSet
    assert(want.nonEmpty, "probe expects nonempty pairs at sf0.01")
    assert(got == want)
  }
}
