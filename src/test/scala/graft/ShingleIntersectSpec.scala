package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** The native sorted-array merge kernel
  * ([[graft.functions.SortedIntersectCount]]) that replaced the confirm
  * family's explode/self-join/re-aggregate |A∩B| (q31/q199/q210/q240/
  * q249/q261) must be BIT-EQUAL to the composed form it replaced: same
  * intersection counts, same set sizes, same pair population (only pairs
  * with ≥ 1 shared shingle). The corpus sweep recomputes the FORMER
  * explode+join confirm inline over every pair of a bounded doc-id cross
  * at two SFs and diffs it against the kernel form; the planted frame
  * covers edge rows the corpus never exercises (nulls, empties, prefix
  * ordering, unicode).
  */
class ShingleIntersectSpec extends AnyFunSuite {
  import TestSpark._

  /** Per-doc sorted distinct shingle arrays, built the production way. */
  private def setsOf(dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 60) // bounded cross: 60 docs → 1770 pairs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(graft.functions.WordNgrams(col("w"), 3)).as("sh"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("sh"))).as("shs"))

  private def checkDir(dir: String): Unit = {
    val sets = setsOf(dir).localCheckpoint()
    val pairs = sets.select(col("doc_id").as("doc_a"))
      .crossJoin(sets.select(col("doc_id").as("doc_b")))
      .filter(col("doc_a") < col("doc_b"))
    // the FORMER composed confirm: exploded shingle rows, self-join per
    // pair on shingle equality, re-aggregate, inner-join the sizes
    val sh = sets.select(col("doc_id"), explode(col("shs")).as("sh"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
    val composed = pairs
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(sizes.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        col("ca.c").as("c_a"), col("cb.c").as("c_b"))
    // the kernel confirm, same shape Dedup.pairIntersections builds
    val native = pairs
      .join(sets.as("ia"), col("doc_a") === col("ia.doc_id"))
      .join(sets.as("ib"), col("doc_b") === col("ib.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        Dedup.intersectCount(col("ia.shs"), col("ib.shs")).as("n_inter"),
        size(col("ia.shs")).cast("long").as("c_a"),
        size(col("ib.shs")).cast("long").as("c_b"))
      .filter(col("n_inter") > 0L)
    assert(native.exceptAll(composed).count() == 0,
      s"$dir: kernel rows not in composed confirm")
    assert(composed.exceptAll(native).count() == 0,
      s"$dir: composed rows not in kernel confirm")
  }

  test("kernel confirm == composed explode/join confirm (sf0.001, sf0.01)") {
    checkDir("/root/testdata/sf0.001")
    checkDir("/root/testdata/sf0.01")
  }

  test("planted edge rows: nulls, empties, prefixes, unicode, disjoint") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "a array<string>, b array<string>, expect bigint")
    def r(a: Seq[String], b: Seq[String], e: java.lang.Long) =
      org.apache.spark.sql.Row(a, b, e)
    val rows = Seq(
      r(Seq(), Seq(), 0L),                             // both empty
      r(Seq(), Seq("x"), 0L),                          // one empty
      r(null, Seq("x"), null),                         // null array → NULL
      r(Seq("x"), null, null),
      r(Seq("a", "b", "c"), Seq("a", "b", "c"), 3L),   // identical
      r(Seq("a", "c", "e"), Seq("b", "d", "f"), 0L),   // interleaved disjoint
      r(Seq("a", "ab", "abc"), Seq("ab", "abd"), 1L),  // prefix ordering
      r(Seq("", "a"), Seq("", "b"), 1L),               // empty string element
      r(Seq("héé", "zz", "ñ"), Seq("héé", "ñ"), 2L),   // unicode (binary order)
      r(Seq("a", "z"), Seq("a", "b", "c", "d", "e", "f", "z"), 2L), // size skew
      r(Seq(null, "a"), Seq(null, "a"), 1L)            // null elements match nothing
    )
    val df = spark.createDataFrame(rows.asJava, schema)
      .select(col("expect"),
        Dedup.intersectCount(sort_array(col("a")), sort_array(col("b")))
          .as("got"))
    val bad = df.filter(
      !(col("got") <=> col("expect"))).collect()
    assert(bad.isEmpty, s"kernel edge rows diverge: ${bad.mkString("; ")}")
  }
}
