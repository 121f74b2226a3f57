package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** The native cell-scoring kernels ([[graft.functions.NearestCell]] /
  * [[graft.functions.SortedScoredCells]]) must be BIT-EQUAL to the
  * composed reference form ([[Similarity.scoredCells]] under
  * array_max / reverse∘array_sort) — same cosines, same round(…, 6),
  * same tie/NULL/degenerate behavior. The corpus sweep covers every
  * embedding at two SFs against both the k-means quantizer and the hub
  * model; the planted frame covers the degenerate rows the corpus
  * never exercises.
  */
class CellScoreSpec extends AnyFunSuite {
  import TestSpark._

  private def composedNearest(v: org.apache.spark.sql.Column,
      centers: Array[Array[Double]]) =
    -array_max(Similarity.scoredCells(v, centers)).getField("negcell")

  private def composedSorted(v: org.apache.spark.sql.Column,
      centers: Array[Array[Double]]) =
    reverse(array_sort(Similarity.scoredCells(v, centers)))

  private def checkDir(dir: String): Unit = {
    val centers = Similarity.kmeansCentroids(spark, dir, 16, 3)
    val emb = Tables.embeddings(spark, dir)
    val both = emb.select(
      col("vec_id"),
      Similarity.nearestCell(col("embedding"), centers).as("native"),
      composedNearest(col("embedding"), centers).as("composed"),
      Similarity.sortedScoredCells(col("embedding"), centers).as("ns"),
      composedSorted(col("embedding"), centers).as("cs"))
    val bad = both.filter(col("native") =!= col("composed") ||
      to_json(col("ns")) =!= to_json(col("cs"))).limit(3).collect()
    assert(bad.isEmpty, s"$dir: native/composed diverge: ${bad.mkString("; ")}")
  }

  test("native == composed on every corpus embedding (sf0.001, sf0.01)") {
    checkDir("/root/testdata/sf0.001")
    checkDir("/root/testdata/sf0.01")
  }

  test("degenerate rows: NULL vector, wrong length, NULL element -> cell 0, all-NULL scores") {
    val centers = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val schema = StructType(Seq(
      StructField("embedding", ArrayType(DoubleType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      Row(null),
      Row(Seq(1.0, 2.0, 3.0)), // wrong length
      Row(Seq(1.0, null))) // null element
    val df = spark.createDataFrame(rows, schema)
    val got = df.select(
      Similarity.nearestCell(col("embedding"), centers).as("native"),
      composedNearest(col("embedding"), centers).as("composed"),
      to_json(Similarity.sortedScoredCells(col("embedding"), centers)).as("ns"),
      to_json(composedSorted(col("embedding"), centers)).as("cs")).collect()
    got.foreach { r =>
      assert(r.getInt(0) == 0 && r.getInt(1) == 0, r.toString)
      assert(r.getString(2) == r.getString(3), r.toString)
    }
  }

  test("ties on the rounded score resolve toward the smaller cell id, both forms") {
    val c = Array(Array(3.0, 4.0), Array(6.0, 8.0), Array(0.6, 0.8)) // colinear: all cs equal
    val schema = StructType(Seq(
      StructField("embedding", ArrayType(DoubleType, containsNull = false))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(Seq(30.0, 40.0))), schema)
    val r = df.select(
      Similarity.nearestCell(col("embedding"), c).as("n"),
      composedNearest(col("embedding"), c).as("m")).head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 0)
  }

  test("native beam walk == composed walk for every (ef, hops) sweep point, both SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val (hubs, nbrs) = Similarity.hubGraph(spark, dir, 16, 4)
      val emb = Tables.embeddings(spark, dir)
      for (ef <- Seq(1, 2, 4, 8, 16); hops <- Seq(1, 3)) {
        val bad = emb.select(
          to_json(Similarity.walkProbes(col("embedding"), hubs, nbrs, ef, hops)).as("n"),
          to_json(Similarity.walkProbesComposed(col("embedding"), hubs, nbrs, ef, hops)).as("c"))
          .filter(col("n") =!= col("c")).limit(3).collect()
        assert(bad.isEmpty, s"$dir ef=$ef hops=$hops: ${bad.mkString("; ")}")
      }
    }
  }

  test("zero-norm vector throws the same ANSI DIVIDE_BY_ZERO as the composed form") {
    val centers = Array(Array(1.0, 0.0))
    val schema = StructType(Seq(
      StructField("embedding", ArrayType(DoubleType, containsNull = false))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(Seq(0.0, 0.0))), schema)
    val eN = intercept[Exception] {
      df.select(Similarity.nearestCell(col("embedding"), centers)).collect()
    }
    val eC = intercept[Exception] {
      df.select(composedNearest(col("embedding"), centers)).collect()
    }
    def root(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else root(t.getCause)
    assert(root(eN).isInstanceOf[ArithmeticException], root(eN).toString)
    assert(root(eC).isInstanceOf[ArithmeticException], root(eC).toString)
  }
}
