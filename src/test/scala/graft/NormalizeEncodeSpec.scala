package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graft.ColumnBridge
import graft.functions.{L2Normalize, PqEncode}
import graft.operators.Similarity

/** The two native codegen kernels on the PQ hot path, each pinned
  * bit-equal to the composed higher-order-function form it replaces
  * (the composed forms evaluate interpreted — correct but ~dim² slower
  * per row — so they stay as the correctness reference, like
  * MinHashAgg's composed-min and CosineSimilarity's cosineHof).
  */
class NormalizeEncodeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def l2n(c: Column): Column =
    ColumnBridge.column(L2Normalize(ColumnBridge.expression(c)))

  private def pqEnc(c: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(c), books))

  test("L2Normalize is bit-identical to the composed when/transform form on real embeddings") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val both = emb.select(
      l2n(col("embedding")).as("native"),
      Similarity.normalizedRef(col("embedding")).as("composed"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getSeq[Double](0)
      val c = r.getSeq[Double](1)
      assert(n == c, "native and composed normalization must be bit-equal")
    }
  }

  test("L2Normalize edge contract matches the composed form: zero vector, empty array, null element") {
    val edge = Seq(
      (1, Seq(0.0f, 0.0f, 0.0f)),           // zero norm → cast-only
      (2, Seq.empty[Float]),                // empty → cast-only (empty)
      (3, Seq(3.0f, 4.0f))                  // plain
    ).toDF("id", "v")
      .union(Seq((4, null.asInstanceOf[Seq[Float]])).toDF("id", "v"))
    val withNullElem = spark.sql(
      "SELECT 5 AS id, array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS v")
    val df = edge.union(withNullElem)
    val rows = df.select(col("id"), l2n(col("v")).as("n"),
        Similarity.normalizedRef(col("v")).as("c"))
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2),
        s"id=${r.getInt(0)}: null-ness must match")
      if (!r.isNullAt(1))
        assert(r.getSeq[java.lang.Double](1) == r.getSeq[java.lang.Double](2),
          s"id=${r.getInt(0)}: values must match")
    }
    // and the interesting ones concretely: zero vector passes through
    assert(rows(0).getSeq[Double](1) == Seq(0.0, 0.0, 0.0))
    // null row stays null, null element stays cast-only with its null
    assert(rows(3).isNullAt(1))
    assert(rows(4).getSeq[java.lang.Double](1) == Seq(1.0, null))
  }

  test("PqEncode is bit-identical to the composed per-subspace argmax fold on real embeddings") {
    val books = Similarity.pqCodebooks(spark, sf)
    val m = books.length
    val subDim = books(0)(0).length
    val emb = Tables.embeddings(spark, sf)
      .withColumn("xn", l2n(col("embedding")))
      .withColumn("subs", array((0 until m).map(j =>
        slice(col("xn"), j * subDim + 1, subDim)): _*))
    val both = emb.select(
      pqEnc(col("xn"), books).as("native"),
      array((0 until m).map(j =>
        Similarity.pqCodeCol(col("subs")(j), books(j))): _*).as("composed"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1),
        "native and composed PQ codes must be identical")
    }
    // codes well-formed: m entries each in [0, k)
    val k = books(0).length
    rows.foreach { r =>
      val cs = r.getSeq[Int](0)
      assert(cs.length == m && cs.forall(c => c >= 0 && c < k))
    }
  }

  test("PqEncode length/null contract: wrong-length and null-element inputs yield SQL NULL") {
    val books = Similarity.pqCodebooks(spark, sf)
    val df = spark.sql(
      """SELECT * FROM VALUES
         (1, array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE))),
         (2, CAST(NULL AS ARRAY<DOUBLE>))
         AS t(id, v)""")
    val rows = df.select(col("id"), pqEnc(col("v"), books).as("codes"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1), "wrong-length input must encode to NULL")
    assert(rows(1).isNullAt(1), "null input must encode to NULL")
  }
}
