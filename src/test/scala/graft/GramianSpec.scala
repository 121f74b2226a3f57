package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Gramian

/** The native Gramian sufficient-statistics aggregate behind q158's PCA:
  * equality with a driver-side reference (which is also what the retired
  * pair-explode form computed), null-skip and empty semantics, and the
  * dimension-mismatch guard.
  */
class GramianSpec extends AnyFunSuite {
  import TestSpark._

  test("gramian equals a driver-side reference on the embeddings table") {
    val row = Tables.embeddings(spark, sf)
      .agg(Gramian.gramian(col("embedding")).as("g"))
      .select(col("g.n"), col("g.sx"), col("g.sp")).collect().head
    val xs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = xs.head.length
    assert(row.getLong(0) == xs.length)
    val sx = row.getSeq[Double](1)
    val sp = row.getSeq[Double](2)
    assert(sx.length == d && sp.length == d * (d + 1) / 2)
    def close(a: Double, b: Double) = math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b))
    for (i <- 0 until d)
      assert(close(sx(i), xs.map(_(i)).sum), s"sx($i)")
    var idx = 0
    for (i <- 0 until d; j <- i until d) {
      assert(close(sp(idx), xs.map(x => x(i) * x(j)).sum), s"sp($i,$j)")
      idx += 1
    }
  }

  test("null AND zero-length vectors are skipped; an all-null/empty group yields n=0") {
    import spark.implicits._
    val row = Seq(Option(Seq(1f, 2f)), None, Option(Seq.empty[Float]), Option(Seq(3f, 4f)))
      .toDF("embedding")
      .agg(Gramian.gramian(col("embedding")).as("g"))
      .select(col("g.n"), col("g.sx"), col("g.sp")).collect().head
    // the empty vector must not inflate n (mean = sx/n would deflate) and
    // must not depend on which partition it lands in
    assert(row.getLong(0) == 2L)
    assert(row.getSeq[Double](1) == Seq(4.0, 6.0))
    assert(row.getSeq[Double](2) == Seq(10.0, 14.0, 20.0))
    val empty = Seq.empty[Option[Seq[Float]]].toDF("embedding")
      .agg(Gramian.gramian(col("embedding")).as("g"))
      .select(col("g.n"), col("g.sx")).collect().head
    assert(empty.getLong(0) == 0L && empty.getSeq[Double](1).isEmpty)
  }

  test("array<double> input reads correctly; non-array input fails at analysis") {
    import spark.implicits._
    val row = Seq(Seq(1.5, 2.5), Seq(0.5, 0.5)).toDF("v")
      .agg(Gramian.gramian(col("v")).as("g"))
      .select(col("g.n"), col("g.sx"), col("g.sp")).collect().head
    assert(row.getLong(0) == 2L)
    assert(row.getSeq[Double](1) == Seq(2.0, 3.0))
    assert(row.getSeq[Double](2) == Seq(1.5 * 1.5 + 0.25, 1.5 * 2.5 + 0.25, 2.5 * 2.5 + 0.25))
    val ex = intercept[Exception] {
      Seq("not a vector").toDF("v").agg(Gramian.gramian(col("v"))).collect()
    }
    assert(ex.getMessage.contains("graft_gramian") ||
      ex.toString.contains("DATATYPE_MISMATCH"), ex.toString)
  }

  test("a mid-stream dimension mismatch fails loudly, never truncates") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(Seq(1f, 2f), Seq(1f)).toDF("embedding")
        .agg(Gramian.gramian(col("embedding")).as("g"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("dimension mismatch")), ex.toString)
  }
}
