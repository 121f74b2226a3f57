package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** q158 — PCA projection. Rows-only, so the contract lives here: the
  * driver-held model must be a real eigenpair of the data's covariance,
  * the distributed projection must agree with a driver-side reference,
  * and the scores' variance must equal the eigenvalue (the defining
  * property of projecting onto an eigenvector).
  */
class PcaSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val xs: Array[Array[Double]] =
    Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  private def cov(): (Array[Double], Array[Array[Double]]) = {
    val d = xs.head.length
    val n = xs.length.toDouble
    val mean = Array.tabulate(d)(i => xs.map(_(i)).sum / n)
    val c = Array.tabulate(d, d)((i, j) =>
      xs.map(x => x(i) * x(j)).sum / n - mean(i) * mean(j))
    (mean, c)
  }

  test("q158 model is a unit eigenpair: ||v|| = 1 and Cv = lambda*v") {
    val (_, v, lambda) = Similarity.pcaModel(spark, sf)
    val (_, c) = cov()
    val d = v.length
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-6)
    assert(lambda > 0, s"top eigenvalue must be positive, got $lambda")
    val cv = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
    val resid = math.sqrt(cv.zip(v).map { case (a, b) => (a - lambda * b) * (a - lambda * b) }.sum)
    assert(resid < 1e-4 * math.max(lambda, 1.0), s"||Cv - lambda*v|| = $resid at lambda = $lambda")
  }

  test("q158 projection matches a driver reference per row; Var(score) = lambda") {
    val (mean, v, lambda) = Similarity.pcaModel(spark, sf)
    val rows = Similarity.q158PcaProject(spark, sf).collect()
    assert(rows.length == xs.length && rows.nonEmpty)
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val scores = rows.map { r =>
      val x = emb(r.getAs[Long]("vec_id"))
      val want = x.zip(v).map { case (a, b) => a * b }.sum -
        mean.zip(v).map { case (a, b) => a * b }.sum
      val got = r.getAs[Long]("pc1_micro") / 1e6
      assert(math.abs(got - want) < 1e-3, s"vec ${r.getAs[Long]("vec_id")}: $got vs $want")
      got
    }
    val mu = scores.sum / scores.length
    val varObs = scores.map(x => (x - mu) * (x - mu)).sum / scores.length
    assert(math.abs(varObs - lambda) < 0.02 * math.max(lambda, 1.0),
      s"Var(pc1) = $varObs but lambda = $lambda")
    // the top component must actually carry signal: more variance than the
    // average single input dimension (else the rotation bought nothing)
    val (_, c) = cov()
    val avgDiag = (0 until v.length).map(i => c(i)(i)).sum / v.length
    assert(lambda > avgDiag, s"lambda $lambda <= mean input variance $avgDiag")
  }

  test("q158 refit after cache invalidation reproduces every score exactly") {
    val a = Similarity.q158PcaProject(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("pc1_micro")).toMap
    Similarity.invalidatePcaCache()
    val b = Similarity.q158PcaProject(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("pc1_micro")).toMap
    assert(a == b)
  }
}
