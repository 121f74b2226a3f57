package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorOps

/** Optimizer-rule injection: the composed HOF cosine fuses into the native
  * CosineSimilarity kernel on sessions with GraftExtensions installed.
  */
class CosineFusionSpec extends AnyFunSuite {
  import TestSpark._

  private def withExtSession[A](f: SparkSession => A): A = {
    val prev = spark // materialize the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-fusion-test")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(s2)
    finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("HOF cosine is rewritten to the native expression and stays bit-identical") {
    withExtSession { s2 =>
      val df = s2.read.parquet(s"$sf/embeddings.parquet").limit(50)
        .select(col("vec_id"), col("embedding"))
      val paired = df.as("a").crossJoin(df.as("b")).limit(500)
      val hof = paired.select(col("a.vec_id"), col("b.vec_id"),
        VectorOps.cosineHof(col("a.embedding"), col("b.embedding")).as("cs"))
      // the optimized plan must contain the fused native expression and no
      // higher-order aggregate machinery for the cosine
      val optimized = hof.queryExecution.optimizedPlan.toString
      assert(optimized.contains("cosinesimilarity"), optimized)
      assert(!optimized.contains("aggregate("), optimized)
      // and produce exactly what the explicit native call produces
      val native = paired.select(col("a.vec_id"), col("b.vec_id"),
        VectorOps.cosine(col("a.embedding"), col("b.embedding")).as("cs"))
      assert(hof.exceptAll(native).count() == 0 && native.exceptAll(hof).count() == 0)
    }
  }

  test("non-cosine HOF shapes are left untouched") {
    withExtSession { s2 =>
      val df = s2.read.parquet(s"$sf/embeddings.parquet").limit(20)
      // a weighted dot over norms is NOT a plain cosine — must not fuse
      val weighted = df.select(
        (aggregate(zip_with(col("embedding"), col("embedding"),
            (x, y) => x.cast("double") * y.cast("double") * lit(2.0)),
          lit(0.0), (acc, v) => acc + v) /
         (sqrt(VectorOps.dot(col("embedding"), col("embedding"))) *
          sqrt(VectorOps.dot(col("embedding"), col("embedding"))))).as("w"))
      val optimized = weighted.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("cosinesimilarity"), optimized)
      assert(weighted.count() == 20)
    }
  }
}
