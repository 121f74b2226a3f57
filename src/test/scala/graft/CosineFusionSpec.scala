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

  test("folds that merely contain an Add do not fuse (strict merge + finish match)") {
    withExtSession { s2 =>
      val df = s2.read.parquet(s"$sf/embeddings.parquet").limit(20)
      def prods = zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double"))
      // merge is acc + abs(v): an Add, but not THE plain-sum fold — the
      // dot/(sqrt*sqrt) wrapper must not mis-fuse it into cosine
      def absDot = aggregate(prods, lit(0.0), (acc, v) => acc + abs(v))
      val absMerge = df.select((absDot / (sqrt(absDot) * sqrt(absDot))).as("m"))
      val p1 = absMerge.queryExecution.optimizedPlan.toString
      assert(!p1.contains("cosinesimilarity"), p1)
      assert(absMerge.count() == 20)
      // finish scales the accumulator: identity-finish requirement must block
      def scaledDot = aggregate(prods, lit(0.0), (acc, v) => acc + v, acc => acc * lit(2.0))
      val scaledFin = df.select((scaledDot / (sqrt(scaledDot) * sqrt(scaledDot))).as("m"))
      val p2 = scaledFin.queryExecution.optimizedPlan.toString
      assert(!p2.contains("cosinesimilarity"), p2)
      assert(scaledFin.count() == 20)
    }
  }

  test("try_divide cosine fuses but keeps NULL-on-zero semantics (Divide's evalMode honored)") {
    withExtSession { s2 =>
      // try_divide parses to a TRY-mode Divide: the fusion must take
      // zero-divisor behavior from the MATCHED node, not the session's
      // ANSI conf — under ANSI (default) this must fuse AND return NULL,
      // not throw. Inputs are COLUMNS (a zero vector per row): literals
      // would constant-fold away before the plan can be inspected.
      val df = s2.read.parquet(s"$sf/embeddings.parquet").limit(5)
        .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS e",
          "transform(embedding, x -> CAST(0.0 AS DOUBLE)) AS z")
        .selectExpr(
          """try_divide(
               aggregate(zip_with(z, e, (x, y) -> x * y), 0.0D, (a, v) -> a + v),
               sqrt(aggregate(zip_with(z, z, (x, y) -> x * y), 0.0D, (a, v) -> a + v)) *
               sqrt(aggregate(zip_with(e, e, (x, y) -> x * y), 0.0D, (a, v) -> a + v))) AS c""")
      assert(s2.conf.get("spark.sql.ansi.enabled") == "true", "precondition: ANSI default")
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("cosinesimilarity"), optimized)
      val rows = df.collect()
      assert(rows.length == 5 && rows.forall(_.isNullAt(0)),
        "TRY-mode fused cosine must be NULL on zero norm, not throw")
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
