package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BottomKSample, BottomKState}
import graft.operators.RelationalExt

/** BottomKSample aggregate + q144: the bounded sampler must equal the
  * full-sort window formulation exactly — same ids, same order — while
  * never holding more than k entries per buffer.
  */
class BottomKSpec extends AnyFunSuite {
  import TestSpark._

  test("state keeps exactly the k smallest (rank, id) pairs under eviction and merge") {
    val st = new BottomKState(3)
    Seq(("f", 1L), ("b", 2L), ("d", 3L), ("a", 4L), ("e", 5L), ("c", 6L))
      .foreach { case (r, i) => st.add(r, i) }
    assert(st.entries.toSeq == Seq(("a", 4L), ("b", 2L), ("c", 6L)))
    val other = new BottomKState(3)
    Seq(("aa", 7L), ("zz", 8L), ("ab", 9L)).foreach { case (r, i) => other.add(r, i) }
    val merged = st.merge(other)
    assert(merged.entries.toSeq == Seq(("a", 4L), ("aa", 7L), ("ab", 9L)))
    assert(merged.entries.size <= 3)
    // duplicate insertion is idempotent
    merged.add("a", 4L)
    assert(merged.entries.size == 3)
  }

  test("aggregate equals the row_number window formulation on real data (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    val base = graft.Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("status"),
        expr("CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT)").as("yr"),
        col("o_orderkey"),
        md5(col("o_orderkey").cast("string")).as("h"))
      // several input partitions so partial buffers really merge
      .repartition(7)
    val viaAgg = base.groupBy(col("status"), col("yr"))
      .agg(BottomKSample.bottomK(col("h"), col("o_orderkey"), 5).as("ids"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("status"), col("yr")).orderBy(col("h"), col("o_orderkey"))
    val viaWindow = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy(col("status"), col("yr"))
      .agg(sort_array(collect_list(struct(col("h"), col("o_orderkey")))).as("s"))
      .selectExpr("status", "yr", "transform(s, x -> x.o_orderkey) AS ids")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    assert(viaAgg.nonEmpty)
    assert(viaAgg == viaWindow)
  }

  test("null ranks and ids are skipped; SQL registration works with FILTER") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_bottom_k(h, id, 2) AS ids,
                graft_bottom_k(h, id, 2) FILTER (WHERE id != 3) AS filtered
         FROM VALUES ('c', CAST(1 AS BIGINT)), ('a', CAST(2 AS BIGINT)),
                     ('b', CAST(3 AS BIGINT)), (NULL, CAST(4 AS BIGINT)),
                     ('d', CAST(NULL AS BIGINT)) AS t(h, id)""").head()
    assert(r.getSeq[Long](0) == Seq(2L, 3L))  // a→2, b→3
    assert(r.getSeq[Long](1) == Seq(2L, 1L))  // a→2, c→1 once b is filtered
  }

  test("input types are validated at analysis, not a mid-job ClassCastException") {
    graft.plans.GraftExtensions.register(spark)
    // numeric rank would silently sort lexicographically; int id would CCE
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_bottom_k(CAST(1.5 AS DOUBLE), CAST(1 AS BIGINT), 2) " +
        "FROM VALUES (1) AS t(x)").collect()
    }
    assert(e1.getMessage.contains("rank: string"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_bottom_k('a', CAST(1 AS INT), 2) FROM VALUES (1) AS t(x)")
        .collect()
    }
    assert(e2.getMessage.contains("rank: string"))
  }
}
