package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOf
import org.scalatest.funsuite.AnyFunSuite

/** The custom LogicalPlan+Strategy+SparkPlan as-of join vs the window-based
  * q24 implementation — same attribution on the real events table.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("AsOfJoinExec appears in the plan and matches q24 attribution") {
    val events = Tables.events(spark, sf)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = events.filter(col("event_type").isin("click", "view"))
      .select(col("event_id").as("v_event_id"), col("user_id").as("v_user_id"),
        col("ts").as("v_ts"))

    val custom = AsOf.join(purchases, views, "user_id", "v_user_id", "ts", "v_ts")
    assert(custom.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      custom.queryExecution.executedPlan.toString)

    val got = custom.select(col("event_id"), col("user_id"),
      col("v_event_id").as("attr_event_id"))
    val expected = SparkEntry.queries("q24_asof_attribution")(spark, sf)
    assert(got.count() == expected.count())
    assert(got.exceptAll(expected).count() == 0 &&
           expected.exceptAll(got).count() == 0)
  }

  test("as-of join treats null keys/times as non-matching (no NPE)") {
    val s = spark
    import s.implicits._
    val l = Seq[(java.lang.Long, java.lang.Long)]((1L, 100L), (null, 50L))
      .toDF("k", "t")
    val r = Seq[(java.lang.Long, java.lang.Long)]((1L, 90L), (1L, null), (null, 10L))
      .toDF("rk", "rt")
    val out = AsOf.join(l, r, "k", "rk", "t", "rt").collect()
      .map(x => (Option(x.get(0)), Option(x.get(3)))).toSet
    assert(out == Set((Some(1L), Some(90L)), (None, None)), out.toString)
  }

  test("as-of join rejects mismatched time types at call time") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, "oops")).toDF("rk", "rt")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r, "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("time types differ"))
  }

  test("as-of join emits nulls for left rows with no prior right row") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 100L), (1L, 200L), (2L, 50L)).toDF("k", "t")
    val r = Seq((1L, 150L), (1L, 90L), (3L, 10L)).toDF("rk", "rt")
    val out = AsOf.join(l, r, "k", "rk", "t", "rt").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(3)) -1L else x.getLong(3))).toSet
    // (1,100) -> rt=90; (1,200) -> rt=150; (2,50) -> no match
    assert(out == Set((1L, 100L, 90L), (1L, 200L, 150L), (2L, 50L, -1L)), out.toString)
  }
}
