package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("q79 offset-0 cells are the full cohort (10000 bp) and offsets never exceed it") {
    val rows = Analytics.q79Retention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val off = r.getAs[Long]("week_offset")
      val bp = r.getAs[Long]("retention_bp")
      assert(bp >= 0 && bp <= 10000, s"retention_bp out of range: $bp")
      if (off == 0L)
        assert(bp == 10000L && r.getAs[Long]("n_users") == r.getAs[Long]("cohort_size"))
    }
    // every cohort must have its offset-0 anchor row
    val cohorts = rows.map(_.getAs[Long]("cohort_week")).distinct.toSet
    val anchored = rows.filter(_.getAs[Long]("week_offset") == 0L)
      .map(_.getAs[Long]("cohort_week")).toSet
    assert(cohorts == anchored)
  }

  test("q80 covers every ordering customer once with consistent quartile codes") {
    val df = Analytics.q80Rfm(spark, sf).cache()
    val nCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(df.count() == nCust, "one RFM row per ordering customer")
    val bad = df.filter(
      col("r_q") < 1 || col("r_q") > 4 || col("f_q") < 1 || col("f_q") > 4 ||
        col("m_q") < 1 || col("m_q") > 4 ||
        col("rfm") =!= col("r_q") * 100 + col("f_q") * 10 + col("m_q") ||
        col("recency_days") < 0).count()
    assert(bad == 0)
    df.unpersist()
  }

  test("q81 SCD2 intervals: contiguous versions, one current row per user, half-open intervals") {
    val df = Analytics.q81Scd2(spark, sf).cache()
    // exactly one open-ended (is_current) interval per user
    val perUser = df.groupBy("user_id").agg(
      sum("is_current").as("n_current"),
      count(lit(1)).as("n_rows"),
      max("version").as("max_v"))
    assert(perUser.filter(col("n_current") =!= 1).count() == 0)
    // versions are 1..n with no gaps
    assert(perUser.filter(col("max_v") =!= col("n_rows")).count() == 0)
    // intervals are strictly increasing and adjacent rows change state
    val overlaps = df.filter(col("valid_to_ms").isNotNull &&
      col("valid_to_ms") <= col("valid_from_ms")).count()
    assert(overlaps == 0, "valid_to must be strictly after valid_from")
    df.unpersist()
  }

  test("q82 transition counts reconcile with the event log and shares are floor-exact") {
    val df = Analytics.q82Transitions(spark, sf).cache()
    val total = df.agg(sum("n_transitions")).head().getLong(0)
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(total == expected, s"each user contributes n_events-1 transitions ($total vs $expected)")
    // per-source shares floor-sum to within one row-count of 10000 bp
    val perPrev = df.groupBy("prev_type").agg(
      sum("share_bp").as("bp"), count(lit(1)).as("n"))
    assert(perPrev.filter(col("bp") > 10000 || col("bp") <= lit(10000) - col("n")).count() == 0)
    df.unpersist()
  }
}
