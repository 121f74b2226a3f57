package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, Events, Quality}

class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("q277 gap profile equals a driver-side cadence recompute") {
    val seg = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orders = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderdate", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toLocalDateTime.toLocalDate,
        r.getLong(2)))
    val gaps = orders.groupBy(_._1).toSeq.flatMap { case (ck, os) =>
      val sorted = os.sortBy(o => (o._2.toEpochDay, o._3))
      sorted.zip(sorted.tail).map { case (a, b) =>
        (seg(ck), b._2.toEpochDay - a._2.toEpochDay)
      }
    }
    def band(g: Long): String =
      if (g == 0) "a_same_day" else if (g <= 7) "b_within_week"
      else if (g <= 30) "c_within_month" else if (g <= 90) "d_within_quarter"
      else "e_longer"
    val bySeg = gaps.groupBy(_._1)
    val want = bySeg.flatMap { case (sg, gs) =>
      val tot = gs.size.toLong
      gs.groupBy(g => band(g._2)).map { case (b, cell) =>
        (sg, b) -> ((cell.size.toLong, cell.size * 10000L / tot,
          cell.map(_._2).sum / cell.size))
      }
    }
    val got = Analytics.q277OrderGapProfile(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
  }

  test("q293 session bands reconcile with the oracled q20 session table") {
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val sess = Events.q20Sessionize(spark, sf).collect()
      .map(r => (r.getLong(2), us(r.getTimestamp(4)) - us(r.getTimestamp(3))))
    def band(n: Long) = if (n == 1) "a_single" else if (n <= 4) "b_2_4"
      else if (n <= 9) "c_5_9" else "d_10_plus"
    val ts = sess.size.toLong
    val te = sess.map(_._1).sum
    val want = sess.groupBy(s0 => band(s0._1)).map { case (b, ss) =>
      b -> ((ss.size.toLong, ss.map(_._1).sum, ss.size * 10000L / ts,
        ss.map(_._1).sum * 10000 / te, ss.map(_._2).sum / 1000000 / ss.size))
    }
    val got = Events.q293SessionSizeProfile(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == want)
  }

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

  test("q77 incremental SCD2 merge equals the full rebuild, row for row") {
    val full = Analytics.q81Scd2(spark, sf)
    val merged = Analytics.q77Scd2Merge(spark, sf)
    assert(merged.count() == full.count())
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("q77 merge handles brand-new users and untouched users") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType)))
    def ev(rows: Seq[(Long, String, Long, String)]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, t, u, ty) =>
          Row(id, java.sql.Timestamp.valueOf(t), u, ty) }), schema)
    // user 1: history + a batch event of the SAME type (no state change);
    // user 2: history + state change in batch; user 3: batch-only (new);
    // user 4: history only, absent from the batch (truly untouched)
    val old = ev(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-02 00:00:00", 2L, "view"),
      (3L, "2024-01-03 00:00:00", 2L, "cart"),
      (8L, "2024-01-04 00:00:00", 4L, "signup")))
    val batch = ev(Seq(
      (4L, "2024-02-01 00:00:00", 2L, "purchase"),
      (5L, "2024-02-02 00:00:00", 3L, "view"),
      (6L, "2024-02-03 00:00:00", 2L, "purchase"),
      (7L, "2024-02-04 00:00:00", 1L, "view")))
    val merged = Analytics.scd2Merge(Analytics.scd2Build(old), batch)
    val rebuilt = Analytics.scd2Build(old.unionByName(batch))
    assert(merged.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(merged).isEmpty)
    val byUser = merged.collect().groupBy(_.getAs[Long]("user_id"))
    // same-type batch rows don't close user 1's open row
    assert(byUser(1L).length == 1 && byUser(1L).head.getAs[Long]("is_current") == 1L)
    // user 2 gained version 3 (one change; the repeated purchase is a no-op)
    assert(byUser(2L).map(_.getAs[Int]("version")).sorted.toSeq == Seq(1, 2, 3))
    assert(byUser(3L).length == 1)
    // the batch-absent user passes through byte-identical (firstChange null)
    assert(byUser(4L).length == 1 && byUser(4L).head.getAs[Long]("is_current") == 1L
      && byUser(4L).head.getAs[String]("event_type") == "signup")
  }

  test("q78 grouping-set subtotals reconcile across granularities") {
    val rows = Analytics.q78GroupingSets(spark, sf).collect()
    val detail = rows.filter(_.getAs[Int]("gid") == 0)
    val byFlag = rows.filter(_.getAs[Int]("gid") == 1)
    val grand = rows.filter(_.getAs[Int]("gid") == 3)
    assert(grand.length == 1 && detail.nonEmpty && byFlag.nonEmpty)
    assert(detail.map(_.getAs[Long]("revenue_cents")).sum ==
      grand.head.getAs[Long]("revenue_cents"))
    assert(byFlag.map(_.getAs[Long]("n_items")).sum ==
      grand.head.getAs[Long]("n_items"))
  }

  test("q83 packing is gap-free within each bucket and bins respect the budget") {
    val rows = Analytics.q83PackSequences(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("bucket")).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_.getAs[Long]("offset_in_bucket"))
      var expect = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("offset_in_bucket") == expect, "offsets must be gap-free")
        assert(r.getAs[Long]("bin_id") == expect / 2048 &&
          r.getAs[Long]("offset_in_bin") == expect % 2048)
        expect += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("q263 budget sweep equals a driver recompute off q83's oracled layout") {
    val layout = Analytics.q83PackSequences(spark, sf).collect()
      .map(r => (r.getAs[String]("bucket"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("offset_in_bucket")))
    val got = Analytics.q263PackBudgetSweep(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val want = Seq(512L, 1024L, 2048L, 4096L).map { b =>
      val perBucket = layout.groupBy(_._1).values.map { docs =>
        (docs.map(d => d._3 / b).max + 1, docs.map(_._2).sum,
          docs.count(d => d._3 % b + d._2 > b).toLong)
      }
      val bins = perBucket.map(_._1).sum
      val nt = perBucket.map(_._2).sum
      b -> ((bins, nt, nt * 10000L / (bins * b), perBucket.map(_._3).sum))
    }.toMap
    assert(got == want, s"got $got\nref $want")
    // bin counts can only fall as the budget grows
    val bins = got.toSeq.sortBy(_._1).map(_._2._1)
    assert(bins.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
  }

  test("q85 linear attribution credit sums to exactly 10000 bp per purchase") {
    val df = Events.q85AttributionLinear(spark, sf).cache()
    assert(df.count() > 0)
    val perPurchase = df.groupBy("p_event_id")
      .agg(sum("credit_bp").as("total"), count(lit(1)).as("n"),
        max("n_clicks").as("n_clicks"))
    assert(perPurchase.filter(col("total") =!= 10000).count() == 0,
      "largest-remainder split must conserve credit exactly")
    assert(perPurchase.filter(col("n") =!= col("n_clicks")).count() == 0)
    df.unpersist()
  }

  test("q86 growth sign matches the revenue delta and the first month has no growth") {
    val rows = Events.q86RevenueGrowth(spark, sf).collect()
      .sortBy(_.getAs[String]("month"))
    assert(rows.length > 1)
    assert(rows.head.isNullAt(rows.head.fieldIndex("growth_bp")))
    rows.tail.foreach { r =>
      val cur = r.getAs[Long]("revenue_cents")
      val prev = r.getAs[Long]("prev_cents")
      val g = r.getAs[Long]("growth_bp")
      assert(math.signum((cur - prev).toDouble) == math.signum(g.toDouble) || g == 0L)
    }
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

  test("q106 basket identities: symmetric confidences, support <= both item rates, lift recompute") {
    val rows = Analytics.q106BasketLift(spark, sf).collect()
    assert(rows.nonEmpty)
    // rebuild the basket frame directly for the identity checks
    val items = SparkEntry.queries("q20_sessionize")(spark, sf)
      .select(col("user_id"), col("sess_no")).distinct()
    val nBaskets = items.count()
    rows.foreach { r =>
      val (np, sbp) = (r.getAs[Long]("n_pair"), r.getAs[Long]("support_bp"))
      assert(r.getString(0) < r.getString(1), "pairs are unordered, a < b")
      assert(np > 0 && sbp == np * 10000 / nBaskets)
      // confidence can never be below support's rate and never above 10000
      assert(r.getAs[Long]("conf_a_to_b_bp") >= sbp &&
        r.getAs[Long]("conf_a_to_b_bp") <= 10000)
      assert(r.getAs[Long]("conf_b_to_a_bp") >= sbp &&
        r.getAs[Long]("conf_b_to_a_bp") <= 10000)
      // lift recomputed from the row's own exact counts
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(na >= np && nb >= np, "item counts bound the pair count")
      // integer products FIRST, then one cast each — the operator's order
      val wantLift = BigDecimal((np * nBaskets).toDouble / (na * nb).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("lift") == wantLift)
      assert(r.getAs[Long]("conf_a_to_b_bp") == np * 10000 / na)
      assert(r.getAs[Long]("conf_b_to_a_bp") == np * 10000 / nb)
    }
  }

  test("q108 built-in session_window agrees with the lag-chain up to the gap boundary") {
    val sw = Events.q108SessionWindow(spark, sf).cache()
    val q20 = SparkEntry.queries("q20_sessionize")(spark, sf)
    // >= splits where > keeps: the built-in can only produce MORE sessions
    assert(sw.count() >= q20.count())
    // exact-gap ties are measure-zero in this data: counts actually equal,
    // so every per-session aggregate must reconcile 1:1 with q20
    if (sw.count() == q20.count()) {
      assert(sw.agg(sum("n_events")).head().getLong(0) ==
        q20.agg(sum("n_events")).head().getLong(0))
    }
    // the emitted end is the WINDOW bound: strictly after the last event,
    // by exactly the 30-minute gap relative to a session's span
    val bad = sw.filter(
      unix_micros(col("sess_end")) - unix_micros(col("sess_start")) <
        1800L * 1000000L).count()
    assert(bad == 0, "end = last event + gap implies span >= gap")
    sw.unpersist()
  }

  test("q107 engagement reconciles with the q20 session table") {
    val rows = Events.q107Engagement(spark, sf).collect()
    assert(rows.nonEmpty)
    val sess = SparkEntry.queries("q20_sessionize")(spark, sf)
      .select(col("n_events"), unix_micros(col("sess_start")).as("a"),
        unix_micros(col("sess_end")).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_.getAs[Long]("n_sessions")).sum == sess.length.toLong)
    assert(rows.map(_.getAs[Long]("n_bounces")).sum ==
      sess.count(_._1 == 1L).toLong)
    // bounces dwell zero; day grouping keys come from session starts
    val days = sess.map(_._2 / 86400000000L).distinct.sorted
    assert(rows.map(_.getAs[Long]("day")).sorted.sameElements(days))
    rows.foreach { r =>
      assert(r.getAs[Long]("bounce_bp") <= 10000)
      assert(r.getAs[Long]("avg_dwell_ms") >= 0)
    }
  }

  test("q97 per-day decomposed concurrency equals a brute-force global running sum") {
    val got = Events.q97Concurrency(spark, sf).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("max_concurrent"), r.getAs[Long]("n_starts"),
          r.getAs[Long]("n_ends"))).toMap
    assert(got.nonEmpty)
    // boundary totals: every session starts once and ends once
    val nSessions = SparkEntry.queries("q20_sessionize")(spark, sf).count()
    assert(got.values.map(_._2).sum == nSessions && got.values.map(_._3).sum == nSessions)
    // brute force: global running sum over all boundary points in the
    // operator's tie order; each day's max is seeded with the running
    // value at its start (sessions already open at midnight), and point-
    // free days inside open sessions carry the constant in-flight count
    val sess = SparkEntry.queries("q20_sessionize")(spark, sf)
      .select(col("user_id"), col("sess_no"),
        unix_micros(col("sess_start")).as("a"), unix_micros(col("sess_end")).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val pts = sess.flatMap { case (u, sn, a, b) => Seq((a, 1L, u, sn), (b, -1L, u, sn)) }
      .sortBy { case (us, d, u, sn) => (us, -d, u, sn) }
    var run = 0L
    var prevDay = Long.MinValue
    val perDay = scala.collection.mutable.Map.empty[Long, Long]
    pts.foreach { case (us, d, _, _) =>
      val day = us / 86400000000L
      if (day != prevDay) {
        // gap days between boundary days, while sessions are in flight
        if (prevDay != Long.MinValue && run > 0)
          ((prevDay + 1) until day).foreach(g => perDay(g) = run)
        perDay(day) = run // day-start seed: what's open at midnight
        prevDay = day
      }
      run += d
      perDay(day) = math.max(perDay(day), run)
    }
    assert(got.keySet == perDay.keySet)
    got.foreach { case (day, (mx, _, _)) => assert(mx == perDay(day), s"day $day") }
  }

  test("q100 windowed funnel counts match a per-user brute-force walk") {
    val row = Events.q100FunnelWindowed(spark, sf).head()
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val step = 72L * 3600L * 1000000L
    var (n1, n2, n3) = (0L, 0L, 0L)
    events.groupBy(_._1).foreach { case (_, evs) =>
      val t1 = evs.filter(_._2 == "signup").map(_._3).minOption
      val t2 = t1.flatMap(a => evs.filter(e =>
        e._2 == "click" && e._3 > a && e._3 <= a + step).map(_._3).minOption)
      val t3 = t2.flatMap(b => evs.filter(e =>
        e._2 == "purchase" && e._3 > b && e._3 <= b + step).map(_._3).minOption)
      if (t1.isDefined) n1 += 1
      if (t2.isDefined) n2 += 1
      if (t3.isDefined) n3 += 1
    }
    assert(row.getAs[Long]("n_signup") == n1)
    assert(row.getAs[Long]("n_click_72h") == n2)
    assert(row.getAs[Long]("n_purchase_72h") == n3)
    assert(n1 >= n2 && n2 >= n3, "funnel must be monotone")
    assert(row.getAs[Long]("s2_bp") == n2 * 10000L / n1)
    assert(row.getAs[Long]("s3_bp") == n3 * 10000L / n1)
  }

  test("q309 branching funnel matches a per-user brute-force walk; planted tie/expiry/order cases pin the contract") {
    val step = 72L * 3600L * 1000000L
    // corpus: brute-force the same three-stage branching walk
    val rows = Events.q309BranchingFunnel(spark, sf).collect()
      .map(r => r.getAs[String]("branch") -> r).toMap
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    var anchored = 0L
    val agg = scala.collection.mutable.Map(
      "click" -> (0L, 0L, 0L), "signup" -> (0L, 0L, 0L))
    events.groupBy(_._1).foreach { case (_, evs) =>
      val t1 = evs.filter(_._2 == "view").map(_._3).minOption
      if (t1.isDefined) anchored += 1
      val tc = t1.flatMap(a => evs.filter(e =>
        e._2 == "click" && e._3 > a && e._3 <= a + step).map(_._3).minOption)
      val tg = t1.flatMap(a => evs.filter(e =>
        e._2 == "signup" && e._3 > a && e._3 <= a + step).map(_._3).minOption)
      val t2 = (tc ++ tg).minOption
      t2.foreach { b =>
        val branch = if (tc.contains(b)) "click" else "signup"
        val t3 = evs.filter(e =>
          e._2 == "purchase" && e._3 > b && e._3 <= b + step).map(_._3).minOption
        val (n2, n3, lat) = agg(branch)
        agg(branch) = (n2 + 1, n3 + t3.size, lat + t3.map(_ - b).getOrElse(0L))
      }
    }
    Seq("click", "signup").foreach { b =>
      val (n2, n3, lat) = agg(b)
      val r = rows(b)
      assert(r.getAs[Long]("n_anchored") == anchored)
      assert(r.getAs[Long]("n_stage2") == n2, s"$b stage2")
      assert(r.getAs[Long]("n_purchase") == n3, s"$b purchase")
      def opt(n: String) = Option(r.getAs[Any](n)).map(_.asInstanceOf[Long])
      assert(opt("conv_bp") == (if (n2 > 0) Some(n3 * 10000 / n2) else None))
      assert(opt("mean_lat_s") ==
        (if (n3 > 0) Some(lat / n3 / 1000000L) else None), s"$b latency")
    }

    // planted: tie → click wins; out-of-window stage 2 anchors but does
    // not reach; purchase before stage 2 or past its window doesn't
    // convert; no anchor → invisible
    val s0 = spark
    import s0.implicits._
    val h = 3600L * 1000000L
    def ts(us: Long) = new java.sql.Timestamp(us / 1000L)
    val planted = Seq(
      (1L, "view", 0L), (1L, "click", h), (1L, "signup", 2 * h), (1L, "purchase", 3 * h),
      (2L, "view", 0L), (2L, "signup", h), (2L, "purchase", 2 * h),
      (3L, "view", 0L), (3L, "click", h), (3L, "signup", h), // exact tie
      (4L, "view", 0L), (4L, "click", 80L * h), // stage 2 past the 72h window
      (5L, "click", 0L), (5L, "purchase", h), // never anchored
      (6L, "view", 0L), (6L, "click", h), (6L, "purchase", 80L * h), // s3 expired
      (7L, "view", 0L), (7L, "purchase", h / 2), (7L, "signup", h) // s3 precedes s2
    ).map { case (u, t, us) => (u, t, ts(us)) }.toDF("user_id", "event_type", "ts")
    val p = Events.branchingFunnelOf(s0, planted).collect()
      .map(r => r.getAs[String]("branch") -> r).toMap
    assert(p("click").getAs[Long]("n_anchored") == 6L)
    assert(p("click").getAs[Long]("n_stage2") == 3L)   // users 1, 3, 6
    assert(p("click").getAs[Long]("n_purchase") == 1L) // user 1
    assert(p("click").getAs[Long]("conv_bp") == 3333L)
    assert(p("click").getAs[Long]("mean_lat_s") == 7200L) // 2h after the click
    assert(p("signup").getAs[Long]("n_stage2") == 2L)  // users 2, 7
    assert(p("signup").getAs[Long]("n_purchase") == 1L) // user 2 only
    assert(p("signup").getAs[Long]("conv_bp") == 5000L)
    assert(p("signup").getAs[Long]("mean_lat_s") == 3600L)
  }

  test("q98 snapshot diff labels exactly the synthesized added/removed/changed keys") {
    val df = Quality.q98SnapshotDiff(spark, sf).cache()
    val keys = Tables.orders(spark, sf).select(col("o_orderkey"))
      .collect().map(_.getLong(0))
    val added = keys.count(k => k % 83 == 0 && k % 89 != 0)
    val removed = keys.count(k => k % 89 == 0 && k % 83 != 0)
    val changed = keys.count(k => k % 97 == 0 && k % 83 != 0 && k % 89 != 0)
    val byStatus = df.groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.getOrElse("added", 0L) == added.toLong)
    assert(byStatus.getOrElse("removed", 0L) == removed.toLong)
    assert(byStatus.getOrElse("changed", 0L) == changed.toLong)
    assert(byStatus.keySet.subsetOf(Set("added", "removed", "changed")))
    // changed rows carry both prices, exactly 100 cents apart
    assert(df.filter(col("status") === "changed" &&
      (col("new_cents") =!= col("old_cents") + 100L)).count() == 0)
    df.unpersist()
  }

  test("q109 keeps exactly each user's latest event and drops tombstoned users") {
    val df = Analytics.q109UpsertLatest(spark, sf).cache()
    // one row per surviving user
    assert(df.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    // brute force: latest (ts, event_id) per user via a plain max-struct agg
    val latest = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("m"))
      .select(col("user_id"), col("m.event_type").as("t"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[String]("t")).toMap
    val got = df.select("user_id", "last_type").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("last_type")).toMap
    val expected = latest.filter(_._2 != "error")
    assert(got == expected.map { case (u, _) => u -> latest(u) },
      "survivors must be exactly the non-tombstoned users with their latest type")
    df.unpersist()
  }

  test("q110 point-in-time lookup: one row per purchase, state equals the as-of type") {
    val df = Analytics.q110PointInTime(spark, sf).cache()
    val nPurch = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(df.count() == nPurch,
      "interval join must match at most one version per probe")
    // brute force at the same ms granularity: state = type of the last
    // non-purchase event with ts_ms <= purchase ts_ms
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("unix_micros(ts) div 1000").as("ms"))
      .collect()
    val byUser = ev.groupBy(_.getAs[Long]("user_id"))
    df.collect().foreach { r =>
      val u = r.getAs[Long]("user_id")
      val pMs = r.getAs[Long]("ts_ms")
      val prior = byUser(u)
        .filter(e => e.getAs[String]("event_type") != "purchase" &&
          e.getAs[Long]("ms") <= pMs)
      val want =
        if (prior.isEmpty) null
        else prior.maxBy(e => (e.getAs[Long]("ms"), e.getAs[Long]("event_id")))
          .getAs[String]("event_type")
      assert(r.getAs[String]("state_type") == want,
        s"user $u purchase@$pMs: expected state $want")
    }
    df.unpersist()
  }

  test("q113 sequence pairs match a window-based brute force and exclude self-pairs") {
    val df = Analytics.q113SeqPairs(spark, sf).cache()
    assert(df.filter(col("type_a") === col("type_b")).count() == 0)
    // brute force with the oracle's row_number shape, in Spark
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val firsts = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"), col("event_id").as("eid"))
    val nTotal = Tables.events(spark, sf).select("user_id").distinct().count()
    val a = firsts.select(col("user_id"), col("event_type").as("type_a"),
      col("us").as("us_a"), col("eid").as("eid_a"))
    val b = firsts.select(col("user_id"), col("event_type").as("type_b"),
      col("us").as("us_b"), col("eid").as("eid_b"))
    val brute = a.join(b, Seq("user_id"))
      .filter(col("us_a") < col("us_b") ||
        (col("us_a") === col("us_b") && col("eid_a") < col("eid_b")))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_users"))
      .withColumn("support_bp", col("n_users") * 10000L / lit(nTotal))
      .withColumn("support_bp", expr("CAST(support_bp AS BIGINT)"))
    assert(df.exceptAll(brute).isEmpty && brute.exceptAll(df).isEmpty,
      "q113 must equal the brute-force first-occurrence pair counts")
    df.unpersist()
  }

  test("q112 seasonality cells partition the event count with consistent integer averages") {
    val df = Events.q112Seasonality(spark, sf).cache()
    val total = Tables.events(spark, sf).count()
    assert(df.agg(sum("n_events")).head().getLong(0) == total)
    assert(df.filter(col("dow7") < 0 || col("dow7") > 6 ||
      col("hod") < 0 || col("hod") > 23).count() == 0)
    assert(df.filter(col("avg_cents") * col("n_events") > col("total_cents") ||
      (col("avg_cents") + 1) * col("n_events") <= col("total_cents")).count() == 0,
      "avg_cents must be the floor of total/n")
    df.unpersist()
  }

  test("q116 nearest-station: every event assigned exactly once, stats consistent") {
    val rows = graft.operators.Geo.q116NearestZone(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total,
      "assignment must partition the event set")
    rows.foreach { r =>
      val id = r.getAs[Long]("station_id")
      assert(id >= 0 && id < 25)
      val (lo, av, hi) = (r.getAs[Long]("min_d2"), r.getAs[Long]("avg_d2"),
        r.getAs[Long]("max_d2"))
      assert(lo <= av && av <= hi && lo >= 0)
    }
  }

  test("q130 decomposition: effects reconcile to the exact delta within rounding") {
    val rows = Analytics.q130MixDecomposition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n1, n2) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"))
      val delta = r.getAs[Long]("delta_cents")
      assert(delta == r.getAs[Long]("rev2") - r.getAs[Long]("rev1"))
      if (n1 > 0 && n2 > 0) {
        val v = r.getAs[Double]("volume_effect_cents")
        val p = r.getAs[Double]("price_effect_cents")
        // vol + price = delta exactly in the reals; doubles rounded 2dp
        // may drift by a cent each
        assert(math.abs(v + p - delta) < 0.05,
          s"${r.getString(0)}: $v + $p != $delta")
      }
    }
  }

  test("q127 nearest-click equals a driver-side bidirectional nearest search with the tie rule") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us")).collect()
    val byUser = ev.groupBy(_.getAs[Long]("user_id"))
    val expect = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for ((u, es) <- byUser) {
      val sorted = es.sortBy(e => (e.getAs[Long]("us"), e.getAs[Long]("event_id")))
      for ((p, idx) <- sorted.zipWithIndex
           if p.getAs[String]("event_type") == "purchase") {
        val pUs = p.getAs[Long]("us")
        val prev = sorted.take(idx).reverse
          .find(_.getAs[String]("event_type") == "click")
        val next = sorted.drop(idx + 1)
          .find(_.getAs[String]("event_type") == "click")
        val cand = (prev, next) match {
          case (Some(a), Some(b)) =>
            if (pUs - a.getAs[Long]("us") <= b.getAs[Long]("us") - pUs) Some(a -> true)
            else Some(b -> false)
          case (Some(a), None) => Some(a -> true)
          case (None, Some(b)) => Some(b -> false)
          case _ => None
        }
        cand.foreach { case (c, isPrev) =>
          val dt = if (isPrev) -(pUs - c.getAs[Long]("us"))
            else c.getAs[Long]("us") - pUs
          if (math.abs(dt) <= 3600000000L)
            expect(p.getAs[Long]("event_id")) = (c.getAs[Long]("event_id"), dt)
        }
      }
    }
    val got = Events.q127NearestClick(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("click_event_id"), r.getAs[Long]("dt_us")))).toMap
    assert(got == expect.toMap)
  }

  test("q128 utilization reconciles with q20 sessions grouped by start day") {
    val sessions = Events.q20Sessionize(spark, sf)
      .select(col("user_id"), expr("unix_micros(sess_start)").as("s_us"),
        expr("unix_micros(sess_end)").as("e_us"))
      .collect()
    val expect = sessions
      .map { r =>
        val sUs = r.getAs[Long]("s_us")
        ((r.getAs[Long]("user_id"), sUs / 86400000000L),
          r.getAs[Long]("e_us") - sUs)
      }
      .groupBy(_._1).view
      .mapValues(ds => (ds.length.toLong, ds.map(_._2).sum)).toMap
    val rows = Events.q128Utilization(spark, sf).collect()
    val got = rows
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")) ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Long]("active_us")))).toMap
    assert(got == expect)
    rows.foreach { r =>
      val bp = r.getAs[Long]("util_bp")
      // NOT bounded by 10000: a session is owned by its START day, so a
      // midnight-spanning session can push a day past 24 h of active time
      assert(bp >= 0)
      assert(bp == r.getAs[Long]("active_us") * 10000 / 86400000000L)
    }
  }

  test("q117 conversion latency: ordered quartiles inside [min, max], count bounded by signups") {
    val r = Events.q117ConversionLatency(spark, sf).head()
    val n = r.getAs[Long]("n_converted")
    val nSignup = Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(n > 0 && n <= nSignup)
    val (mn, mx) = (r.getAs[Long]("min_us"), r.getAs[Long]("max_us"))
    val (p25, p50, p75) = (r.getAs[Double]("p25_us"), r.getAs[Double]("p50_us"),
      r.getAs[Double]("p75_us"))
    assert(mn > 0, "latency is strictly positive by the p_us > s_us filter")
    assert(mn <= p25 && p25 <= p50 && p50 <= p75 && p75 <= mx)
    val avg = r.getAs[Long]("avg_us")
    assert(avg >= mn && avg <= mx)
  }

  test("q136 sliding windows: every event in exactly 4 windows on the 15-min grid, via Expand not a join") {
    // plan shape first (before caching rewrites the lookup): the 4×
    // window membership must come from a single Expand feeding one
    // aggregate exchange — never a self-join or range join
    val p = Events.q136SlidingWindow(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("Expand"), "sliding window() must plan as Expand")
    assert(!p.toLowerCase.contains("join"), "sliding window must not join")
    val df = Events.q136SlidingWindow(spark, sf).cache()
    val ev = Tables.events(spark, sf)
    assert(df.agg(sum("n")).head().getLong(0) == 4L * ev.count(),
      "each event must land in exactly windowDuration/slide = 4 windows")
    assert(df.filter(expr("w_start_us % 900000000 != 0")).count() == 0,
      "window starts must sit on the 15-minute grid")
    // per event_type the sliding total is exactly 4× the plain count
    val bad = df.groupBy("event_type").agg(sum("n").as("n4"))
      .join(ev.groupBy("event_type").count(), "event_type")
      .filter(col("n4") =!= col("count") * 4)
    assert(bad.count() == 0)
    df.unpersist()
  }

  test("q137 stickiness: wau equals a brute-force trailing-7-day distinct and bounds hold") {
    val df = Analytics.q137Stickiness(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("dau") <= 0 || col("dau") > col("wau")).count() == 0,
      "0 < dau <= wau must hold on every reported day")
    assert(df.filter(col("stickiness_bp") <= 0 || col("stickiness_bp") > 10000)
      .count() == 0)
    // reported days are exactly the days with >= 1 event
    val ud = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .distinct().cache()
    val activeDays = ud.select("day").distinct()
    assert(df.select("day").exceptAll(activeDays).isEmpty &&
      activeDays.exceptAll(df.select("day")).isEmpty)
    // brute force the trailing window per reported day (test-scale range join)
    val brute = activeDays
      .join(ud.withColumnRenamed("day", "aday"),
        col("aday").between(col("day") - 6, col("day")))
      .groupBy("day").agg(countDistinct("user_id").as("wau_b"))
    assert(df.join(brute, "day").filter(col("wau") =!= col("wau_b")).count() == 0,
      "wau must equal the brute-force 7-day trailing distinct count")
    ud.unpersist(); df.unpersist()
  }

  test("q138 interval union equals a driver-side sweep-line merge per user") {
    val df = Events.q138IntervalUnion(spark, sf).cache()
    assert(df.count() > 0)
    // structural bounds: covered <= raw, overlap complements exactly,
    // covered at least the longest single interval
    assert(df.filter(col("covered_us") > col("raw_us") ||
      col("overlap_us") =!= col("raw_us") - col("covered_us") ||
      col("covered_us") <= 0).count() == 0)
    // brute force: classic sort-merge sweep on the driver
    val iv = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("s"),
        (expr("unix_micros(ts)") +
          expr("CAST(round(value * 100) AS BIGINT) * 10000")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val got = df.collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("covered_us")).toMap
    iv.foreach { case (uid, rows) =>
      var covered = 0L
      var curS = Long.MinValue; var curE = Long.MinValue
      rows.map(t => (t._2, t._3)).sortBy(identity).foreach { case (s0, e0) =>
        if (curE == Long.MinValue) { curS = s0; curE = e0 }
        else if (s0 > curE) { covered += curE - curS; curS = s0; curE = e0 }
        else if (e0 > curE) { curE = e0 }
      }
      if (curE != Long.MinValue) covered += curE - curS
      assert(got(uid) == covered, s"user $uid: union length mismatch")
    }
    df.unpersist()
  }

  test("q139 pareto: minimal prefix really is minimal and sufficient per segment") {
    val rows = Analytics.q139Pareto(spark, sf).collect()
    assert(rows.nonEmpty)
    val cust = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val seg = r.getString(0)
      val (nHalf, total) = (r.getAs[Long]("n_half"), r.getAs[Long]("revenue_cents"))
      val sorted = cust(seg).map(t => (-t._3, t._2)).sorted.map(-_._1)
      assert(r.getAs[Long]("n_customers") == sorted.length)
      assert(total == sorted.sum)
      val half = (total + 1) / 2
      val prefix = sorted.take(nHalf.toInt).sum
      assert(prefix >= half, s"$seg: prefix of $nHalf must reach half")
      if (nHalf > 1)
        assert(sorted.take(nHalf.toInt - 1).sum < half,
          s"$seg: prefix of ${nHalf - 1} must NOT reach half (minimality)")
      assert(r.getAs[Long]("half_share_bp") == nHalf * 10000 / sorted.length)
    }
  }

  test("q140 decay attribution: credit conserves to 10000 bp and tracks the dyadic weights") {
    val df = Events.q140DecayAttribution(spark, sf).cache()
    assert(df.count() > 0)
    // per purchase: exactly 10000 bp distributed
    assert(df.groupBy("p_event_id").agg(sum("credit_bp").as("s"))
      .filter(col("s") =!= 10000L).count() == 0)
    // weights are the four dyadic steps only
    assert(df.filter(!col("wt").isin(1L, 2L, 4L, 8L)).count() == 0)
    // largest-remainder: every credit within 1 bp of the exact real share
    val bad = df.withColumn("w_total",
        sum(col("wt")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("p_event_id"))))
      .filter(abs(col("credit_bp") -
        col("wt") * 10000.0 / col("w_total")) >= 1.0)
    assert(bad.count() == 0, "credit must be the floor or ceil of the exact share")
    // same candidate pair set as q85 (same join + window predicate)
    val p85 = Events.q85AttributionLinear(spark, sf)
      .select("p_event_id", "c_event_id")
    assert(df.select("p_event_id", "c_event_id").exceptAll(p85).isEmpty &&
      p85.exceptAll(df.select("p_event_id", "c_event_id")).isEmpty)
    df.unpersist()
  }

  test("q163 KM curve equals a driver-side estimator built from q20's sessions") {
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    val sess = SparkEntry.queries("q20_sessionize")(spark, sf).collect()
      .map(r => (us(r.getAs[java.sql.Timestamp]("sess_start")),
        us(r.getAs[java.sql.Timestamp]("sess_end"))))
    val maxUs = sess.map(_._2).max
    val durs = sess.map { case (a, b) =>
      ((b - a) / 60000000L, b < maxUs - 1800L * 1000000L) }
    def micro(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    var atRisk = durs.length.toLong
    var chaz = 0L
    val want = durs.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, g) =>
      val ended = g.count(_._2).toLong
      val row = {
        val term = if (ended > 0) micro(atRisk) - micro(math.max(atRisk - ended, 1L)) else 0L
        chaz += term
        (t, atRisk, ended, g.size - ended.toInt, chaz)
      }
      atRisk -= g.size
      row
    }
    val got = Analytics.q163Survival(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3).toInt, r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == want)
    // the curve must be non-degenerate: real hazard, real censoring, and
    // a strictly shrinking risk set
    assert(got.last._5 > 0, "no hazard accumulated")
    assert(got.map(_._4).sum > 0, "no censored session — boundary rule untested")
    assert(got.map(_._2) == got.map(_._2).sorted.reverse, "n_risk must be non-increasing")
  }

  test("q177 demand features: lags/windows/target recomputed; RANGE frames are gap-honest") {
    val rows = Analytics.q177DemandFeatures(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(rows.nonEmpty)
    val daily = rows.map { case ((t, d), r) => (t, d) -> r.getAs[Long]("n_events") }
    rows.foreach { case ((t, d), r) =>
      def at(off: Long): Option[Long] = daily.get((t, d + off))
      assert(Option(r.getAs[Any]("lag_1")).map(_.asInstanceOf[Long]) == at(-1), s"$t/$d lag_1")
      assert(Option(r.getAs[Any]("lag_7")).map(_.asInstanceOf[Long]) == at(-7), s"$t/$d lag_7")
      assert(Option(r.getAs[Any]("target_next")).map(_.asInstanceOf[Long]) == at(1), s"$t/$d target")
      val window = (-7L to -1L).flatMap(at)
      assert(r.getAs[Long]("trail7_days") == window.size.toLong, s"$t/$d trail days")
      if (window.nonEmpty)
        assert(r.getAs[Long]("trail7_sum") == window.sum, s"$t/$d trail sum")
      else assert(r.isNullAt(r.fieldIndex("trail7_sum")), s"$t/$d empty trail must be NULL")
      assert(r.getAs[Long]("dow7") == ((d + 4) % 7 + 7) % 7)
    }
    // the label horizon: every series' last day has a NULL target
    rows.keys.groupBy(_._1).foreach { case (t, ks) =>
      val last = ks.map(_._2).max
      assert(rows((t, last)).isNullAt(rows((t, last)).fieldIndex("target_next")),
        s"$t horizon target must be NULL")
    }
  }

  test("q181 STL-lite: components reconstruct the series; seasonal means sum near zero") {
    val rows = Analytics.q181StlDecompose(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the identity the decomposition promises: n*1e6 = trend + seasonal + residual
      assert(r.getAs[Long]("n_events") * 1000000L ==
        r.getAs[Long]("trend_micro") + r.getAs[Long]("seasonal_micro") +
          r.getAs[Long]("residual_micro"))
    }
    // seasonal is a mean of detrended values, so per (type, dow) the
    // residuals (detrended - seasonal) must average to ~0 (rounding slack)
    rows.groupBy(r => (r.getString(0), r.getAs[Long]("dow7"))).foreach { case (k, rs) =>
      val meanResid = rs.map(_.getAs[Long]("residual_micro")).sum.toDouble / rs.size
      assert(math.abs(meanResid) <= 1.0, s"$k mean residual $meanResid")
    }
    // the trend is smoother than the raw series (it is a moving average)
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      val s2 = rs.sortBy(_.getAs[Long]("day"))
      def var2(xs: Seq[Double]): Double = {
        val m = xs.sum / xs.size; xs.map(x => (x - m) * (x - m)).sum / xs.size }
      val rawVar = var2(s2.map(_.getAs[Long]("n_events").toDouble * 1e6))
      val trendVar = var2(s2.map(_.getAs[Long]("trend_micro").toDouble))
      assert(trendVar <= rawVar, s"$t trend rougher than raw")
    }
  }

  test("q182 backtest: scores recomputed from daily counts; lag-missing days excluded") {
    val rows = Analytics.q182ForecastBacktest(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => r.getLong(1) -> r.getLong(2)).toMap).toMap
    daily.foreach { case (t, byDay) =>
      val scored = byDay.keys.toSeq.filter(d =>
        byDay.contains(d - 7) && byDay.contains(d - 1)).sorted
      if (scored.isEmpty) assert(!rows.contains(t))
      else {
        val r = rows(t)
        val ae7 = scored.map(d => math.abs(byDay(d) - byDay(d - 7))).sum
        val ae1 = scored.map(d => math.abs(byDay(d) - byDay(d - 1))).sum
        val den7 = scored.map(d => byDay(d) + byDay(d - 7)).sum
        assert(r.getAs[Long]("n_days_scored") == scored.size.toLong, s"$t scored")
        assert(r.getAs[Long]("mae7_micro") == math.round(1e6 * ae7.toDouble / scored.size))
        assert(r.getAs[Long]("mae1_micro") == math.round(1e6 * ae1.toDouble / scored.size))
        assert(r.getAs[Long]("smape7_bp") == math.round(1e4 * ae7.toDouble / den7))
        if (ae1 > 0)
          assert(r.getAs[Long]("skill_bp") ==
            math.round(1e4 * (1.0 - ae7.toDouble / ae1)))
      }
    }
  }

  test("q183 cohort LTV: monotone curves, age-0 covers the cohort, totals reconcile") {
    val rows = Analytics.q183CohortLtv(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[Long]("cohort_month"))
    byCohort.foreach { case (c, rs) =>
      val s2 = rs.sortBy(_.getAs[Long]("age"))
      // age 0 exists and its active count IS the cohort size (first order month)
      assert(s2.head.getAs[Long]("age") == 0L, s"cohort $c missing age 0")
      assert(s2.head.getAs[Long]("n_active") == s2.head.getAs[Long]("cohort_n"),
        s"cohort $c age-0 actives != cohort size")
      // LTV is cumulative revenue over a constant divisor: non-decreasing
      s2.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(1).getAs[Long]("ltv_cents_per_cust") >= w(0).getAs[Long]("ltv_cents_per_cust"),
          s"cohort $c LTV decreased")
      }
    }
    // every order's revenue lands in exactly one cell: totals reconcile
    val totalRev = rows.map(_.getAs[Long]("rev_cents")).sum
    val expect = Tables.orders(spark, sf)
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))).head().getLong(0)
    assert(totalRev == expect, s"revenue $totalRev != $expect")
    // cohort sizes partition the customer base
    val sizes = rows.map(r => r.getAs[Long]("cohort_month") -> r.getAs[Long]("cohort_n")).toMap
    assert(sizes.values.sum == Tables.orders(spark, sf)
      .select("o_custkey").distinct().count())
  }

  test("q243 return curve equals a driver-side activity-set recompute; gap-honest denominators") {
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = ud.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val got = Events.q243ReturnCurve(spark, sf).collect()
      .map(r => r.getAs[Long]("lag") -> ((r.getAs[Long]("n_day_pairs"),
        r.getAs[Long]("n_at_risk"), r.getAs[Long]("n_returned"),
        Option(r.getAs[Any]("return_bp")).map(_.asInstanceOf[Long])))).toMap
    assert(got.keySet == (1L to 14L).toSet)
    for (k <- 1L to 14L) {
      val ts = byDay.keys.filter(d => byDay.contains(d + k)).toSeq
      val atRisk = ts.map(t => byDay(t).size.toLong).sum
      val returned = ts.map(t => (byDay(t) intersect byDay(t + k)).size.toLong).sum
      val bp = if (atRisk > 0) Some(returned * 10000L / atRisk) else None
      assert(got(k) == ((ts.length.toLong, atRisk, returned, bp)), s"lag $k: ${got(k)}")
    }
    // the synthetic stream has real repeat users: some lag shows returns
    assert(got.values.exists(_._3 > 0L))
  }

  test("q242 split balance equals a driver-side coin recompute; shares cover each source") {
    import java.security.MessageDigest
    def coin(id: Long): Int = {
      val h = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      ((h(0) & 0xf0) >> 4) * 16 + (h(0) & 0x0f)
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text").collect()
      .map(r => (r.getString(1), coin(r.getLong(0)) >= 230,
        r.getString(2).split(" ", -1).count(_.nonEmpty).toLong))
    val gn = docs.length.toLong
    val gt = docs.count(_._2).toLong
    val p = gt.toDouble / gn.toDouble
    val ref = docs.groupBy(_._1).map { case (src, rows) =>
      val n = rows.length.toLong
      val nTest = rows.count(_._2).toLong
      val tok = rows.map(_._3).sum
      val tokTest = rows.filter(_._2).map(_._3).sum
      val z =
        if (gt > 0 && gt < gn)
          Some(BigDecimal((nTest.toDouble - n.toDouble * p) /
            math.sqrt(n.toDouble * p * (1.0 - p)))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        else None
      src -> ((n, nTest, nTest * 10000L / n,
        if (tok > 0) Some(tokTest * 10000L / tok) else None,
        gt * 10000L / gn, z))
    }
    val rows = graft.operators.TextAnalysis.q242SplitBalance(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_test"), r.getAs[Long]("test_bp"),
        Option(r.getAs[Any]("test_tokens_bp")).map(_.asInstanceOf[Long]),
        r.getAs[Long]("corpus_test_bp"),
        Option(r.getAs[Any]("z_score")).map(_.asInstanceOf[Double])))).toMap
    assert(rows == ref, s"got $rows\nref $ref")
    // the audit is live: every source rows, and the test split is real
    // (nonempty and not the whole corpus)
    assert(rows.keySet == docs.map(_._1).toSet && gt > 0 && gt < gn)
    // planted all-empty-text source: its token share must NULL (not
    // crash, not drop the row) while its doc-side columns stay live
    import TestSpark.spark.implicits._
    val planted = ((1L to 40L).map(i => (i, "empty", "")) ++
        (41L to 80L).map(i => (i, "full", "alpha beta gamma")))
      .toDF("doc_id", "source", "text")
    val pl = graft.operators.TextAnalysis.splitBalanceOf(planted).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"),
          Option(r.getAs[Any]("test_tokens_bp")).map(_.asInstanceOf[Long])))).toMap
    assert(pl("empty")._1 == 40L && pl("empty")._2.isEmpty, pl("empty").toString)
    assert(pl("full")._1 == 40L && pl("full")._2.isDefined, pl("full").toString)
  }

  test("q244 HHI equals a driver-side BigInt recompute; Herfindahl bounds hold") {
    val perCust = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "cents").collect()
      .map(r => (r.getString(0), BigInt(r.getLong(1))))
    val ref = perCust.groupBy(_._1).map { case (seg, rows) =>
      val s1 = rows.map(_._2).sum
      val s2 = rows.map(r => r._2 * r._2).sum
      seg -> ((rows.length.toLong, s1.toLong,
        BigDecimal(10000.0 * s2.toDouble / (s1.toDouble * s1.toDouble))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong,
        BigDecimal(100.0 * s1.toDouble * s1.toDouble / s2.toDouble)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    }
    val got = Analytics.q244Hhi(spark, sf).collect()
      .map(r => r.getAs[String]("mktsegment") -> ((r.getAs[Long]("n_customers"),
        r.getAs[Long]("revenue_cents"), r.getAs[Long]("hhi_x10000"),
        r.getAs[Long]("effective_n_x100")))).toMap
    assert(got == ref, s"got $got\nref $ref")
    // Herfindahl bounds: 10000/n <= HHI <= 10000 and effective n <= n;
    // on the near-uniform synthetic revenues the segments sit far from
    // monopoly (liveness: the verdict separates from the degenerate ends)
    got.foreach { case (seg, (n, _, hhi, effN)) =>
      assert(hhi >= 10000L / n && hhi <= 10000L, s"$seg hhi $hhi n $n")
      assert(effN <= n * 100L && effN >= 100L, s"$seg effN $effN")
    }
    assert(got.values.exists(v => v._3 < 2500L))
  }

  test("q246 ship lag equals a driver-side percentile recompute per priority") {
    val lags = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(min(expr("unix_micros(l_shipdate) div 86400000000")).as("ship_day"))
      .join(Tables.orders(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"),
        (col("ship_day") - expr("unix_micros(o_orderdate) div 86400000000"))
          .as("lag")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def pct(vs: Seq[Long], q: Double): Double = {
      val s0 = vs.sorted
      val idx = (s0.length - 1) * q
      val lo = idx.toInt
      if (lo + 1 >= s0.length) s0(lo).toDouble
      else s0(lo) + (idx - lo) * (s0(lo + 1) - s0(lo))
    }
    val ref = lags.groupBy(_._1).map { case (pr, rows) =>
      val vs = rows.map(_._2).toSeq
      pr -> ((vs.length.toLong,
        BigDecimal(pct(vs, 0.5) * 100)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong,
        BigDecimal(pct(vs, 0.9) * 100)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong,
        vs.max))
    }
    val got = Analytics.q246ShipLag(spark, sf).collect()
      .map(r => r.getAs[String]("priority") -> ((r.getAs[Long]("n_orders"),
        r.getAs[Long]("p50_x100"), r.getAs[Long]("p90_x100"),
        r.getAs[Long]("max_lag_days")))).toMap
    // the engine's interpolation vs the driver's may differ in the last
    // ulp before the x100 round
    assert(got.keySet == ref.keySet)
    got.foreach { case (pr, (n, p50, p90, mx)) =>
      val (rn, r50, r90, rmx) = ref(pr)
      assert(n == rn && mx == rmx, s"$pr sizes")
      assert(math.abs(p50 - r50) <= 1L, s"$pr p50 $p50 vs $r50")
      assert(math.abs(p90 - r90) <= 1L, s"$pr p90 $p90 vs $r90")
    }
    // every order with lineitems is represented exactly once
    assert(got.values.map(_._1).sum ==
      Tables.lineitem(spark, sf).select("l_orderkey").distinct().count())
  }

  test("q305 growth accounting: planted histories classify exactly; corpus identities hold") {
    val s = spark
    import s.implicits._
    // hand-built week sets per user (week 0 = 1970-01-01..07):
    //   u1: 0 1 2        — new@0, retained@1,2; churned@3
    //   u2: 0   2 3      — new@0, churned@1, resurrected@2, retained@3
    //   u3:     2        — new@2, churned@3
    //   u4: 0            — new@0, churned@1
    val weeks = Seq(1L -> 0L, 1L -> 1L, 1L -> 2L, 2L -> 0L, 2L -> 2L,
      2L -> 3L, 3L -> 2L, 4L -> 0L)
    val ev = weeks.map { case (u, wk) =>
      (u, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        wk * 7 * 86400 + 3600)))
    }.toDF("user_id", "ts")
    val got = graft.operators.Analytics.growthAccountingOf(ev).collect()
      .map(r => r.getAs[Long]("week") -> ((r.getAs[Long]("n_active"),
        r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
        r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned"),
        Option(r.getAs[Any]("quick_ratio_x100")).map(_.asInstanceOf[Long]))))
      .toMap
    //            active new retained resurrected churned quick
    assert(got(0L) == ((3L, 3L, 0L, 0L, 0L, None)), got(0L).toString)
    assert(got(1L) == ((1L, 0L, 1L, 0L, 2L, Some(0L))), got(1L).toString)
    assert(got(2L) == ((3L, 1L, 1L, 1L, 0L, None)), got(2L).toString)
    assert(got(3L) == ((1L, 0L, 1L, 0L, 2L, Some(0L))), got(3L).toString)
    // u1/u3 active in the final week are NOT assessed for churn (week 4
    // is outside the observed grid) — the grid ends at week 3
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    // corpus: the two accounting identities over the real events table
    val rows = graft.operators.Analytics.q305GrowthAccounting(spark, sf)
      .collect().map(r => r.getAs[Long]("week") -> ((r.getAs[Long]("n_active"),
        r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
        r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned"))))
      .sortBy(_._1)
    rows.foreach { case (wk, (a, n, rt, rs, _)) =>
      assert(a == n + rt + rs, s"week $wk: active != new+retained+resurrected")
    }
    rows.sliding(2).foreach {
      case Array((_, (aPrev, _, _, _, _)), (wk, (_, _, rt, _, ch))) =>
        assert(aPrev == rt + ch, s"week $wk: active(w-1) != retained+churned")
      case _ =>
    }
    // total new across all weeks = distinct users in the corpus
    assert(rows.map(_._2._2).sum ==
      Tables.events(spark, sf).select("user_id").distinct().count())
  }

  test("q302 supplier reliability equals a driver recompute; planted laggard/fast/ok verdicts") {
    // corpus: per-supplier stats + pooled z recomputed driver-side
    val lags = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select(col("l_suppkey"),
        (expr("unix_micros(l_shipdate) div 86400000000")
          - expr("unix_micros(o_orderdate) div 86400000000")).as("lag"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def pct(vs: Seq[Long], q: Double): Double = {
      val s0 = vs.sorted
      val idx = (s0.length - 1) * q
      val lo = idx.toInt
      if (lo + 1 >= s0.length) s0(lo).toDouble
      else s0(lo) + (idx - lo) * (s0(lo + 1) - s0(lo))
    }
    val nn = lags.length.toLong
    val tt = lags.count(_._2 > 30L).toLong
    def rnd(v: Double): Long =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val ref = lags.groupBy(_._1).map { case (sk, rows) =>
      val vs = rows.map(_._2).toSeq
      val (n, l) = (vs.length.toLong, vs.count(_ > 30L).toLong)
      val z = if (tt == 0 || tt == nn) 0L
        else rnd((BigInt(l) * nn - BigInt(n) * tt).toDouble
          / math.sqrt((BigInt(n) * tt * (nn - tt)).toDouble) * 1000)
      sk -> ((n, rnd(pct(vs, 0.5) * 100), rnd(pct(vs, 0.9) * 100),
        l * 10000 / n, z,
        if (z >= 1960) "laggard" else if (z <= -1960) "fast" else "ok"))
    }
    val got = Analytics.q302SupplierReliability(spark, sf).collect()
      .map(r => r.getAs[Long]("suppkey") -> ((r.getAs[Long]("n_lines"),
        r.getAs[Long]("p50_x100"), r.getAs[Long]("p90_x100"),
        r.getAs[Long]("late_bp"), r.getAs[Long]("z_x1000"),
        r.getAs[String]("verdict")))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (sk, (n, p50, p90, lb, z, v)) =>
      val (rn, r50, r90, rlb, rz, rv) = ref(sk)
      assert(n == rn && lb == rlb && v == rv, s"$sk census")
      // interpolation ulp on the x100 round; z ulp on the x1000 round
      assert(math.abs(p50 - r50) <= 1L, s"$sk p50 $p50 vs $r50")
      assert(math.abs(p90 - r90) <= 1L, s"$sk p90 $p90 vs $r90")
      assert(math.abs(z - rz) <= 1L, s"$sk z $z vs $rz")
    }
    // planted: supplier 1 ships everything late (laggard), supplier 2
    // everything same-day (fast), supplier 3 at the pooled rate (ok) —
    // sized so the pooled z clears ±1.96 on both tails
    val s = spark
    import s.implicits._
    val day0 = java.sql.Date.valueOf("2024-01-01")
    def d(off: Int) = new java.sql.Date(day0.getTime + off * 86400000L)
    val orders = (1 to 300).map(i => (i.toLong, day0)).toDF("o_orderkey", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    val li = ((1 to 100).map(i => (i.toLong, 1L, d(40))) ++      // all late
              (101 to 200).map(i => (i.toLong, 2L, d(0))) ++     // all on time
              (201 to 250).map(i => (i.toLong, 3L, d(40))) ++    // half late
              (251 to 300).map(i => (i.toLong, 3L, d(0))))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
    val p = Analytics.supplierReliabilityOf(li, orders).collect()
      .map(r => r.getAs[Long]("suppkey") ->
        ((r.getAs[Long]("late_bp"), r.getAs[String]("verdict")))).toMap
    assert(p(1L) == ((10000L, "laggard")), p(1L).toString)
    assert(p(2L) == ((0L, "fast")), p(2L).toString)
    assert(p(3L) == ((5000L, "ok")), p(3L).toString)
  }

  test("q310 matchRecognize: planted sequences pin greedy/backtracking/skip-past semantics") {
    val s0 = spark
    import s0.implicits._
    def ts(us: Long) = new java.sql.Timestamp(us / 1000L)
    def frame(rows: Seq[(Long, String, Long)]) =
      rows.zipWithIndex.map { case ((u, t, us), i) =>
        (u, t, ts(us), i.toLong) }
        .toDF("user_id", "event_type", "ts", "event_id")
    import graft.operators.Events.PatternStep
    val pat = Seq(PatternStep("start", "view", "one"),
      PatternStep("clicks", "click", "star"),
      PatternStep("buy", "purchase", "one"))
    val sec = 1000000L
    val planted = frame(Seq(
      // u1: view click click purchase → one match, n_clicks=2, span 3s
      (1L, "view", 0L), (1L, "click", sec), (1L, "click", 2 * sec), (1L, "purchase", 3 * sec),
      // u2: view purchase → zero-click match
      (2L, "view", 0L), (2L, "purchase", sec),
      // u3: view click error → no match (first non-click is not purchase)
      (3L, "view", 0L), (3L, "click", sec), (3L, "error", 2 * sec),
      // u4: view view purchase → the SECOND view matches (first view's
      // next non-click is a view)
      (4L, "view", 0L), (4L, "view", sec), (4L, "purchase", 2 * sec),
      // u5: two disjoint matches — skip past last row
      (5L, "view", 0L), (5L, "purchase", sec), (5L, "view", 2 * sec), (5L, "purchase", 3 * sec)))
    val got = graft.operators.Events.matchRecognize(planted, pat).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_event_id"),
        r.getAs[Long]("end_event_id"), r.getAs[Long]("n_clicks"),
        r.getAs[Long]("span_s"))).sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      (1L, 0L, 3L, 2L, 3L),
      (2L, 4L, 5L, 0L, 1L),
      (4L, 10L, 11L, 0L, 1L),
      (5L, 12L, 13L, 0L, 1L), (5L, 14L, 15L, 0L, 1L)), got.toString)

    // backtracking: (view)+ then ONE view over [view view] must back the
    // greedy plus off from 2 to 1 so the trailing one-step can consume
    val bt = frame(Seq((9L, "view", 0L), (9L, "view", sec)))
    val btPat = Seq(PatternStep("run", "view", "plus"),
      PatternStep("last", "view", "one"))
    val gotBt = graft.operators.Events.matchRecognize(bt, btPat).collect()
      .map(r => (r.getAs[Long]("start_event_id"), r.getAs[Long]("end_event_id"),
        r.getAs[Long]("n_run"))).toSeq
    assert(gotBt == Seq((0L, 1L, 1L)), gotBt.toString)

    // plus requires at least one: view purchase does NOT match view (click)+ purchase
    val plusPat = Seq(PatternStep("start", "view", "one"),
      PatternStep("clicks", "click", "plus"),
      PatternStep("buy", "purchase", "one"))
    assert(graft.operators.Events.matchRecognize(
      frame(Seq((8L, "view", 0L), (8L, "purchase", sec))), plusPat).count() == 0L)
    // and does match with one click in between
    assert(graft.operators.Events.matchRecognize(
      frame(Seq((8L, "view", 0L), (8L, "click", sec), (8L, "purchase", 2 * sec))),
      plusPat).count() == 1L)
  }

  test("q311 (click)+ purchase: maximal-run matches, run splitting never happens, per-user row cap is loud") {
    val s0 = spark
    import s0.implicits._
    def ts(us: Long) = new java.sql.Timestamp(us / 1000L)
    def frame(rows: Seq[(Long, String, Long)]) =
      rows.zipWithIndex.map { case ((u, t, us), i) =>
        (u, t, ts(us), i.toLong) }
        .toDF("user_id", "event_type", "ts", "event_id")
    import graft.operators.Events.PatternStep
    val pat = Seq(PatternStep("clicks", "click", "plus"),
      PatternStep("buy", "purchase", "one"))
    val sec = 1000000L
    val planted = frame(Seq(
      // u1: click click purchase → one match, whole run (n=2, span 2s)
      (1L, "click", 0L), (1L, "click", sec), (1L, "purchase", 2 * sec),
      // u2: click view purchase → no match (run not directly followed)
      (2L, "click", 0L), (2L, "view", sec), (2L, "purchase", 2 * sec),
      // u3: purchase purchase after a matched run → second purchase alone
      // does not match (no preceding click run)
      (3L, "click", 0L), (3L, "purchase", sec), (3L, "purchase", 2 * sec),
      // u4: two separated bursts → two disjoint matches
      (4L, "click", 0L), (4L, "purchase", sec),
      (4L, "click", 2 * sec), (4L, "click", 3 * sec), (4L, "purchase", 4 * sec)))
    val got = graft.operators.Events.matchRecognize(planted, pat).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_event_id"),
        r.getAs[Long]("end_event_id"), r.getAs[Long]("n_clicks"),
        r.getAs[Long]("span_s"))).sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      (1L, 0L, 2L, 2L, 2L),
      (3L, 6L, 7L, 1L, 1L),
      (4L, 9L, 10L, 1L, 1L), (4L, 11L, 13L, 2L, 2L)), got.toString)

    // the skew guard: a planted over-cap user throws with the conf named
    spark.conf.set("graft.match.maxUserRows", "10")
    try {
      val fat = frame((0 until 12).map(i => (7L, "click", i * sec)))
      val e = intercept[org.apache.spark.SparkException] {
        graft.operators.Events.matchRecognize(fat, pat).collect()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: chain(t.getCause)
      assert(chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains("graft.match.maxUserRows")), e.getMessage)
      // under the cap, unaffected
      assert(graft.operators.Events.matchRecognize(
        frame((0 until 9).map(i => (7L, "click", i * sec)) :+
          ((7L, "purchase", 9 * sec))), pat).count() == 1L)
    } finally spark.conf.unset("graft.match.maxUserRows")
  }
}
