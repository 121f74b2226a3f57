package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quality

/** q67's sketch accuracy, bounded against the exact q66 profile. */
class QualitySketchSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.01"

  test("sketch profile bounds: HLL within 5% of exact, median within 2%") {
    // raw sketch values off the one-pass sketch side (no longer published
    // by q67, which emits the exact profile + error-contract booleans)
    val sk = Quality.sketchProfileOf(Tables.lineitem(spark, dir))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Quality.q66Profile(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    for (c <- Seq("l_quantity", "l_discount", "l_extendedprice")) {
      val (approx, p50) = sk(c)
      val ex = exact(c)
      val relErr = math.abs(approx - ex).toDouble / ex
      assert(relErr <= 0.05, s"$c HLL error $relErr (approx=$approx exact=$ex)")
      val exactP50 = Tables.lineitem(spark, dir)
        .select(expr(s"percentile($c, 0.5)").cast("double")).head().getDouble(0)
      assert(math.abs(p50 - exactP50) <= 0.02 * math.max(math.abs(exactP50), 1.0),
        s"$c p50 sketch=$p50 exact=$exactP50")
    }
    // the published q67: exact columns equal q66's exact profile and every
    // error-contract boolean holds (the columns the oracle pins TRUE)
    val pub = Quality.q67SketchProfile(spark, dir).collect()
    assert(pub.length == 3)
    pub.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)),
        s"${r.getString(0)}: published n_distinct must be exact")
      assert(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6),
        s"${r.getString(0)}: a sketch violated its error contract")
    }
  }

  test("q96 weekly HLL union estimates track exact distincts within 5%") {
    // published shape: (type, week, n_days, n_events, exact_unique_users,
    // est_within_5pct) — exact columns vs a driver recompute, boolean true
    val got = Quality.q96HllRollup(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got.nonEmpty)
    val exact = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000 div 7").as("week"), col("user_id"))
      .groupBy("event_type", "week")
      .agg(countDistinct("user_id").as("d"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == exact.keySet, "every (type, week) cell present")
    got.foreach { case (k, (nEvents, exUnique, within)) =>
      val (ex, n) = exact(k)
      assert(nEvents == n, s"$k: event counts must be exact")
      assert(exUnique == ex, s"$k: published uniques must be exact")
      assert(within, s"$k: union estimate violated its 5% contract")
    }
    // the raw union estimates (no longer published): within 5% of exact
    // AND agreeing with sketching the week directly — the mergeability
    // property that lets persisted daily sketches answer arbitrary ranges
    val union = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .groupBy("event_type", "day")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .groupBy(col("event_type"), expr("day div 7").as("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000 div 7").as("week"), col("user_id"))
      .groupBy("event_type", "week")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    union.foreach { case (k, est) =>
      val (ex, _) = exact(k)
      // lgK=12 → rsd ≈ 1.6%; 5% is > 3σ
      assert(math.abs(est - ex).toDouble / math.max(ex, 1L) <= 0.05,
        s"$k: est=$est exact=$ex")
      val d = direct(k)
      assert(math.abs(est - d).toDouble / math.max(d, 1L) <= 0.05,
        s"$k: union=$est direct=$d")
    }
  }

  test("sketch profile is one pass: a single aggregate, no Expand") {
    // the 100 TB shape is the SKETCH side: one aggregate, one exchange
    val plan = Quality.sketchProfileOf(Tables.lineitem(spark, dir))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    // exactly one shuffle: the partial->final aggregate exchange
    assert("Exchange".r.findAllIn(plan).length <= 2, plan)
    // the published q67 adds the exact oracle gate (per-column narrow
    // passes) — still no Expand anywhere (the distinct-rewrite trap)
    val full = Quality.q67SketchProfile(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!full.contains("Expand"), full)
  }

  test("Bands.exactPercentiles is bit-equal to Spark percentile on corpus and planted frames") {
    import spark.implicits._
    val fracs = Seq(0.45, 0.5, 0.55, 0.9, 0.95, 0.99)
    def check(df: org.apache.spark.sql.DataFrame, key: String): Unit = {
      val got = graft.operators.Bands.exactPercentiles(df, key, fracs)
        .head().getSeq[Double](0)
      val want = df.agg(expr(
        s"percentile($key, array(${fracs.mkString("D,")}D))")).head().getSeq[Double](0)
      assert(got == want, s"$key: $got != $want")
    }
    // corpus columns: integer-ish domain, wide double domain
    val li = Tables.lineitem(spark, dir)
    check(li.select("l_quantity"), "l_quantity")
    check(li.select("l_extendedprice"), "l_extendedprice")
    // planted: heavy ties straddling would-be boundaries, short frames
    // (n smaller than the band count), constant frames
    check(Seq.fill(500)(7.0).toDF("v"), "v")
    check((Seq.fill(300)(1.0) ++ Seq.fill(300)(2.0)).toDF("v"), "v")
    check(Seq(3.0).toDF("v"), "v")
    check(Seq(1.0, 2.0, 4.0).toDF("v"), "v")
    check((1 to 100).map(_.toDouble).toDF("v"), "v")
  }

  test("Bands.exactPercentilesWeightedBy is bit-equal to weighted percentile, grouped") {
    import spark.implicits._
    val fracs = Seq(0.45, 0.5, 0.55, 0.9, 0.95, 0.99)
    def check(dom: org.apache.spark.sql.DataFrame): Unit = {
      val got = graft.operators.Bands
        .exactPercentilesWeightedBy(dom, "g", "v", "f", fracs)
        .collect().map(r => r.getAs[Any]("g") ->
          (r.getAs[Long]("n_rows"), r.getSeq[Double](r.fieldIndex("pcts")))).toMap
      val want = dom.groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          expr(s"percentile(v, array(${fracs.mkString("D,")}D), f)").as("p"))
        .collect().map(r => r.getAs[Any]("g") ->
          (r.getAs[Long]("n"), r.getSeq[Double](r.fieldIndex("p")))).toMap
      assert(got.keySet == want.keySet, s"groups: ${got.keySet} != ${want.keySet}")
      for (g <- want.keySet)
        assert(got(g) == want(g), s"group $g: ${got(g)} != ${want(g)}")
    }
    // the q67 corpus value domains, all three groups in one frame
    val cols = Seq("l_quantity", "l_discount", "l_extendedprice")
    check(Tables.lineitem(spark, dir)
      .select(posexplode(array(cols.map(col): _*)).as(Seq("g", "v")))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("f")))
    // planted: heavy weights on few values (rank arithmetic must follow
    // the WEIGHTED count), single-value groups, weight-1 ties of the
    // unweighted form, exact-integer rank positions (hi = lo short
    // circuit), and a group smaller than the band count
    check(Seq(
      (0, 7.0, 500L),                          // constant via one heavy row
      (1, 1.0, 300L), (1, 2.0, 300L),          // two heavy runs
      (2, 3.0, 1L),                            // singleton
      (3, 1.0, 1L), (3, 2.0, 1L), (3, 4.0, 1L) // tiny unweighted group
    ).toDF("g", "v", "f"))
    check((1 to 100).map(i => (0, i.toDouble, (i % 3 + 1).toLong)).toDF("g", "v", "f"))
  }

  test("q111 equi-depth deciles: sizes within 1, bounds monotone, counts reconcile") {
    val rows = Quality.q111EquidepthHist(spark, dir).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (0L until 10L),
      "exactly deciles 0..9")
    val total = Tables.orders(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == total)
    val sizes = rows.map(_.getAs[Long]("n_orders"))
    assert(sizes.max - sizes.min <= 1, s"equi-depth violated: ${sizes.mkString(",")}")
    // bucket value ranges never overlap (ties may touch the boundary)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi_cents") <= b.getAs[Long]("lo_cents"),
        "decile bounds must be non-decreasing")
    case _ => ()
    }
  }

  test("q111 plans the rank via band decomposition — no single-partition data window") {
    val plan = Quality.q111EquidepthHist(spark, dir)
      .queryExecution.executedPlan.toString
    // the only SinglePartition exchanges may feed the tiny band-counts
    // frame; the orders-scale window must partition by band
    assert(plan.contains("hashpartitioning(band"), plan)
  }

  test("q125 completeness gaps equal a driver-side grid difference") {
    import TestSpark.sf
    val present = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) DIV 3600000000").as("h"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val hours = present.map(_._2)
    val (lo, hi) = (hours.min, hours.max)
    val expect = present.map(_._1).flatMap { t =>
      (lo to hi).filterNot(h => present((t, h))).map(h => (t, h))
    }.groupBy { case (t, h) => (t, h / 24) }.map { case ((t, d), cells) =>
      val hs = cells.map(_._2 % 24)
      (t, d) -> ((cells.size.toLong, hs.min, hs.max))
    }
    val got = Quality.q125Completeness(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("day")) ->
        ((r.getAs[Long]("n_missing_hours"), r.getAs[Long]("first_missing_hour"),
          r.getAs[Long]("last_missing_hour")))).toMap
    assert(got == expect)
  }

  test("q126 robust outliers match a driver-side median/MAD computation") {
    import TestSpark.sf
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("c"))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def interp(xs: Array[Long], f: Double): Double = {
      val pos = f * (xs.length - 1)
      val (i, fr) = (pos.toInt, pos - pos.toInt)
      if (i + 1 < xs.length) xs(i) + fr * (xs(i + 1) - xs(i)) else xs(i).toDouble
    }
    val rows = Quality.q126RobustOutliers(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == byType.keySet)
    rows.foreach { r =>
      val xs = byType(r.getString(0))
      val med = interp(xs, 0.5)
      val mad = interp(xs.map(x => math.abs(x - med))
        .map(d => math.round(d * 2)).sorted.map(_.toLong), 0.5) / 2.0
      assert(math.abs(r.getAs[Double]("median_cents") - med) < 1e-6)
      assert(math.abs(r.getAs[Double]("mad_cents") - mad) < 1e-6,
        s"${r.getString(0)}: mad ${r.getAs[Double]("mad_cents")} vs $mad")
      val outliers = xs.count(x => math.abs(x - med) > 3 * 1.4826 * mad)
      assert(r.getAs[Long]("n_outliers") == outliers)
      assert(r.getAs[Long]("n_events") == xs.length)
    }
  }

  test("schemaDiff reports added/removed/type/nullability drift and nothing else") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.types._
    val old = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("gone", StringType),
        StructField("widened", IntegerType),
        StructField("relaxed", StringType, nullable = false),
        StructField("both", IntegerType, nullable = false),
        StructField("same", DoubleType))))
    val nw = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("fresh", StringType),
        StructField("widened", LongType),
        StructField("relaxed", StringType, nullable = true),
        StructField("both", LongType, nullable = true),
        StructField("same", DoubleType))))
    val got = Quality.schemaDiff(old, nw)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // a column with BOTH drifts reports both rows, not just the type one
    assert(got == Set(("fresh", "added"), ("gone", "removed"),
      ("widened", "type_changed"), ("relaxed", "nullability_changed"),
      ("both", "type_changed"), ("both", "nullability_changed")))
    // identical schemas diff to empty
    assert(Quality.schemaDiff(old, old).isEmpty)
  }

  test("q141 ref integrity: clean schema audits clean; synthetic orphans counted exactly") {
    val sf = TestSpark.sf
    // the driver's synthetic star schema is referentially clean: the audit
    // must say so (7 edges, all zeros), with child_rows = table counts
    val clean = Quality.q141RefIntegrity(spark, sf).collect()
    assert(clean.length == 7)
    clean.foreach { r =>
      assert(r.getAs[Long]("orphan_rows") == 0L &&
        r.getAs[Long]("null_fk_rows") == 0L && r.getAs[Long]("orphan_bp") == 0L,
        s"${r.getString(0)} must audit clean")
    }
    val liRows = Tables.lineitem(spark, sf).count()
    assert(clean.filter(_.getString(0).startsWith("lineitem."))
      .forall(_.getAs[Long]("child_rows") == liRows))
    // corrupt a COPY: drop nations >= 13 → customer/supplier edges orphaned
    val tmp = java.nio.file.Files.createTempDirectory("graft_q141").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = spark.read.parquet(s"$sf/$t.parquet")
      (if (t == "nation") df.filter(col("n_nationkey") < 13) else df)
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    val expCust = Tables.customer(spark, sf)
      .filter(col("c_nationkey") >= 13).count()
    val expSupp = Tables.supplier(spark, sf)
      .filter(col("s_nationkey") >= 13).count()
    val dirty = Quality.q141RefIntegrity(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(dirty("customer.c_nationkey->nation").getAs[Long]("orphan_rows") == expCust)
    assert(dirty("supplier.s_nationkey->nation").getAs[Long]("orphan_rows") == expSupp)
    val custRows = dirty("customer.c_nationkey->nation").getAs[Long]("child_rows")
    assert(dirty("customer.c_nationkey->nation").getAs[Long]("orphan_bp") ==
      expCust * 10000 / custRows)
    // untouched edges stay clean in the dirty copy
    assert(dirty("lineitem.l_orderkey->orders").getAs[Long]("orphan_rows") == 0L)
  }

  test("q147 expectations: clean data passes; planted violations counted exactly; NULL predicate = violation") {
    val sf = TestSpark.sf
    val clean = Quality.q147Expectations(spark, sf).collect()
    assert(clean.length == Quality.expectations.length)
    clean.foreach { r =>
      assert(r.getAs[Boolean]("pass") && r.getAs[Long]("n_violations") == 0L,
        s"rule ${r.getString(0)} must pass on the driver's clean data")
    }
    // corrupt a COPY: discount pushed out of domain on 5 rows, shipdate
    // nulled on 3 — each rule must count ITS planted rows and nothing else
    val tmp = java.nio.file.Files.createTempDirectory("graft_q147").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val hitDiscount = col("l_orderkey") % 7 === 0 && col("l_linenumber") % 2 === 0
    val hitShip = col("l_orderkey") % 7 === 3
    li.withColumn("l_discount", when(hitDiscount, lit(0.9)).otherwise(col("l_discount")))
      .withColumn("l_shipdate", when(hitShip, lit(null)).otherwise(col("l_shipdate")))
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val expDiscount = li.filter(hitDiscount).count()
    val expShip = li.filter(hitShip).count()
    assert(expDiscount > 0 && expShip > 0)
    val dirty = Quality.q147Expectations(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(dirty("discount_domain").getAs[Long]("n_violations") == expDiscount)
    assert(!dirty("discount_domain").getAs[Boolean]("pass"))
    // a NULL shipdate makes `IS NOT NULL` false — counted as violation —
    // and the nulls must NOT leak into unrelated rules
    assert(dirty("shipdate_present").getAs[Long]("n_violations") == expShip)
    assert(dirty("quantity_range").getAs[Long]("n_violations") == 0L)
    assert(dirty("price_positive").getAs[Boolean]("pass"))
  }

  test("q276 triangles equal a driver-side census; handshake and range invariants hold") {
    val und = graft.operators.Graph.nationEdges(spark, TestSpark.sf)
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val nbrs = (und.map(_._1) ++ und.map(_._2)).map { n =>
      n -> und.collect { case (a, b) if a == n => b; case (a, b) if b == n => a }
    }.toMap
    val triOf = nbrs.map { case (n, ns) =>
      n -> ns.toSeq.combinations(2).count { case Seq(x, y) =>
        und((x min y, x max y)) }.toLong
    }
    val names = Tables.nation(spark, TestSpark.sf)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val got = graft.operators.Graph.q276TradeTriangles(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.getAs[Any]("clustering_x10000")).map(_.asInstanceOf[Long])))
    assert(got.map(_._1).toSet == nbrs.keySet.map(names))
    got.foreach { case (name, deg, tri, cc) =>
      val key = names.collectFirst { case (k, v) if v == name => k }.get
      assert(deg == nbrs(key).size.toLong, s"$name degree")
      assert(tri == triOf(key), s"$name triangles")
      if (deg >= 2) {
        assert(cc.contains(tri * 2 * 10000 / (deg * (deg - 1))), s"$name cc")
        assert(cc.get >= 0 && cc.get <= 10000)
      } else assert(cc.isEmpty)
    }
    // handshake: every triangle is counted at exactly its 3 corners
    assert(got.map(_._3).sum % 3 == 0)
  }

  test("q308 trade routes equal a driver-side bounded Bellman-Ford; planted reroute and hop-bound graphs pin the contract") {
    val sfDir = TestSpark.sf
    // driver recompute: collect the lane frame (≤ |nations|² rows), run
    // the same ≤4-lane min-(cost, hops) DP in plain Scala
    val laneRows = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"),
        (expr("unix_micros(l_shipdate) div 86400000000")
          - expr("unix_micros(o_orderdate) div 86400000000")).as("lag"))
      .join(Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_nationkey").as("src")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir).select(col("s_suppkey"), col("s_nationkey").as("dst")),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(expr("CAST(sum(lag) AS BIGINT) DIV count(1)").as("cost"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    def dp(lanes: Map[(Int, Int), Long]): Map[(Int, Int), (Long, Long)] = {
      val best = scala.collection.mutable.Map.empty[(Int, Int), (Long, Long)]
      def upd(k: (Int, Int), c: Long, h: Long): Unit = best.get(k) match {
        case Some((bc, bh)) if bc < c || (bc == c && bh <= h) => ()
        case _ => best(k) = (c, h)
      }
      var frontier = lanes
      frontier.foreach { case (k, c) => upd(k, c, 1L) }
      for (h <- 2 to 4) {
        val next = scala.collection.mutable.Map.empty[(Int, Int), Long]
        for (((a, m), c) <- frontier; (((m2, b), lc)) <- lanes
             if m2 == m && b != a) {
          val k = (a, b); val nc = c + lc
          if (!next.contains(k) || next(k) > nc) next(k) = nc
        }
        next.foreach { case (k, c) => upd(k, c, h.toLong) }
        frontier = next.toMap
      }
      best.toMap
    }
    val names = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val want = dp(laneRows).map { case ((a, b), (c, h)) =>
      val direct = laneRows.get((a, b))
      (names(a), names(b)) -> ((direct, c, h,
        direct.filter(_ > 0).map(d => (d - c) * 10000 / d)))
    }
    val got = graft.operators.Graph.q308TradeRoutes(spark, sfDir).collect()
      .map { r =>
        def opt(n: String) = Option(r.getAs[Any](n)).map(_.asInstanceOf[Long])
        (r.getString(0), r.getString(1)) -> ((opt("direct_cost"),
          r.getAs[Long]("best_cost"), r.getAs[Long]("best_hops"),
          opt("saving_bp")))
      }.toMap
    assert(got == want, s"${(got.toSet -- want.toSet).take(3)} vs ${(want.toSet -- got.toSet).take(3)}")
    // identities: best never beats nothing — best_cost ≤ direct where a
    // direct lane exists; hops in 1..4; savings non-negative
    got.values.foreach { case (direct, bc, bh, saving) =>
      direct.foreach(d => assert(bc <= d))
      assert(bh >= 1L && bh <= 4L)
      saving.foreach(s0 => assert(s0 >= 0L))
    }

    // planted reroute: A→B direct 10, but A→C(2)→B(3) = 5 → 50% saving
    val s0 = spark
    import s0.implicits._
    val planted = Seq((0, 1, 10L), (0, 2, 2L), (2, 1, 3L)).toDF("src", "dst", "cost")
    val p = graft.operators.Graph.tradeRoutesOfLanes(planted).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((Option(r.getAs[Any]("direct_cost")),
        r.getAs[Long]("best_cost"), r.getAs[Long]("best_hops"),
        Option(r.getAs[Any]("saving_bp"))))).toMap
    assert(p((0, 1)) == ((Some(10L), 5L, 2L, Some(5000L))), p((0, 1)).toString)
    assert(p((0, 2)) == ((Some(2L), 2L, 1L, Some(0L))))
    assert(p((2, 1)) == ((Some(3L), 3L, 1L, Some(0L))))
    // hop-bound contract: a cheaper 5-lane chain is NOT taken (≤4 lanes);
    // the 4-lane prefix IS
    val chain = Seq((10, 11, 1L), (11, 12, 1L), (12, 13, 1L), (13, 14, 1L),
      (14, 15, 1L), (10, 15, 100L)).toDF("src", "dst", "cost")
    val c = graft.operators.Graph.tradeRoutesOfLanes(chain).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getAs[Long]("best_cost"),
        r.getAs[Long]("best_hops")))).toMap
    assert(c((10, 15)) == ((100L, 1L)), s"5-lane route must be outside the bound: ${c((10, 15))}")
    assert(c((10, 14)) == ((4L, 4L)))
  }

  test("nationEdges memo: one fact pass per (session, dir) serves all four graph queries; invalidation retrains") {
    val sf = TestSpark.sf
    // same session + dir → the SAME checkpointed frame object (reuse is a
    // block read, not a fact-scale recompute — the r16 Missing #3 fix)
    val a = graft.operators.Graph.nationEdges(spark, sf)
    val b = graft.operators.Graph.nationEdges(spark, sf)
    assert(a eq b, "memo must return the identical cached frame")
    // the memoized frame equals a fresh uncached build, row for row
    val cached = a.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val fresh = graft.operators.Graph.nationEdgesUncached(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(cached == fresh)
    // invalidation drops the entry: the next call builds a NEW frame
    graft.operators.Graph.invalidateNationEdgesCache()
    val c = graft.operators.Graph.nationEdges(spark, sf)
    assert(!(c eq a), "invalidate must force a rebuild")
    assert(c.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap == fresh)
  }

  test("nationLanes: q308's lane costs off the shared memo equal a standalone lineitem⋈orders lag fold") {
    val sf = TestSpark.sf
    // the pre-r18 q308 shape, rebuilt verbatim: its OWN fact pass
    val cust = Tables.customer(spark, sf).select(col("c_custkey"), col("c_nationkey").as("src"))
    val supp = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_nationkey").as("dst"))
    val standalone = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"),
        (expr("unix_micros(l_shipdate) div 86400000000")
          - expr("unix_micros(o_orderdate) div 86400000000")).as("lag_days"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(expr("CAST(sum(lag_days) AS BIGINT) DIV count(1)").as("cost"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val shared = graft.operators.Graph.nationLanes(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(shared == standalone,
      "the fused fold's lane costs must equal the dedicated pass exactly")
  }

  test("q146 pagerank: plan output equals a driver-side replay of the integer iteration") {
    val sf = TestSpark.sf
    val got = graft.operators.Graph.q146PagerankNations(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    // rebuild the tiny nation graph driver-side and replay the exact
    // integer recurrence — proves the distributed join chain computes the
    // declared fixed-point steps (the DuckDB oracle proves cross-engine)
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
      .collect().map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap
    val supp = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey")
      .collect().map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap
    val pairs = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey", "l_suppkey").distinct()
      .collect().map(r => (cust(r.getLong(0)), supp(r.getLong(1))))
    val w = pairs.groupBy(identity).map { case ((s0, d), xs) => (s0, d) -> xs.length.toLong }
    val wout = w.groupBy(_._1._1).map { case (s0, es) => s0 -> es.values.sum }
    val nodes = (w.keys.map(_._1) ++ w.keys.map(_._2)).toSet
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val inflow = w.toSeq.map { case ((s0, d), wt) => d -> (rank(s0) * wt / wout(s0)) }
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      rank = nodes.map(n => n -> (150000L + 85L * inflow.getOrElse(n, 0L) / 100L)).toMap
    }
    val names = Tables.nation(spark, sf).select("n_nationkey", "n_name")
      .collect().map(r => r.getAs[Number](0).longValue() -> r.getString(1)).toMap
    val want = rank.map { case (n, v) => names(n) -> v }
    assert(got == want)
  }

  test("q123 calendar rollup reconciles across granularities with floor-exact shares") {
    val rows = graft.operators.Analytics.q123CalendarRollup(spark, TestSpark.sf)
      .collect()
    def cents(gid: Int) = rows.filter(_.getAs[Int]("gid") == gid)
      .map(_.getAs[Long]("revenue_cents")).sum
    assert(cents(0) == cents(1) && cents(1) == cents(3) && cents(3) == cents(7),
      "detail, quarter, year and grand-total levels must carry identical revenue")
    // each year's month shares floor-sum to within 12 bp of 10000
    rows.filter(r => r.getAs[Int]("gid") == 0)
      .groupBy(_.getAs[Long]("y")).foreach { case (_, months) =>
        val s = months.map(_.getAs[Long]("share_of_year_bp")).sum
        assert(s <= 10000 && s > 10000 - 12, s"year shares sum to $s")
      }
    // non-detail rows carry no share
    assert(rows.filter(r => r.getAs[Int]("gid") != 0)
      .forall(r => r.isNullAt(r.fieldIndex("share_of_year_bp"))))
  }

  test("q145 range percentiles from merged daily KLL sketches stay within rank-error bounds") {
    // published shape (r15): exact interpolated percentiles + rank-band
    // booleans. Exact columns vs a driver brute force; booleans all true;
    // the raw KLL-served values (no longer published) re-derived off the
    // same rollup and rank-checked at the old 3% bound.
    val got = Quality.q145RollupQuantiles(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3),
          Seq(r.getDouble(4), r.getDouble(5), r.getDouble(6)),
          Seq(r.getBoolean(7), r.getBoolean(8), r.getBoolean(9)))))
      .toMap
    assert(got.nonEmpty)
    val targets = Seq(0.5, 0.9, 0.99)
    // raw KLL values off the same rollup + range (the serving path)
    val rollup = Quality.dailyRollup(Tables.events(spark, dir))
    val b = rollup.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(expr("d0 + (d1 - d0) / 3").as("lo"), expr("d1 - (d1 - d0) / 3").as("hi"))
      .head()
    val served = rollup
      .filter(col("day").between(b.getDouble(0), b.getDouble(1)))
      .groupBy(col("event_type"))
      .agg(expr("kll_merge_agg_bigint(cents_sketch)").as("sk"))
      .select(col("event_type"),
        expr("kll_sketch_get_quantile_bigint(sk, 0.5)"),
        expr("kll_sketch_get_quantile_bigint(sk, 0.9)"),
        expr("kll_sketch_get_quantile_bigint(sk, 0.99)"))
      .collect()
      .map(r => r.getString(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    got.foreach { case (tpe, (dayLo, dayHi, exactPcts, bands)) =>
      assert(bands.forall(identity), s"$tpe: a KLL quantile left its rank band")
      // the exact values of the SAME range, straight off the events
      val cents = Tables.events(spark, dir)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .filter(col("event_type") === tpe &&
          col("day").between(dayLo, dayHi))
        .select("cents").collect().map(_.getLong(0)).sorted
      val n = cents.length
      assert(n > 0)
      // published percentiles are the exact interpolated ones
      targets.zip(exactPcts).foreach { case (q, v) =>
        val r = q * (n - 1)
        val (i, f) = (r.toInt, r - r.toInt)
        val want = cents(i) + (cents(math.min(i + 1, n - 1)) - cents(i)) * f
        // published value is round(want, 4); allow the half-ulp of that
        // rounding rather than re-deriving Spark's HALF_UP mode
        assert(math.abs(v - want) <= 5e-5 + 1e-9,
          s"$tpe p$q published=$v exact=$want")
      }
      targets.zip(served(tpe)).foreach { case (q, v) =>
        // KLL k=200 → normalized rank error ~1.65%; assert the returned
        // VALUE's rank is within 3% of the target rank (≈ 2σ headroom)
        val below = cents.count(_ < v)
        val atOrBelow = cents.count(_ <= v)
        val lo = below.toDouble / n
        val hi = atOrBelow.toDouble / n
        assert(q >= lo - 0.03 && q <= hi + 0.03,
          s"$tpe p$q=$v has rank [$lo, $hi] over n=$n")
      }
    }
  }

  test("q165 bot cadence equals a driver brute force; the bar splits the users") {
    val got = graft.operators.Quality.q165BotCadence(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[Boolean]("suspicious")))).toMap
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    val want = Tables.events(spark, sf).select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), us(r.getTimestamp(1)), r.getLong(2)))
      .groupBy(_._1)
      .flatMap { case (uid, g) =>
        val t = g.sortBy(e => (e._2, e._3)).map(_._2)
        val gaps = t.zip(t.tail).map { case (a, b) => (b - a) / 1000000L }
        val n = gaps.length.toLong
        if (n < 20) None
        else {
          val sx = gaps.sum; val sxx = gaps.map(x => x * x).sum
          val cv2 = (n * sxx - sx * sx) * 10000L / math.max(sx * sx, 1L)
          Some(uid -> ((n, sx / n, cv2, cv2 < 7000L)))
        }
      }
    assert(got == want)
    assert(got.values.exists(_._4) && got.values.exists(!_._4),
      "the 7000bp bar must split regular from bursty users")
  }

  test("q187 datasheet: every metric recomputed from the raw corpus") {
    val got = graft.operators.Quality.q187CorpusDatasheet(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("value")).toMap
    val docs = Tables.documents(spark, sf)
      .select("lang", "source", "n_chars", "text").collect()
    val toks = docs.map(_.getString(3).split(" ").count(_.nonEmpty).toLong)
    val nDocs = docs.length.toLong
    val nTokens = toks.sum
    val want = Map(
      "n_docs" -> nDocs,
      "n_tokens" -> nTokens,
      "n_chars_total" -> docs.map(_.getAs[Long]("n_chars")).sum,
      "n_langs" -> docs.map(_.getString(0)).distinct.length.toLong,
      "n_sources" -> docs.map(_.getString(1)).distinct.length.toLong,
      "en_share_bp" -> math.round(1e4 * docs.count(_.getString(0) == "en") / nDocs.toDouble),
      "short_doc_share_bp" -> math.round(1e4 * toks.count(_ < 50) / nDocs.toDouble),
      "mean_doc_tokens" -> math.round(nTokens.toDouble / nDocs))
    assert(got == want)
  }

  test("q188 FD audit: holding and violated dependencies both detected, counts exact") {
    val got = graft.operators.Quality.q188FdAudit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_keys"),
        r.getAs[Long]("n_violating_keys"), r.getAs[Long]("max_rhs_cardinality"),
        r.getAs[Boolean]("holds")))).toMap
    assert(got.keySet == Set("event_id->user_id", "user_id->event_type",
      "n_nationkey->n_regionkey"))
    assert(got("event_id->user_id")._4, "unique event ids must determine user")
    assert(got("n_nationkey->n_regionkey")._4, "FK chain must hold")
    assert(!got("user_id->event_type")._4, "users emit many types - must be violated")
    // brute-force the violated one
    val byUser = Tables.events(spark, sf).select("user_id", "event_type").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).distinct.length).toMap
    val (nk, nv, mx, _) = got("user_id->event_type")
    assert(nk == byUser.size.toLong)
    assert(nv == byUser.values.count(_ > 1).toLong)
    assert(mx == byUser.values.max.toLong)
  }

  test("q192 skew audit: every stat recomputed from raw key counts; gate exact") {
    val rows = graft.operators.Quality.q192SkewAudit(spark, sf).collect()
      .map(r => r.getAs[String]("key_column") -> r).toMap
    assert(rows.keySet == Set("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag"))
    val li = Tables.lineitem(spark, sf)
    rows.foreach { case (k, r) =>
      val counts = li.select(k).collect().groupBy(_.get(0)).view.mapValues(_.length.toLong)
      val (nKeys, nRows, mx) = (counts.size.toLong, counts.values.sum, counts.values.max)
      assert(r.getAs[Long]("n_keys") == nKeys, s"$k n_keys")
      assert(r.getAs[Long]("n_rows") == nRows, s"$k n_rows")
      assert(r.getAs[Long]("max_key_rows") == mx, s"$k max")
      assert(r.getAs[Long]("max_share_bp") == mx * 10000 / nRows, s"$k share")
      assert(r.getAs[Long]("mean_rows_per_key_x100") == nRows * 100 / nKeys, s"$k mean")
      assert(r.getAs[Boolean]("salt_recommended") == (mx * 32 > nRows), s"$k gate")
    }
    // the low-cardinality flag column MUST trip the salt gate (3 flags
    // over thousands of rows); the near-unique orderkey must not
    assert(rows("l_returnflag").getAs[Boolean]("salt_recommended"))
    assert(!rows("l_orderkey").getAs[Boolean]("salt_recommended"))
  }

  test("q300 nation reach equals a driver-side BFS; identities hold") {
    val sf = TestSpark.sf
    val edges = graft.operators.Graph.nationEdges(spark, sf)
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    val out = edges.groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._2) }
    // driver BFS per source over the collected (bounded) nation graph
    def bfs(src: Int): Map[Int, Long] = {
      val dist = scala.collection.mutable.Map(src -> 0L)
      var frontier = Set(src)
      var level = 0L
      while (frontier.nonEmpty) {
        level += 1
        val next = frontier.flatMap(n => out.getOrElse(n, Set.empty[Int]))
          .filter(!dist.contains(_))
        next.foreach(n => dist(n) = level)
        frontier = next
      }
      dist.toMap - src
    }
    val names = Tables.nation(spark, sf)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val ref = edges.map(_._1).map { s0 =>
      val d = bfs(s0)
      names(s0) -> ((d.size.toLong, d.values.max, d.values.sum * 100 / d.size))
    }.toMap
    val got = graft.operators.Graph.q300NationReach(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_reachable"),
        r.getAs[Long]("ecc_hops"), r.getAs[Long]("mean_hops_x100")))).toMap
    assert(got == ref, s"got $got\nref $ref")
    // identities: ecc >= 1, mean_x100 >= 100 (a hop is at least 1), and
    // every source with an out-edge rows
    assert(got.nonEmpty && got.values.forall(v =>
      v._2 >= 1L && v._3 >= 100L && v._1 >= 1L))
  }

  test("q306 reciprocity equals a driver-side census; planted A<->B / A->C graph") {
    val sf = TestSpark.sf
    val edges = graft.operators.Graph.nationEdges(spark, sf)
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    val nations = edges.flatMap(e => Seq(e._1, e._2))
    val ref = nations.map { n =>
      val out = edges.filter(_._1 == n).map(_._2)
      val in = edges.filter(_._2 == n).map(_._1)
      val partners = out ++ in
      val recip = out.filter(in.contains)
      val role = if (out.size > in.size) "exporter"
        else if (in.size > out.size) "importer" else "balanced"
      n -> ((out.size.toLong, in.size.toLong, partners.size.toLong,
        recip.size.toLong, recip.size.toLong * 10000 / partners.size, role))
    }.toMap
    val got = graft.operators.Graph.q306TradeReciprocity(spark, sf).collect()
      .map(r => r.getAs[Int]("nation") -> ((r.getAs[Long]("n_out"),
        r.getAs[Long]("n_in"), r.getAs[Long]("n_partners"),
        r.getAs[Long]("n_recip"), r.getAs[Long]("recip_bp"),
        r.getAs[String]("role")))).toMap
    assert(got == ref, s"got $got\nref $ref")
    // planted: A↔B reciprocated, A→C one-way, D→D self-lane ignored
    val s0 = spark
    import s0.implicits._
    val planted = Seq((1, 2, 5L), (2, 1, 3L), (1, 3, 2L), (4, 4, 9L))
      .toDF("src", "dst", "w")
    val p = graft.operators.Graph.reciprocityOfEdges(planted).collect()
      .map(r => r.getAs[Int]("nation") -> ((r.getAs[Long]("n_out"),
        r.getAs[Long]("n_in"), r.getAs[Long]("n_partners"),
        r.getAs[Long]("n_recip"), r.getAs[Long]("recip_bp"),
        r.getAs[String]("role")))).toMap
    assert(p(1) == ((2L, 1L, 2L, 1L, 5000L, "exporter")), p(1).toString)
    assert(p(2) == ((1L, 1L, 1L, 1L, 10000L, "balanced")), p(2).toString)
    assert(p(3) == ((0L, 1L, 1L, 0L, 0L, "importer")), p(3).toString)
    assert(!p.contains(4), "a self-lane-only nation must not row")
  }

}
