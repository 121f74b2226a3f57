package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A'-block: extended relational operators — range join, pivot, exact
  * percentiles, cardinality sketch.
  */
object RelationalExt {

  /** q43: range (band) join — price-band histogram. The bands side is tiny
    * and broadcast, so the range predicate evaluates as a broadcast
    * nested-loop scan: no shuffle of the fact table at any scale.
    */
  def q43RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val bands = s.range(0L, 120000L, 10000L).toDF("lo")
    Tables.lineitem(s, dir)
      .join(broadcast(bands),
        col("l_extendedprice") >= col("lo") &&
        col("l_extendedprice") < col("lo") + 10000)
      .groupBy(col("lo"))
      .agg(count(lit(1)).as("n_items"),
           // exact long-units sum (graft.functions.MoneySum — same exact
           // total as the r18 decimal(12,2) fold, no 128-bit add per row)
           round(graft.functions.MoneySum.sum(
             graft.functions.MoneySum.units(col("l_extendedprice"), 2), 2), 2)
             .cast("double").as("band_total"))
  }

  /** q44: pivot — order counts per nation × status via the DataFrame pivot
    * operator with an explicit value list (map-side pivot, one shuffle).
    */
  def q44Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnRenamed("F", "n_f").withColumnRenamed("O", "n_o")
      .withColumnRenamed("P", "n_p")

  /** q45: exact interpolated percentiles per group. */
  def q45Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"),
        round(expr("percentile(l_quantity, 0.95)"), 4).as("p95"))

  /** q46: HLL++ cardinality sketch vs exact. SQL-oracled (r14): the raw
    * sketch value is engine-specific, so the published columns are the
    * EXACT count plus `approx_within_5pct` — the sketch's relative error
    * checked against the spec's 5% bound as an exact integer comparison —
    * and the oracle emits the exact count with a literal TRUE: the driver
    * then verifies the exact side byte-for-byte AND that the sketch
    * honored its error contract on this corpus. RelationalExtSpec keeps
    * the raw approx-vs-exact bound check.
    *
    * Shape note: HLL is duplicate-insensitive, so both sides run over the
    * pre-distinct (flag, partkey) pairs — one scan, one distinct shuffle,
    * and only |groups| HLL buffers. Mixing countDistinct with
    * approx_count_distinct in ONE agg triggers Catalyst's distinct-rewrite
    * Expand, which allocates the rsd=0.02 sketch buffer (~2.7k words) per
    * (flag, partkey) partial group: gigabytes of agg state at sf0.1 (the
    * round-1 9.8 s anomaly), unbounded at 100 TB.
    */
  def q46ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_partkey"))
      .distinct()
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        count(lit(1)).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) * lit(100L) <
          col("exact_parts") * lit(5L)).as("approx_within_5pct"))

  /** q50: analytic window functions — quartile bucketing, relative rank
    * and cumulative distribution per order-status partition (unique
    * (totalprice, orderkey) ordering keeps every function deterministic).
    */
  def q50WindowAnalytics(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 4))
      .withColumn("cume", round(cume_dist().over(w), 4))
      .filter(col("o_orderkey") % 10 === 0) // thin the dump, keep determinism
  }

  /** q88: unpivot (melt) — q44's inverse: the wide per-nation revenue
    * report (one column per return flag) melted back to long
    * (nation, flag, revenue_cents) rows via `Dataset.unpivot`. Wide cells
    * are coalesced to 0 before melting so the unpivot's null-dropping
    * cannot make the output depend on which (nation, flag) cells happen to
    * be empty at a given SF. The supplier→nation dims are broadcast;
    * lineitem aggregates map-side then shuffles |nations| rows.
    */
  def q88Unpivot(s: SparkSession, dir: String): DataFrame = {
    def flagSum(f: String) = coalesce(
      sum(when(col("l_returnflag") === f,
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))),
      lit(0L)).as(f)
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(flagSum("A"), flagSum("N"), flagSum("R"))
      .unpivot(Array(col("n_name")), Array(col("A"), col("N"), col("R")),
        "flag", "revenue_cents")
  }

  /** q129: skyline (Pareto frontier) query — the orders not dominated on
    * (price, recency): walking orders from most expensive down, keep each
    * order strictly more recent than everything already passed (the
    * staircase rule; price ties break by orderkey so both engines walk
    * the same order). "Best trade-off" queries — cheapest-for-newest,
    * biggest-for-freshest — are a classic operator class relational
    * engines lack natively.
    *
    * The running max this needs over the GLOBAL price order is the
    * q97/q105/q103 decomposition a third time — on MAX instead of SUM
    * (any commutative monoid works): max-so-far = max(in-band prefix max,
    * broadcast max of all higher price bands) — so no single-partition
    * window ever sees the orders table, at any scale.
    */
  def q129Skyline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // equi-depth bands (Bands): the staircase walk stays balanced even if
    // prices concentrate; the frontier itself is band-independent
    val o = Bands.withEquiDepthBand(
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
        expr("datediff(cast(o_orderdate as date), date'1970-01-01')")
          .cast("long").as("day")),
      "cents")
    // per-band max day + the running max over all HIGHER bands (tiny frame)
    val higher = o.groupBy(col("band")).agg(max(col("day")).as("bmax"))
      .withColumn("higher_max",
        max(col("bmax")).over(Window.orderBy(col("band").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("band"), col("higher_max"))
    val wBand = Window.partitionBy(col("band"))
      .orderBy(col("cents").desc, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    o.withColumn("in_band_max", max(col("day")).over(wBand))
      .join(broadcast(higher), "band")
      .withColumn("seen_max", greatest(col("in_band_max"), col("higher_max")))
      .filter(col("seen_max").isNull || col("day") > col("seen_max"))
      .select(col("o_orderkey"), col("cents"), col("day"))
  }

  /** q144: deterministic bounded per-stratum sample — the k=5 order keys
    * with the smallest md5 rank per (status, order-year), via the native
    * [[graft.functions.BottomKSample]] TypedImperativeAggregate, plus the
    * stratum's total count (the sampling denominator).
    *
    * This is the 100 TB replacement for `row_number() OVER (PARTITION BY
    * stratum ORDER BY hash) <= k` (q94's shape, which sorts every row of
    * every stratum through the exchange): the aggregate keeps an O(k)
    * buffer per group, partial aggregation bounds it map-side, and the
    * shuffle carries ≤ k entries per (partition, stratum) — input size
    * appears nowhere in the memory or shuffle bound. Hash-ranking makes
    * the sample uniform, reproducible across runs/engines, and stable
    * under re-partitioning (rank ties are impossible modulo md5
    * collisions, and the (rank, id) pair order is total regardless).
    *
    * The aggregate's array result is posexploded to one scalar row per
    * sampled key — (status, yr, sample_rank, o_orderkey, n_orders) — so
    * the result is plain sortable/hashable columns (the r7 oracle harness
    * cannot sort an array<bigint> cell). The explode is a per-group
    * fan-out of ≤ k rows AFTER the O(k) aggregate; the shuffle bound is
    * unchanged.
    */
  def q144BottomkSample(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderstatus").as("status"),
        expr("CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT)").as("yr"),
        col("o_orderkey"),
        md5(col("o_orderkey").cast("string")).as("h"))
      .groupBy(col("status"), col("yr"))
      .agg(
        graft.functions.BottomKSample.bottomK(col("h"), col("o_orderkey"), 5)
          .as("sample_ids"),
        count(lit(1)).as("n_orders"))
      .select(col("status"), col("yr"), col("n_orders"),
        posexplode(col("sample_ids")))
      .select(col("status"), col("yr"),
        (col("pos") + 1).cast("long").as("sample_rank"),
        col("col").as("o_orderkey"),
        col("n_orders"))

  /** q282: BRAND revenue league — the fact→dim rollup every merchandising
    * review starts from: per part brand, line/unit counts, gross and
    * net-of-discount revenue, net revenue share and mean discount — all
    * in EXACT integer cents (prices carry 2 decimals, so cents are
    * integers; net works in cents×100 via the integer (100 − disc_x100)
    * factor and publishes DIV 100 — no double ever sums). The realized
    * complement of the part table's retail view.
    *
    * Scale shape: lineitem is scanned once and joined to the broadcast
    * part dim on l_partkey; one |brands|-bounded fold + a broadcast 1-row
    * total for the share.
    */
  def q282BrandLeague(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("disc"))
      .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
    val agg = li.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"), sum(col("qty")).as("units"),
        sum(col("cents")).as("gross_cents"),
        sum(expr("CAST(cents * (100 - disc) AS DECIMAL(38,0))")).as("net_x100"),
        sum(col("disc")).as("disc_sum"))
    agg.crossJoin(broadcast(agg.agg(sum(col("net_x100")).as("tot_x100"))))
      .select(col("p_brand"), col("n_lines"), col("units"), col("gross_cents"),
        expr("net_x100 DIV 100").as("net_cents"),
        expr("net_x100 * 10000 DIV tot_x100").as("net_share_bp"),
        expr("disc_sum * 100 DIV n_lines").as("avg_disc_bp"))
  }

  /** q291: SINGLE-SOURCE supply risk — per brand, how many parts were
    * only ever bought from ONE supplier (observed through the lineitem
    * fact): the supply-chain fragility census a sourcing review starts
    * from. Per brand: traded parts, single-sourced parts, their share bp,
    * and the revenue cents exposed through single-sourced parts.
    *
    * Scale shape: one fact scan folded map-side to (part, supplier)
    * partials, then a |parts| fold and a broadcast part-dim join into a
    * |brands| rollup — the fact table is never shuffled twice.
    */
  def q291SingleSourceRisk(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .groupBy(col("l_partkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
        sum(col("cents")).as("part_cents"))
      .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("n_suppliers") === 1, 1L).otherwise(0L)).as("single_sourced"),
        sum(when(col("n_suppliers") === 1, col("part_cents")).otherwise(0L))
          .as("exposed_cents"))
      .withColumn("single_source_bp",
        expr("single_sourced * 10000 DIV n_parts"))

  /** q292: monthly RETURN rates — the post-sale health series: per ship
    * month, line counts, returned lines (l_returnflag = 'R'), integer
    * return_bp and the returned revenue share in bp (value-weighted
    * returns diverging from count-weighted means expensive items come
    * back disproportionately). One fact scan, |months| fold.
    */
  def q292ReturnRates(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        (col("l_returnflag") === "R").as("ret"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("ret"), 1L).otherwise(0L)).as("n_returned"),
        sum(col("cents")).as("cents"),
        sum(when(col("ret"), col("cents")).otherwise(0L)).as("ret_cents"))
      .select(col("month"), col("n_lines"), col("n_returned"),
        expr("n_returned * 10000 DIV n_lines").as("return_bp"),
        expr("ret_cents * 10000 DIV greatest(cents, 1)").as("value_return_bp"))

  /** q297: IDLE-capital census (the TPC-H Q22 shape on this schema) —
    * customers holding an above-average POSITIVE balance who have never
    * ordered, per market segment: the "money on the sidelines" table a
    * sales org works from. Composes the two classic sub-operators the
    * repo had only separately: a global scalar subquery (the bar) and an
    * anti join (never ordered) — with the bar applied CROSS-MULTIPLIED
    * (cents·n_pos > sum_pos, the q216 no-division rule; headroom: cents
    * ~1e6 × 1e9 customers ~1e15, well inside BIGINT).
    *
    * Scale shape: one customer scan folds the 1-row bar (broadcast
    * back); the anti join exchanges on custkey against the orders
    * distinct — the one fact-scale shuffle, unavoidable for "never
    * ordered" and co-locatable by bucketing both tables on custkey; the
    * segment fold is |segments|-bounded.
    */
  def q297IdleCapital(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
    val bar = cust.filter(col("cents") > 0)
      .agg(count(lit(1)).as("n_pos"), sum(col("cents")).as("sum_pos"))
    val segTotals = cust.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
    val idle = cust.crossJoin(broadcast(bar))
      .filter(expr("cents * n_pos > sum_pos"))
      .join(Tables.orders(s, dir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_idle"), sum(col("cents")).as("idle_cents"))
    // a census, not a hit list: every segment rows, zero-idle ones at 0 —
    // "no idle capital anywhere" is itself the answer a sales org reads
    segTotals.join(broadcast(idle), Seq("c_mktsegment"), "left")
      .na.fill(0L, Seq("n_idle", "idle_cents"))
      .select(col("c_mktsegment").as("segment"), col("n_customers"),
        col("n_idle"), col("idle_cents"),
        expr("n_idle * 10000 DIV n_customers").as("idle_bp"))
  }

  /** q303: DISCOUNT-band economics — the pricing-lever table beside q282
    * (brand league), q292 (returns) and q244 (concentration): per
    * discount percent band 0..10, line count, unit mass, gross revenue
    * cents, units-per-line ×100, the LIFT of units-per-line vs the
    * zero-discount band ×100 (the elasticity proxy: "does 6% off
    * actually move more units per line than full price?") and each
    * band's revenue share bp. A flat lift curve says the discounts buy
    * nothing; the table is the before-picture of every promo decision.
    *
    * Exactness: cents/units are exact integers (the round(×100) house
    * idiom; quantities are integral by contract — round() makes both
    * engines agree if a fractional unit ever ships); lift is an INTEGER
    * cross-multiplied division (qty·n₀·100 DIV n_b·q₀ — never a rounded
    * double; headroom qty·n₀·100 ~ 3e27 at 1e12 lines → the
    * DECIMAL(38,0)/HUGEINT widening rule). The 0..10 grid left-join
    * guarantees absent bands row with zeros (q258's densify rule); a
    * missing band-0 (no full-price lines anywhere) yields NULL lifts —
    * honest, the proxy has no baseline.
    *
    * CLOSED-DOMAIN contract, enforced LOUD: the 0..10 grid is TPC-H's
    * discount domain; a band outside it would otherwise be silently
    * excluded from the table AND the revenue total — at production
    * scale, where no conservation spec runs, that is a wrong answer
    * with no symptom. So the band fold carries a `raise_error` filter
    * (the q69 bucket-cap idiom: a FILTER, not a dropped column, so the
    * optimizer can never prune the check away; it runs on the ≤
    * |bands|-row aggregated frame, so its cost is nil) that fails the
    * query with an actionable message on any out-of-domain band. A
    * schema with deeper discounts must widen the literal grid (the q44
    * explicit-pivot-values rule) — and now finds that out from an
    * error, not from a quietly short table.
    *
    * Shape: ONE lineitem scan folds map-side to the 11-row band frame;
    * baseline and corpus total are broadcast 1-row crossJoins off the
    * checkpointed bounded frame (the q295 rule — never a second fact
    * scan for scalars).
    */
  def q303DiscountBands(s: SparkSession, dir: String): DataFrame =
    discountBandsOf(s, Tables.lineitem(s, dir))

  /** q303 on ANY (l_discount, l_quantity, l_extendedprice) frame —
    * spec'd on a planted 11%-discount row (must raise) beside the
    * oracled corpus run. */
  private[graft] def discountBandsOf(s: SparkSession, lineitem: DataFrame): DataFrame = {
    val bands = lineitem
      .select(expr("CAST(round(l_discount * 100) AS BIGINT)").as("disc_pct"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("qty"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .groupBy(col("disc_pct"))
      .agg(count(lit(1)).as("n_lines"), sum(col("qty")).as("qty"),
        sum(col("cents")).as("gross_cents"))
      // loud closed-domain guard (see the docstring's contract): fires on
      // the post-agg ≤ |bands|-row frame, BEFORE the grid join can drop
      // the evidence
      .filter(
        when(col("disc_pct").between(0L, 10L), lit(true))
          .otherwise(raise_error(concat(
            lit("q303_discount_bands: discount band "),
            col("disc_pct").cast("string"),
            lit("% is outside the closed 0..10 domain the literal grid " +
              "assumes — widen the grid (the q44 explicit-pivot-values " +
              "rule) or the band would be silently excluded from the " +
              "table and the revenue-share totals")))))
    val dense = s.range(0, 11).select(col("id").as("disc_pct"))
      .join(bands, Seq("disc_pct"), "left")
      .na.fill(0L, Seq("n_lines", "qty", "gross_cents"))
      .localCheckpoint() // three consumers: baseline, total, output
    val base = dense.filter(col("disc_pct") === 0L)
      .select(col("n_lines").as("n0"), col("qty").as("q0"))
    val tot = dense.agg(sum(col("gross_cents")).as("tot_cents"))
    dense.crossJoin(broadcast(base)).crossJoin(broadcast(tot))
      .select(col("disc_pct"), col("n_lines"), col("qty"), col("gross_cents"),
        expr("CASE WHEN n_lines > 0 THEN qty * 100 DIV n_lines END")
          .as("units_per_line_x100"),
        expr("""CASE WHEN n_lines > 0 AND n0 > 0 AND q0 > 0
                THEN CAST(CAST(qty AS DECIMAL(38,0)) * n0 * 100
                          DIV (CAST(n_lines AS DECIMAL(38,0)) * q0) AS BIGINT)
                END""").as("lift_x100"),
        // share is widened like the lift term: total cents ~1e17–1e18 at
        // the docstring's 1e12-line scale, ×10000 overflows BIGINT — and
        // non-ANSI Spark would wrap silently where DuckDB raises (r16
        // advice)
        expr("""CASE WHEN tot_cents > 0
                THEN CAST(CAST(gross_cents AS DECIMAL(38,0)) * 10000
                          DIV tot_cents AS BIGINT) END""")
          .as("rev_share_bp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q303_discount_bands" -> (q303DiscountBands _),
    "q297_idle_capital"   -> (q297IdleCapital _),
    "q282_brand_league"   -> (q282BrandLeague _),
    "q291_single_source_risk" -> (q291SingleSourceRisk _),
    "q292_return_rates"   -> (q292ReturnRates _),
    "q144_bottomk_sample" -> (q144BottomkSample _),
    "q129_skyline"        -> (q129Skyline _),
    "q88_unpivot"         -> (q88Unpivot _),
    "q43_range_join"      -> (q43RangeJoin _),
    "q50_window_analytics" -> (q50WindowAnalytics _),
    "q44_pivot"           -> (q44Pivot _),
    "q45_percentiles"     -> (q45Percentiles _),
    "q46_approx_distinct" -> (q46ApproxDistinct _))

  val oracles: Map[String, String] = Map(
    "q303_discount_bands" ->
      """WITH b AS (
           SELECT CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
                  CAST(count(*) AS BIGINT) AS n_lines,
                  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS gross_cents
           FROM lineitem GROUP BY 1),
         g AS (SELECT unnest(generate_series(0, 10)) AS disc_pct),
         d AS (SELECT g.disc_pct, COALESCE(b.n_lines, 0) AS n_lines,
                      COALESCE(b.qty, 0) AS qty,
                      COALESCE(b.gross_cents, 0) AS gross_cents
               FROM g LEFT JOIN b USING (disc_pct)),
         base AS (SELECT n_lines AS n0, qty AS q0 FROM d WHERE disc_pct = 0),
         tot AS (SELECT CAST(sum(gross_cents) AS BIGINT) AS tot_cents FROM d)
         SELECT disc_pct, n_lines, qty, gross_cents,
                CASE WHEN n_lines > 0 THEN qty * 100 // n_lines END
                  AS units_per_line_x100,
                CASE WHEN n_lines > 0 AND n0 > 0 AND q0 > 0
                     THEN CAST(CAST(qty AS HUGEINT) * n0 * 100
                               // (CAST(n_lines AS HUGEINT) * q0) AS BIGINT)
                END AS lift_x100,
                CASE WHEN tot_cents > 0
                     THEN CAST(CAST(gross_cents AS HUGEINT) * 10000
                               // tot_cents AS BIGINT) END AS rev_share_bp
         FROM d CROSS JOIN base CROSS JOIN tot""",
    "q297_idle_capital" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
                           CAST(round(c_acctbal * 100) AS BIGINT) AS cents
                    FROM customer),
          bar AS (SELECT CAST(count(*) AS BIGINT) AS n_pos,
                         CAST(sum(cents) AS BIGINT) AS sum_pos
                  FROM c WHERE cents > 0),
          seg AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
                  FROM c GROUP BY 1),
          idle AS (SELECT c.c_mktsegment,
                          CAST(count(*) AS BIGINT) AS n_idle,
                          CAST(sum(c.cents) AS BIGINT) AS idle_cents
                   FROM c CROSS JOIN bar
                   WHERE c.cents * bar.n_pos > bar.sum_pos
                     AND NOT EXISTS (SELECT 1 FROM orders o
                                     WHERE o.o_custkey = c.c_custkey)
                   GROUP BY 1)
          SELECT s.c_mktsegment AS segment, s.n_customers,
                 COALESCE(i.n_idle, 0) AS n_idle,
                 COALESCE(i.idle_cents, 0) AS idle_cents,
                 COALESCE(i.n_idle, 0) * 10000 // s.n_customers AS idle_bp
          FROM seg s LEFT JOIN idle i ON s.c_mktsegment = i.c_mktsegment""",
    "q291_single_source_risk" ->
      """WITH p AS (SELECT l_partkey,
                           count(DISTINCT l_suppkey) AS n_suppliers,
                           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                             AS BIGINT) AS part_cents
                    FROM lineitem GROUP BY 1)
          SELECT pt.p_brand,
                 CAST(count(*) AS BIGINT) AS n_parts,
                 CAST(sum(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS single_sourced,
                 CAST(sum(CASE WHEN n_suppliers = 1 THEN part_cents ELSE 0 END)
                   AS BIGINT) AS exposed_cents,
                 CAST(sum(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   * 10000 // count(*) AS single_source_bp
          FROM p JOIN part pt ON l_partkey = p_partkey
          GROUP BY 1""",
    "q292_return_rates" ->
      """WITH l AS (SELECT strftime(l_shipdate, '%Y-%m') AS month,
                           l_returnflag = 'R' AS ret,
                           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
                    FROM lineitem)
          SELECT month,
                 CAST(count(*) AS BIGINT) AS n_lines,
                 CAST(sum(CASE WHEN ret THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
                 CAST(sum(CASE WHEN ret THEN 1 ELSE 0 END) AS BIGINT)
                   * 10000 // count(*) AS return_bp,
                 CAST(sum(CASE WHEN ret THEN cents ELSE 0 END) AS BIGINT)
                   * 10000 // greatest(CAST(sum(cents) AS BIGINT), 1)
                   AS value_return_bp
          FROM l GROUP BY 1""",
    "q282_brand_league" ->
      """WITH li AS (SELECT p.p_brand,
                            CAST(l_quantity AS BIGINT) AS qty,
                            CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                            CAST(round(l_discount * 100) AS BIGINT) AS disc
                     FROM lineitem JOIN part p ON l_partkey = p_partkey),
          a AS (SELECT p_brand,
                       CAST(count(*) AS BIGINT) AS n_lines,
                       CAST(sum(qty) AS BIGINT) AS units,
                       CAST(sum(cents) AS BIGINT) AS gross_cents,
                       CAST(sum(cents * (100 - disc)) AS HUGEINT) AS net_x100,
                       CAST(sum(disc) AS BIGINT) AS disc_sum
                FROM li GROUP BY 1),
          t AS (SELECT sum(net_x100) AS tot_x100 FROM a)
          SELECT p_brand, n_lines, units, gross_cents,
                 CAST(net_x100 // 100 AS BIGINT) AS net_cents,
                 CAST(net_x100 * 10000 // tot_x100 AS BIGINT) AS net_share_bp,
                 disc_sum * 100 // n_lines AS avg_disc_bp
          FROM a CROSS JOIN t""",
    "q144_bottomk_sample" ->
      """WITH o AS (
           SELECT o_orderstatus AS status,
                  CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
                  o_orderkey,
                  md5(CAST(o_orderkey AS VARCHAR)) AS h
           FROM orders),
         c AS (
           SELECT status, yr, CAST(count(*) AS BIGINT) AS n_orders
           FROM o GROUP BY 1, 2),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY status, yr
                                        ORDER BY h, o_orderkey) AS rn
           FROM o)
         SELECT r.status, r.yr, CAST(r.rn AS BIGINT) AS sample_rank,
                r.o_orderkey, c.n_orders
         FROM r JOIN c USING (status, yr) WHERE rn <= 5""",
    "q129_skyline" ->
      """WITH o AS (
           SELECT o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  CAST(date_diff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE)) AS BIGINT) AS day
           FROM orders),
         w AS (
           SELECT *, max(day) OVER (ORDER BY cents DESC, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS seen_max
           FROM o)
         SELECT o_orderkey, cents, day
         FROM w WHERE seen_max IS NULL OR day > seen_max""",
    "q88_unpivot" ->
      """WITH wide AS (
           SELECT n_name,
                  CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    FILTER (WHERE l_returnflag = 'A'), 0) AS BIGINT) AS a_cents,
                  CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    FILTER (WHERE l_returnflag = 'N'), 0) AS BIGINT) AS n_cents,
                  CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    FILTER (WHERE l_returnflag = 'R'), 0) AS BIGINT) AS r_cents
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           GROUP BY n_name)
         SELECT n_name, 'A' AS flag, a_cents AS revenue_cents FROM wide
         UNION ALL
         SELECT n_name, 'N' AS flag, n_cents AS revenue_cents FROM wide
         UNION ALL
         SELECT n_name, 'R' AS flag, r_cents AS revenue_cents FROM wide""",
    "q50_window_analytics" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_orderstatus, o_totalprice,
                  ntile(4) OVER w AS quartile,
                  round(percent_rank() OVER w, 4) AS pct_rank,
                  round(cume_dist() OVER w, 4) AS cume
           FROM orders
           WINDOW w AS (PARTITION BY o_orderstatus
                        ORDER BY o_totalprice ASC, o_orderkey ASC))
         WHERE o_orderkey % 10 = 0""",
    "q43_range_join" ->
      """SELECT lo, count(*) AS n_items,
                CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS band_total
         FROM (SELECT unnest(range(0, 120000, 10000)) AS lo) b
         JOIN lineitem ON l_extendedprice >= lo AND l_extendedprice < lo + 10000
         GROUP BY lo""",
    "q44_pivot" ->
      """SELECT c_nationkey,
                count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
                count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
                count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_nationkey""",
    "q45_percentiles" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_quantity, 0.25), 4) AS p25,
                round(quantile_cont(l_quantity, 0.5), 4)  AS p50,
                round(quantile_cont(l_quantity, 0.75), 4) AS p75,
                round(quantile_cont(l_quantity, 0.95), 4) AS p95
         FROM lineitem GROUP BY l_returnflag""",
    // The exact side is verified byte-for-byte; the literal TRUE asserts
    // the sketch's 5% error contract — a Spark-side sketch outside the
    // bound hash-mismatches the round's CORRECTNESS artifact.
    "q46_approx_distinct" ->
      """SELECT l_returnflag,
                count(DISTINCT l_partkey) AS exact_parts,
                TRUE AS approx_within_5pct
         FROM lineitem GROUP BY l_returnflag""")
}
