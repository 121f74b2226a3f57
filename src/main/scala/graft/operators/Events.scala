package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** B-block: trip/event analytics — the sessionize → bucket → derive path of
  * a trip-data pipeline. All operators shuffle at most once on `user_id`
  * (or not at all) and then work within partitions via window functions,
  * so per-user state is bounded by events-per-user at any corpus size.
  *
  * Timestamp note: `events.ts` is nanosecond parquet; both Spark and the
  * DuckDB oracle truncate to microseconds on read, so µs-domain arithmetic
  * (`unix_micros`) is oracle-exact.
  */
object Events {

  /** q20: gap-based sessionization (30-minute inactivity gap).
    * lag → flag → running-sum over one user_id shuffle; the canonical
    * distributed sessionizer (no per-user collect, no iterative driver loop).
    */
  /** THE 30-minute-gap sessionizer: appends a 1-based per-user `sess_no`
    * to any frame carrying (user_id, ts, event_id) — the single
    * definition of session semantics. Every session-consuming operator
    * (q20/q60/q63/q97/q106/q107) builds on this, so the gap constant and
    * the tie-break ordering live in exactly one place.
    */
  private[operators] def withSessionNo(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
             unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_no", sum(col("is_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_us", "is_new")
  }

  def q20Sessionize(s: SparkSession, dir: String): DataFrame = {
    withSessionNo(Tables.events(s, dir))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("sess_start"),
        max(col("ts")).as("sess_end"),
        round(sum(col("value").cast("decimal(8,2)")), 2).cast("double").as("sess_value"))
  }

  /** q293: session-SIZE profile — the engagement-shape census q20's raw
    * session table implies: sessions banded by event count (singleton /
    * 2–4 / 5–9 / 10+), with session share, event-mass share and the exact
    * integer mean duration seconds per band. A corpus dominated by
    * singleton "sessions" is drive-by traffic (sessionization adds
    * nothing and the 30-min gap constant deserves a second look); mass
    * in 10+ sessions changes every per-session rollup's cost model.
    * Shares [[withSessionNo]] — the one gap/tie-break definition.
    *
    * Scale shape: q20's single user_id exchange builds the session frame;
    * the band fold is 4 rows.
    */
  def q293SessionSizeProfile(s: SparkSession, dir: String): DataFrame = {
    val sess = withSessionNo(Tables.events(s, dir))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("dur_us"))
    val banded = sess.withColumn("band",
        when(col("n_events") === 1, "a_single")
          .when(col("n_events") <= 4, "b_2_4")
          .when(col("n_events") <= 9, "c_5_9")
          .otherwise("d_10_plus"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"),
        sum(col("dur_us")).as("dur_us"))
    banded.crossJoin(broadcast(banded.agg(
        sum(col("n_sessions")).as("ts_"), sum(col("n_events")).as("te"))))
      .select(col("band"), col("n_sessions"), col("n_events"),
        expr("n_sessions * 10000 DIV ts_").as("session_share_bp"),
        expr("n_events * 10000 DIV te").as("event_share_bp"),
        expr("dur_us DIV 1000000 DIV n_sessions").as("mean_dur_s"))
  }

  /** q21: tumbling hourly window aggregation per event type. */
  def q21TimeBucket(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(8,2)")), 2).cast("double").as("total_value"))

  /** q136: SLIDING-window aggregation via the built-in `window()` operator
    * — q21's tumbling buckets generalized to overlapping frames (hourly
    * windows sliding every 15 min, the "demand in the last hour, refreshed
    * each quarter" feed a dispatch dashboard reads). Each event lands in
    * exactly windowDuration/slideDuration = 4 windows — Spark plans this
    * as an Expand (a fixed 4× multiplier, partial-agg'd before the one
    * window-key exchange), NOT a self-join. The same expression runs
    * unchanged under readStream + watermark. Window starts surface as
    * integer epoch-µs; the oracle derives the identical 4 grid starts per
    * event from epoch-µs integer division, and the half-open [start,
    * start+1h) membership is exact by construction.
    */
  def q136SlidingWindow(s: SparkSession, dir: String): DataFrame =
    slidingWindowAgg(Tables.events(s, dir))

  /** The q136 aggregation, factored over any (ts, event_type, value) frame
    * so the IDENTICAL expression drives both the batch query and the s13
    * stream (EventStream.slidingCounts) — the q108/s11 portability
    * contract applied to the sliding window. */
  private[graft] def slidingWindowAgg(df: DataFrame): DataFrame =
    df
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(8,2)")), 2).cast("double").as("total_value"))
      .select(expr("unix_micros(w.start)").as("w_start_us"), col("event_type"),
        col("n"), col("total_value"))

  /** q22: signup → purchase conversion funnel per user. */
  def q22Funnel(s: SparkSession, dir: String): DataFrame = {
    val wu = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .withColumn("first_signup",
        min(when(col("event_type") === "signup", col("ts"))).over(wu))
      .groupBy(col("user_id"))
      .agg(
        count(when(col("event_type") === "signup", lit(1))).as("n_signup"),
        count(when(col("event_type") === "purchase", lit(1))).as("n_purchase"),
        count(when(col("event_type") === "purchase" &&
                   col("ts") > col("first_signup"), lit(1))).as("n_converted"))
  }

  /** q23: JSON property extraction from the `props` payload column. */
  def q23JsonProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(avg(col("k")), 4).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** q24: as-of join — attribute each purchase to the latest strictly-prior
    * click/view of the same user. Implemented as one user_id shuffle + a
    * `last(_, ignoreNulls)` window over strictly-preceding rows: the
    * merge-scan equivalent of a sorted as-of join, linear per partition.
    */
  def q24AsofAttribution(s: SparkSession, dir: String): DataFrame = {
    // RANGE frame on the µs timestamp: strictly-earlier rows only, matching
    // the oracle's `v.ts < p.ts` (a ROWS -1 frame would include a same-µs
    // click that ASOF excludes)
    val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
      .rangeBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("view_id",
        when(col("event_type").isin("click", "view"), col("event_id")))
      .withColumn("attr_event_id", last(col("view_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("attr_event_id"))
  }

  /** q25: monthly order revenue stats. */
  def q25MonthlyRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        // exact long-units sum (graft.functions.MoneySum — same exact total
        // as the r18 decimal(12,2) fold, minus the 128-bit add per row)
        round(graft.functions.MoneySum.sum(
          graft.functions.MoneySum.units(col("o_totalprice"), 2), 2), 2)
          .cast("double").as("revenue"),
        round(avg(col("o_totalprice")), 4).as("avg_order"))

  /** q26: inter-event gap statistics per user (lag over one shuffle).
    * Gaps are integer microseconds, so avg is bit-exact vs the oracle.
    */
  def q26EventGaps(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_gaps"),
        round(avg(col("gap_us")) / 1000000.0, 4).as("avg_gap_s"),
        max(col("gap_us")).as("max_gap_us"))
  }

  /** q27: first/last event per user via min_by/max_by on the unique,
    * time-ordered event_id (tie-free deterministic arg-min/arg-max).
    */
  def q27FirstLast(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        min_by(col("event_type"), col("event_id")).as("first_type"),
        max_by(col("event_type"), col("event_id")).as("last_type"),
        min(col("event_id")).as("first_event_id"),
        max(col("event_id")).as("last_event_id"),
        count(lit(1)).as("n_events"))

  /** q60: per-trip (session) derived metrics — the publishable "trips"
    * table of the reference's sessionize → derive → publish path: duration,
    * event count, entry event type, start-hour bucket, weekend flag and
    * value band per session. Same single user_id shuffle as q20; all
    * derivations are projections over the session aggregate. Duration is
    * INTEGER milliseconds (µs div 1000): µs/1e6 + round(4) lands exactly on
    * the x.xxxx5 half-boundary whenever µs % 100 == 50, where Spark
    * (decimal-string HALF_UP) and DuckDB (raw-double) disagree by 1 ulp —
    * integer division sidesteps the boundary entirely.
    */
  def q60TripMetrics(s: SparkSession, dir: String): DataFrame = {
    withSessionNo(Tables.events(s, dir))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("sess_start"),
        max(col("ts")).as("sess_end"),
        round(sum(col("value").cast("decimal(8,2)")), 2).cast("double").as("sess_value"),
        min_by(col("event_type"), col("event_id")).as("entry_type"))
      .select(
        col("user_id"), col("sess_no"), col("n_events"),
        expr("(unix_micros(sess_end) - unix_micros(sess_start)) DIV 1000")
          .as("duration_ms"),
        hour(col("sess_start")).cast("long").as("start_hour"),
        date_format(col("sess_start"), "E").isin("Sat", "Sun").as("is_weekend"),
        when(col("sess_value") < 10, "low")
          .when(col("sess_value") < 100, "mid")
          .otherwise("high").as("value_band"),
        col("sess_value"), col("entry_type"))
  }

  /** q62: time-series resample + forward fill — each user's event values
    * regularized onto an hourly grid spanning their first→last event, with
    * gaps carrying the last observed value forward (the telemetry/trip
    * gap-filling primitive). Grid generation is `sequence()` per user (one
    * row → their hour range, exploded), observations reduce to one value
    * per (user, hour) via max_by on the (µs, event_id) tuple, and the fill
    * is `last(_, ignoreNulls)` over the hour order — everything after the
    * per-user agg stays in one user_id partition, so the whole operator is
    * two shuffles (agg + window) regardless of corpus size.
    */
  def q62ResampleFfill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val grid = ev.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
           date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val obs = ev
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(max_by(col("value"),
        struct(unix_micros(col("ts")), col("event_id"))).as("obs_value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "hour"), "left")
      .withColumn("value_ffill", last(col("obs_value"), ignoreNulls = true).over(w))
      .select(col("user_id"),
        date_format(col("hour"), "yyyy-MM-dd HH:00").as("hour"),
        col("obs_value").isNotNull.as("is_observed"),
        col("value_ffill"))
  }

  /** q71: rolling-window analytics per user — 7-event moving average and
    * running total of `value`, the smoothing/cumulative primitives of a
    * telemetry dashboard. One user_id shuffle, then both frames compute
    * in-partition over the same sort (a single Window exec).
    *
    * Everything runs in INTEGER CENTS: `value` is 2-decimal by
    * construction, and a windowed double sum is NOT oracle-safe — DuckDB
    * evaluates sliding frames with a segment tree, so its summation order
    * differs from Spark's running accumulation, and last-ulp drift would
    * flip round()'s half-boundary. Integer sums are order-free; the moving
    * average is exact basis-cents (sum*100 DIV n).
    */
  def q71MovingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val w7 = w.rowsBetween(-6, Window.currentRow)
    val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .withColumn("cum_cents", sum(col("cents")).over(wcum))
      .withColumn("sum7", sum(col("cents")).over(w7))
      .withColumn("n7", count(lit(1)).over(w7))
      .select(col("user_id"), col("event_id"), col("cents"), col("cum_cents"),
        expr("sum7 * 100 DIV n7").as("mavg7_cents_x100"))
  }

  /** q47: the same attribution as q24, but executed by the custom
    * whole-operator as-of join ([[graft.plans.AsOfJoinExec]]): one
    * exchange+sort per side then an O(1)-state merge scan — checked
    * against DuckDB's native ASOF JOIN like q24.
    */
  def q47AsofCustom(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type").isin("click", "view"))
      .select(col("event_id").as("v_event_id"), col("user_id").as("v_user_id"),
        col("ts").as("v_ts"))
    org.apache.spark.sql.graft.AsOf
      .join(purchases, views, "user_id", "v_user_id", "ts", "v_ts")
      .select(col("event_id"), col("user_id"), col("v_event_id").as("attr_event_id"))
  }

  /** q85: linear multi-touch attribution — each purchase's 10000 bp of
    * credit split across the same user's clicks in the preceding hour by
    * largest remainder: every click gets 10000 div n and the r = 10000 mod
    * n most-recent clicks get one extra bp, so credit sums to exactly
    * 10000 per purchase with no floating point anywhere. The band join is
    * an equi-join on user_id with a one-hour range filter (the standard
    * scale shape: hash-partition by user, never a cross product), and both
    * windows partition by purchase id.
    */
  def q85AttributionLinear(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event_id"), col("user_id"), col("ts").as("c_ts"))
    val w = Window.partitionBy(col("p_event_id"))
    val wr = w.orderBy(col("c_ts").desc, col("c_event_id"))
    p.join(c, Seq("user_id"))
      .filter(col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") - expr("INTERVAL 1 HOUR"))
      .withColumn("n_clicks", count(lit(1)).over(w))
      .withColumn("click_rank", row_number().over(wr))
      .withColumn("credit_bp",
        expr("10000 div n_clicks") +
          when(col("click_rank") <= expr("10000 % n_clicks"), 1L).otherwise(0L))
      .select(col("p_event_id"), col("c_event_id"), col("user_id"),
        col("click_rank"), col("n_clicks"), col("credit_bp"))
  }

  /** q86: month-over-month revenue growth in basis points. Sign-split
    * integer division because DuckDB's `//` floors while Spark's `div`
    * truncates — they only agree on non-negative numerators, so negative
    * growth is computed as -(abs div) on both sides. The monthly rollup is
    * a dozen rows, so the unpartitioned lag window is a non-issue.
    */
  def q86RevenueGrowth(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("revenue_cents"))
      .withColumn("prev_cents",
        lag(col("revenue_cents"), 1).over(Window.orderBy(col("month"))))
      .withColumn("growth_bp", when(col("prev_cents").isNull, lit(null))
        .when(col("revenue_cents") >= col("prev_cents"),
          expr("(revenue_cents - prev_cents) * 10000 div prev_cents"))
        .otherwise(-expr("(prev_cents - revenue_cents) * 10000 div prev_cents")))

  /** q90: journey-path mining — each user's first 5 event types (by ts,
    * with the unique event_id as tiebreak) concatenated into a path string,
    * then the corpus-wide frequency of every distinct journey. The "what do
    * users do first" report of a product-analytics pipeline.
    *
    * Shape: one user_id exchange for the ranking window; the per-user path
    * is built by sorting the ≤5 collected (rank, type) structs INSIDE the
    * aggregate (`array_sort` of a bounded array — `collect_list` alone has
    * no ordering guarantee), so no second window pass; the final path
    * rollup shuffles one short string per user.
    *
    * Data contract: `event_type` must not contain the '>' separator (the
    * q55 audit's enumerated-domain check enforces exactly this kind of
    * vocabulary bound); free-form type vocabularies would need a
    * struct-array path key or an escaping join instead.
    */
  def q90Paths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy(col("user_id"))
      .agg(expr(
        """array_join(transform(array_sort(collect_list(struct(rn, event_type))),
                                x -> x.event_type), '>')""").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** q97: peak concurrency per day — the "how many trips are on the road
    * at once" metric: sessions (q20 semantics) become ±1 boundary points,
    * and the global running sum decomposes into a per-DAY prefix sum plus
    * a cross-day carry (the tiny per-day totals cumulated and broadcast
    * back). That decomposition is the scale story: no single-partition
    * window ever sees event-scale data — day partitions bound every window
    * frame, exactly like q83's shard packing. Instant ties order
    * (delta DESC, user, session): simultaneous starts count before ends,
    * identically in both engines. A day's peak is seeded with its
    * day-start carry (sessions already open at midnight count even if the
    * day's only points are ends), and days with no boundary points inside
    * multi-day sessions emit their constant in-flight count from the tiny
    * carry frame.
    *
    * Because the day-start carry is CONSTANT within a day, the per-day
    * peak is `carry + max(local prefix sum)` — so the event-scale frame is
    * consumed exactly once (window → per-day aggregate) and the carry is
    * applied on the |days|-sized rollup, never joined back to points. The
    * earlier revision localCheckpointed the boundary points to share them
    * between a carry branch and a points branch; that materialization (and
    * its storage-memory residue, which `clearCache` does not free) was the
    * prime suspect in the r5 driver-bench regression and is gone — the
    * only node consumed twice (point days + gap days) is the |days| rollup
    * whose upstream exchanges Spark's ReuseExchange dedups.
    */
  def q97Concurrency(s: SparkSession, dir: String): DataFrame = {
    val wDay = Window.partitionBy(col("day"))
      .orderBy(col("us"), col("delta").desc, col("user_id"), col("sess_no"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // |days|-sized frame: per-day local peak/total plus the cross-day
    // carries (cumulative before/after the day) and the next boundary day
    val wDays = Window.orderBy(col("day"))
    val days = withSessionNo(Tables.events(s, dir))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
      .select(col("user_id"), col("sess_no"), explode(array(
        struct(col("start_us").as("us"), lit(1L).as("delta")),
        struct(col("end_us").as("us"), lit(-1L).as("delta")))).as("p"))
      .select(col("user_id"), col("sess_no"),
        col("p.us").as("us"), col("p.delta").as("delta"))
      .withColumn("day", expr("us div 86400000000"))
      .withColumn("local_cum", sum(col("delta")).over(wDay))
      .groupBy(col("day"))
      .agg(max(col("local_cum")).as("mx_local"),
        sum(col("delta")).as("day_delta"),
        sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_starts"),
        sum(when(col("delta") === -1, 1L).otherwise(0L)).as("n_ends"))
      .withColumn("carry", coalesce(
        sum(col("day_delta")).over(wDays.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("carry_after",
        sum(col("day_delta")).over(wDays.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("next_day", lead(col("day"), 1).over(wDays))
    // a day's peak must consider the sessions already open at midnight
    // (greatest with the day-start carry): a day whose only points are
    // session ends would otherwise under-report by one
    val pointDays = days.select(col("day"),
      greatest(col("carry") + col("mx_local"), col("carry")).as("max_concurrent"),
      col("n_starts"), col("n_ends"))
    // days with no boundary points but sessions in flight end-to-end
    // (inside multi-day sessions): constant concurrency = the carry
    val gapDays = days
      .filter(col("next_day").isNotNull && col("next_day") > col("day") + 1 &&
        col("carry_after") > 0)
      .select(explode(sequence(col("day") + 1, col("next_day") - 1)).as("day"),
        col("carry_after").as("max_concurrent"),
        lit(0L).as("n_starts"), lit(0L).as("n_ends"))
    pointDays.unionByName(gapDays)
  }

  /** q100: time-constrained ordered funnel — signup → click → purchase
    * where each step must land within 72 h of the previous one (q22 is the
    * unbounded per-user variant; this is the product-funnel report with
    * step deadlines). Per user: t1 = first signup, t2 = first qualifying
    * click after t1, t3 = first qualifying purchase after t2 — three
    * sequential window minima over ONE user_id exchange (each Window node
    * reuses the partitioning, like q95's stacked frames) — then one global
    * rollup with conversions in integer basis points.
    */
  def q100FunnelWindowed(s: SparkSession, dir: String): DataFrame = {
    val stepUs = 72L * 3600L * 1000000L
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("t1",
        min(when(col("event_type") === "signup", col("us"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" &&
          col("us") > col("t1") && col("us") <= col("t1") + stepUs, col("us"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" &&
          col("us") > col("t2") && col("us") <= col("t2") + stepUs, col("us"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"), min(col("t3")).as("t3"))
      .agg(
        count(col("t1")).as("n_signup"),
        count(col("t2")).as("n_click_72h"),
        count(col("t3")).as("n_purchase_72h"))
      .select(col("n_signup"), col("n_click_72h"), col("n_purchase_72h"),
        expr("""CASE WHEN n_signup = 0 THEN NULL
                ELSE n_click_72h * 10000 div n_signup END""").as("s2_bp"),
        expr("""CASE WHEN n_signup = 0 THEN NULL
                ELSE n_purchase_72h * 10000 div n_signup END""").as("s3_bp"))
  }

  /** q107: session engagement report — per start day: session count,
    * bounce share (single-event sessions, in integer basis points) and
    * dwell-time stats (mean via integer division; median via percentile
    * over integer milliseconds — interpolation at 0.5 lands on exact
    * halves, the q73 determinism pattern). The daily engagement health
    * dashboard of a trip/product pipeline.
    *
    * Shape: sessionization's one user_id exchange, session rollup on the
    * same partitioning, then a |days|-key aggregate.
    */
  def q107Engagement(s: SparkSession, dir: String): DataFrame = {
    withSessionNo(Tables.events(s, dir))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
      .groupBy(expr("start_us div 86400000000").as("day"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"),
        sum(expr("(end_us - start_us) div 1000")).as("total_dwell_ms"),
        expr("round(percentile((end_us - start_us) div 1000, 0.5), 4)")
          .as("p50_dwell_ms"))
      .select(col("day"), col("n_sessions"), col("n_bounces"),
        expr("n_bounces * 10000 div n_sessions").as("bounce_bp"),
        expr("total_dwell_ms div n_sessions").as("avg_dwell_ms"),
        col("p50_dwell_ms"))
  }

  /** q108: sessionization via Spark's BUILT-IN `session_window` operator —
    * the engine-native form of q20 (which chains a lag window by hand).
    * Semantics differ at exactly the gap boundary: session_window's
    * half-open [start, last+gap) window starts a NEW session when the
    * inter-event difference is ≥ gap, where q20's `> gap` keeps it — the
    * oracle mirrors `≥` so the driver pins the BUILT-IN's semantics, and
    * the emitted sess_end is `last event + gap` (the window bound), not
    * the last event itself. One user_id+window exchange, and unlike the
    * lag-chain the same expression runs unchanged under readStream with
    * a watermark — that is the operator's production value.
    */
  def q108SessionWindow(s: SparkSession, dir: String): DataFrame =
    sessionWindowAgg(Tables.events(s, dir))

  /** The q108 aggregation, factored over any (user_id, ts, value) frame so
    * the IDENTICAL expression drives both the batch query and the s11
    * stream (EventStream.sessionWindowStream) — the portability claim made
    * executable. */
  private[graft] def sessionWindowAgg(df: DataFrame): DataFrame =
    df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
      .select(col("user_id"), col("sw.start").as("sess_start"),
        col("sw.end").as("sess_end"), col("n_events"), col("value_cents"))

  /** q112: demand seasonality heatmap — event volume, distinct users and
    * value by (weekday × hour-of-day): the "when is the city busy" profile
    * every trip-data publication ships. Weekday and hour are pure integer
    * arithmetic on the epoch ((d+4) mod 7, 0=Sunday — the q91 portable
    * form; epoch-hour mod 24), never engine dayofweek()/hour() built-ins
    * whose week conventions differ. avg stays integer (cents div count;
    * values are ≥0 per the q55-audited domain, where div/floor-div
    * semantics agree). Shape: one scan → one 168-key exchange; the
    * distinct-user count is the only non-map-side-combining aggregate (at
    * 100 TB it would flip to the q96 HLL sketch).
    */
  def q112Seasonality(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("dow7", expr("((unix_micros(ts) div 86400000000) + 4) % 7"))
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy(col("dow7"), col("hod"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("cents")).as("total_cents"))
      .withColumn("avg_cents", expr("total_cents DIV n_events"))

  /** q217: DIURNAL-entropy audit per event type — the hour-of-day
    * distribution of each event type collapsed to its peak hour, peak
    * share, and entropy (millinats, via the shared
    * [[Entropy.dominantAndEntropy]] kernel). Human-driven types spread
    * across the day (entropy near ln 24 ≈ 3178 millinats); a type whose
    * hour-entropy collapses is machine-scheduled traffic (cron jobs,
    * batch imports, bot bursts) — the event-type-level complement of
    * q165's per-user cadence detector, and the q211 mix idiom applied to
    * the time axis. Hours are integer-exact UTC (unix_micros DIV 3600e6
    * mod 24 — the q112 idiom, no timezone/DST ambiguity between
    * engines). This rides the POST-EPOCH CONTRACT pinned at Tables.load:
    * Spark `div` truncates toward zero while the oracle's `//` floors, so
    * the two agree only for ts ≥ 1970 (pre-epoch rows would produce
    * negative "hours" on both engines AND diverge between them); the
    * loader spec asserts the corpus is post-epoch.
    *
    * Scale shape: one map-side-combined (type, hour) aggregate — the
    * only corpus-scale exchange, bounded at |types|·24 rows — then the
    * entropy windows run over that tiny frame.
    */
  def q217DiurnalEntropy(s: SparkSession, dir: String): DataFrame =
    graft.operators.Entropy.dominantAndEntropy(
      Tables.events(s, dir)
        .select(col("event_type"), expr("(unix_micros(ts) div 3600000000) % 24").as("hod"))
        .groupBy(col("event_type"), col("hod")).agg(count(lit(1)).as("cnt")),
      "event_type", "hod")
      .select(col("event_type"), col("n_total").as("n_events"),
        col("n_bins").as("n_hours"), col("top_bin").as("peak_hour"),
        col("top_share_bp").as("peak_share_bp"), col("entropy_x1000"))

  /** q127: nearest-event temporal join — each purchase matched to the
    * temporally CLOSEST click of the same user in EITHER direction
    * (within ±1 h): the bidirectional generalization of the as-of join
    * (q24 looks only backward). "Which interaction belongs to this
    * transaction" when causality can run both ways (a click right after
    * a purchase is usually its confirmation page).
    *
    * Shape: ONE user_id exchange and one sort carry all four window
    * projections (prev/next click id+µs over ROWS frames); the
    * nearest/tie decision is a per-row projection. Ties (equidistant
    * clicks) resolve to the EARLIER click — a stated rule, not
    * engine luck. Purchases with no click within the window drop.
    */
  def q127NearestClick(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val prevF = w.rowsBetween(Window.unboundedPreceding, -1)
    val nextF = w.rowsBetween(1, Window.unboundedFollowing)
    val clickUs = when(col("event_type") === "click", col("us"))
    val clickId = when(col("event_type") === "click", col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("pus", last(clickUs, ignoreNulls = true).over(prevF))
      .withColumn("pid", last(clickId, ignoreNulls = true).over(prevF))
      .withColumn("nus", first(clickUs, ignoreNulls = true).over(nextF))
      .withColumn("nid", first(clickId, ignoreNulls = true).over(nextF))
      .filter(col("event_type") === "purchase")
      .withColumn("dprev", col("us") - col("pus"))
      .withColumn("dnext", col("nus") - col("us"))
      // nearest, ties to the earlier (prev) click; missing side loses
      .withColumn("usePrev",
        col("pus").isNotNull && (col("nus").isNull || col("dprev") <= col("dnext")))
      .select(col("event_id"), col("user_id"),
        when(col("usePrev"), col("pid")).otherwise(col("nid")).as("click_event_id"),
        when(col("usePrev"), -col("dprev")).otherwise(col("dnext")).as("dt_us"))
      .filter(col("click_event_id").isNotNull && abs(col("dt_us")) <= 3600000000L)
  }

  /** q128: daily utilization — per (user, day): sessions started, active
    * time (Σ session durations, q20 gap semantics, a session owned by its
    * START day) and utilization in bp of the 24 h day: the
    * "how busy was each vehicle" publication metric of a fleet pipeline.
    * Shape: the single q20 user_id exchange → per-session agg → per
    * (user, day) rollup; every stage map-side combines.
    */
  def q128Utilization(s: SparkSession, dir: String): DataFrame =
    withSessionNo(Tables.events(s, dir))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(min(expr("unix_micros(ts)")).as("s_us"),
        max(expr("unix_micros(ts)")).as("e_us"))
      .groupBy(col("user_id"), expr("s_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("e_us") - col("s_us")).as("active_us"))
      .withColumn("util_bp", expr("active_us * 10000 div 86400000000"))

  /** Exact-dyadic EWMA weights for tap j (λ = 1/2): 2^-(j+1), written as
    * exact decimal literals so the SAME formula text runs on both engines.
    * cents · 2^-k is an exact double (dyadic scaling of a small integer),
    * and the fixed left-to-right textual sum of ≤8 exact terms is
    * bit-identical everywhere — this is what makes an order-dependent
    * smoother oracle-safe at all. */
  // CAST AS DOUBLE everywhere: a bare 0.5 literal parses as DECIMAL in
  // Spark SQL, silently turning the whole chain (and its rendering) into
  // decimal arithmetic — the casts pin both engines to IEEE doubles
  private def ewmaWeight(j: Int): String = java.math.BigDecimal.valueOf(1L, 0)
    .divide(java.math.BigDecimal.valueOf(1L << (j + 1))).toPlainString
  private def ewmaTerm(j: Int): String =
    s"CASE WHEN l$j IS NOT NULL THEN l$j * CAST(${ewmaWeight(j)} AS DOUBLE)" +
      " ELSE CAST(0 AS DOUBLE) END"
  private def ewmaDenTerm(j: Int): String =
    s"CASE WHEN l$j IS NOT NULL THEN CAST(${ewmaWeight(j)} AS DOUBLE)" +
      " ELSE CAST(0 AS DOUBLE) END"
  private[graft] val ewmaExpr: String = {
    val num = (0 until 8).map(ewmaTerm).mkString(" + ")
    val den = (0 until 8).map(ewmaDenTerm).mkString(" + ")
    s"round(($num) / ($den), 4)"
  }

  /** q120: exponentially-weighted moving average of each user's event
    * value — the time-series smoother (trend line) of a telemetry
    * pipeline, λ = 1/2 truncated at 8 taps (residual weight 2⁻⁸ ≈ 0.4% —
    * the truncation is the price of determinism and is renormalized away
    * by the running denominator 1−2⁻ᵏ over the available history).
    *
    * A recursive EWMA is summation-order-dependent and un-oracle-able;
    * the dyadic truncated form makes every term an EXACT double (see
    * [[ewmaExpr]]), so both engines compute bit-identical smoothed
    * values. Shape: 8 lags over ONE user_id exchange and one sort — the
    * same window every other per-user operator rides.
    */
  def q120Ewma(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    (0 until 8).foldLeft(
      Tables.events(s, dir)
        .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))) {
      (df, j) => df.withColumn(s"l$j", lag(col("cents"), j).over(w))
    }
      .select(col("event_id"), col("user_id"), col("cents"),
        expr(ewmaExpr).as("ewma_cents"))
  }

  /** q117: conversion-latency distribution — time from each user's first
    * signup to their first subsequent purchase, summarized as exact
    * quartiles: the "how long does a rider take to book after installing"
    * metric, and the latency companion of q22/q100's count funnels.
    *
    * Exactness: latencies are integer microseconds; `percentile()`'s
    * linear interpolation at quarter fractions over integers is an exact
    * double (the q73 rule), so the quartiles cannot ulp-diverge from
    * DuckDB's quantile_cont. Shape: two small per-user aggs (map-side
    * combining) joined on user_id, then one global single-row aggregate —
    * the only all-to-one movement is per-user scalars, and at 100 TB the
    * quartiles would ride q67's sketch instead.
    */
  def q117ConversionLatency(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(expr("unix_micros(ts)")).as("s_us"))
    val latencies = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts)").as("p_us"))
      .join(signups, "user_id")
      .filter(col("p_us") > col("s_us"))
      // s_us is functionally dependent on user_id — grouping by both keeps
      // the expression deterministic without a first()/any_value() crutch
      .groupBy(col("user_id"), col("s_us"))
      .agg((min(col("p_us")) - col("s_us")).as("lat_us"))
    latencies.agg(
      count(lit(1)).as("n_converted"),
      min(col("lat_us")).as("min_us"),
      expr("round(percentile(lat_us, 0.25), 4)").as("p25_us"),
      expr("round(percentile(lat_us, 0.50), 4)").as("p50_us"),
      expr("round(percentile(lat_us, 0.75), 4)").as("p75_us"),
      max(col("lat_us")).as("max_us"),
      expr("sum(lat_us) DIV count(1)").as("avg_us"))
  }

  /** q138: interval-union coverage per user — each event treated as a
    * trip occupying [ts, ts + cents·10⁴ µs); per user, the number of
    * trips, their raw summed span, and the length of the interval UNION
    * (so overlap_us = raw − covered is double-booked time). The classic
    * sweep decomposed onto a per-user frame: one user_id exchange, a
    * running `max(end)` over preceding rows (ROWS frame — bounded,
    * incremental), and each interval contributes
    * max(0, end − max(start, prev_max)) — no self-join, no explode.
    * At 100 TB the partition key widens to (user, day) exactly like q97;
    * durations are integer µs from integer cents, so both engines sum
    * identical BIGINTs.
    */
  def q138IntervalUnion(s: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(s, dir).select(
      col("user_id"), col("event_id"),
      expr("unix_micros(ts)").as("s_us"),
      (expr("unix_micros(ts)") +
        expr("CAST(round(value * 100) AS BIGINT) * 10000")).as("e_us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("s_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    iv.withColumn("prev_max", max(col("e_us")).over(w))
      .withColumn("add_us",
        when(col("prev_max").isNull || col("prev_max") < col("s_us"),
          col("e_us") - col("s_us"))
        .when(col("prev_max") >= col("e_us"), lit(0L))
        .otherwise(col("e_us") - col("prev_max")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_iv"),
        sum(col("e_us") - col("s_us")).as("raw_us"),
        sum(col("add_us")).as("covered_us"))
      .withColumn("overlap_us", col("raw_us") - col("covered_us"))
  }

  /** q140: time-DECAY multi-touch attribution — q85's linear split with
    * recency weighting: a click e 15-minute buckets before its purchase
    * weighs 2⁻ᵉ (integer weights 8,4,2,1 over the 1-hour window), and each
    * purchase's 10000 bp are split proportionally by largest remainder
    * (integer-exact; credit conserves to exactly 10000 per purchase, the
    * q85 contract). Same shape as q85 — user_id equi-join + 1 h range
    * filter, purchase-partitioned windows over ≤window/bucket-bounded
    * frames — so it scales identically; the weights are dyadic integers
    * and every division is integer div, so both engines agree bit-for-bit.
    */
  def q140DecayAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"),
        expr("unix_micros(ts)").as("p_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event_id"), col("user_id"),
        expr("unix_micros(ts)").as("c_us"))
    val w = Window.partitionBy(col("p_event_id"))
    val wr = w.orderBy(col("c_us").desc, col("c_event_id"))
    p.join(c, Seq("user_id"))
      .filter(col("c_us") <= col("p_us") &&
        col("c_us") > col("p_us") - lit(3600L * 1000000L))
      // bucket e ∈ {0,1,2,3} → weight 8 >> e (8,4,2,1)
      .withColumn("wt", expr(
        "CAST(shiftright(8, CAST((p_us - c_us) DIV 900000000 AS INT)) AS BIGINT)"))
      .withColumn("w_total", sum(col("wt")).over(w))
      .withColumn("base_bp", expr("wt * 10000 DIV w_total"))
      .withColumn("rem", expr("wt * 10000 % w_total"))
      // leftover bp go to the largest remainders (recency, then id, ties)
      .withColumn("rem_rank", row_number().over(
        w.orderBy(col("rem").desc, col("c_us").desc, col("c_event_id"))))
      .withColumn("leftover", lit(10000L) - sum(col("base_bp")).over(w))
      .withColumn("credit_bp", col("base_bp") +
        when(col("rem_rank") <= col("leftover"), 1L).otherwise(0L))
      .withColumn("click_rank", row_number().over(wr))
      .select(col("p_event_id"), col("c_event_id"), col("user_id"),
        col("click_rank"), col("wt"), col("credit_bp"))
  }

  /** q149: time-weighted average value per (user, day) — the TWAP-style
    * metric for state that HOLDS between observations (a sensor reading, a
    * price, a battery level): each event's value weighs by the µs until
    * the user's next event that day (the last holds until midnight), i.e.
    * the exact integral of the step function divided by the covered span.
    * q71's rolling mean weights OBSERVATIONS equally; this weights TIME —
    * the right average whenever sampling is irregular.
    *
    * Exactness: durations are integer µs (next event's unix_micros − this
    * one's, day end for the last), the integral Σ(cents·dur_µs) stays in
    * DECIMAL(38,0) (cents ~1e4 × µs/day ~8.6e10 × events — int64 would
    * overflow at ~1e4 events/user-day), and the average is ONE final
    * division rounded to 4dp identically in both engines.
    *
    * Shape: one user_id-day exchange for the lead() window, then the
    * (user, day) rollup reuses the same partitioning (no second
    * exchange). Spans, not counts, scale-proof the skew: a user's window
    * partition is their events in one day.
    */
  def q149TimeWeighted(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("next_us",
        coalesce(lead(col("us"), 1).over(w), (col("day") + 1) * 86400000000L))
      .withColumn("dur_us", col("next_us") - col("us"))
      .groupBy(col("user_id"), col("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("dur_us")).as("covered_us"),
        sum(expr("CAST(cents AS DECIMAL(38,0)) * dur_us")).as("integral"))
      .select(col("user_id"), col("day"), col("n_events"), col("covered_us"),
        expr("round(CAST(integral AS DOUBLE) / CAST(covered_us AS DOUBLE), 4)")
          .as("twa_cents"))
  }

  /** q243: user RETURN curve at day lags 1..14 — "of the users active on
    * day t, what share is active again on day t+k": the user-level twin
    * of q234's volume ACF (volume can echo weekly while the PEOPLE churn
    * — this is the column that tells them apart) and the day-granular
    * complement of q79's weekly cohorts / q137's trailing-window
    * stickiness. Gap-honest like q234: day t enters lag k's denominator
    * only if day t+k is an OBSERVED day (a feed outage neither fabricates
    * zero-return days nor dilutes the curve).
    *
    * Exactness: pure distinct-count integers; return_bp one all-positive
    * DIV of two exact sums; the 1..14 grid left-joins so empty lags row
    * honestly (n_day_pairs 0, NULL return_bp).
    *
    * Shape: ONE event-scale exchange — the (user, day) DISTINCT (q137's
    * argument: everything after scales with the persisted activity
    * table, |users|×|days|, not events). The user self-join on (user,
    * day+k) and the day-pair denominators run on that frame and the
    * calendar-bounded day list; the fold lands on 14 rows.
    */
  def q243ReturnCurve(s: SparkSession, dir: String): DataFrame =
    returnCurveFromActivity(Tables.events(s, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct())

  /** The return-curve estimator off an already-built DISTINCT
    * (user_id, day) activity frame — one definition serves q243 and
    * s29's maintained activity set. */
  private[graft] def returnCurveFromActivity(activity: DataFrame): DataFrame = {
    val ud = activity
      .localCheckpoint() // three consumers: both join sides + day sizes
    val s = ud.sparkSession
    val daySizes = ud.groupBy(col("day")).agg(count(lit(1)).as("n_active"))
      .localCheckpoint() // two consumers: both day-pair sides
    val lags = s.range(1, 15).select(col("id").as("lag"))
    val den = daySizes.as("x")
      .crossJoin(lags)
      .join(daySizes.as("y"), col("y.day") === col("x.day") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_day_pairs"), sum(col("x.n_active")).as("n_at_risk"))
    val num = ud.as("a")
      .crossJoin(lags)
      .join(ud.as("b"),
        col("a.user_id") === col("b.user_id") && col("b.day") === col("a.day") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_returned"))
    lags.join(den, Seq("lag"), "left").join(num, Seq("lag"), "left")
      .select(col("lag"),
        coalesce(col("n_day_pairs"), lit(0L)).as("n_day_pairs"),
        coalesce(col("n_at_risk"), lit(0L)).as("n_at_risk"),
        coalesce(col("n_returned"), lit(0L)).as("n_returned"),
        expr("""CASE WHEN coalesce(n_at_risk, 0) > 0
                     THEN (coalesce(n_returned, 0) * 10000) DIV n_at_risk
                END""").as("return_bp"))
  }

  /** q253: AUDIENCE-OVERLAP matrix — user-set Jaccard and overlap
    * coefficient for every event-type pair: do two features share an
    * audience or split it? The product read behind funnel design and
    * cross-sell targeting; the overlap coefficient catches the nested
    * case (every 'purchase' user also clicks) that Jaccard blurs —
    * q199's asymmetric-containment argument on the audience axis. Pairs
    * with ZERO shared users row with honest zeros (the grid left-join,
    * q231's lesson).
    *
    * Exactness: integer counts; all-positive DIVs (a type rows only if
    * it has ≥ 1 user, and least(a,b) ≥ 1).
    *
    * Shape: ONE distinct (type, user) exchange; the pair expansion
    * self-joins on user_id with per-user fan-out bounded by |types|²
    * (a handful), folding straight to the |types|² matrix; the grid and
    * size lookups are broadcast-tiny.
    */
  def q253AudienceOverlap(s: SparkSession, dir: String): DataFrame =
    overlapFromUserSets(Tables.events(s, dir)
      .select(col("event_type"), col("user_id")).distinct())

  /** The overlap matrix off an already-distinct (event_type, user_id)
    * membership frame — one definition serves q253 and s30's maintained
    * set. */
  private[graft] def overlapFromUserSets(ud0: DataFrame): DataFrame = {
    val ud = ud0
      .localCheckpoint() // three consumers: sizes + both pair-join sides
    val sizes = ud.groupBy(col("event_type")).agg(count(lit(1)).as("nu"))
    val inter = ud.as("a")
      .join(ud.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("ns"))
    sizes.as("sa").crossJoin(sizes.as("sb"))
      .filter(col("sa.event_type") < col("sb.event_type"))
      .select(col("sa.event_type").as("type_a"), col("sb.event_type").as("type_b"),
        col("sa.nu").as("n_users_a"), col("sb.nu").as("n_users_b"))
      .join(inter, Seq("type_a", "type_b"), "left")
      .withColumn("n_shared", coalesce(col("ns"), lit(0L)))
      .select(col("type_a"), col("type_b"), col("n_users_a"), col("n_users_b"),
        col("n_shared"),
        expr("n_shared * 10000 DIV (n_users_a + n_users_b - n_shared)")
          .as("jaccard_bp"),
        expr("n_shared * 10000 DIV least(n_users_a, n_users_b)")
          .as("overlap_bp"))
  }

  /** q254: per-user event-type ENTROPY — the behavioral-diversity bot
    * signal beside q165's cadence regularity: a human mixes types, a bot
    * hammers one endpoint. Per user (≥ 20 events — q165's floor): event
    * count, distinct types, dominant type + share, exact-integer entropy
    * (the shared [[Entropy]] kernel, q211/q217's machinery on the user
    * axis) and a `suspicious` flag for high-volume near-single-type
    * users (≥ 50 events with ≥ 9000 bp on one type). Read NEXT TO q165:
    * cadence says metronome, this says monomania — a user flagged by
    * both is a machine.
    *
    * Shape: one (user, type) map-side-combined agg; the kernel's windows
    * run on that |users × types|-bounded frame; the ≥ 20 filter keeps
    * the published table at analyst size.
    */
  def q254UserTypeEntropy(s: SparkSession, dir: String): DataFrame =
    graft.operators.Entropy.dominantAndEntropy(
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("cnt")),
      "user_id", "event_type")
      .filter(col("n_total") >= 20)
      .select(col("user_id"), col("n_total").as("n_events"),
        col("n_bins").as("n_types"), col("top_bin").as("top_type"),
        col("top_share_bp"), col("entropy_x1000"),
        (col("n_total") >= 50 && col("top_share_bp") >= 9000).as("suspicious"))

  /** q309: BRANCHING windowed funnel — the q100 family's general form
    * (the r16 verdict's other named candidate): after the `view` anchor,
    * stage 2 is EITHER of two alternatives (`click` | `signup`, the
    * earliest qualifying event wins and names the BRANCH), and the
    * `purchase` conversion is measured per branch — "which second step
    * actually converts" is the question a fixed-path funnel (q100)
    * cannot ask. Output: one row per branch (literal 2-row grid — the
    * q303 densify rule, absent branches row with zeros), with the
    * anchored-user total on every row, stage-2 reach, purchases,
    * conversion bp and the mean stage-2→purchase latency in whole
    * seconds.
    *
    * Exactness: all times are integer µs; the branch pick is
    * `least(tc, tg)` (both engines skip NULLs) with the exact-tie
    * resolving to `click` via null-safe equality — deterministic on
    * both engines; conv/latency are integer DIVs (mean µs floored, then
    * floored to seconds — one order, both engines).
    *
    * Shape: q100's discipline — ONE user_id exchange carries all three
    * chained windowed conditional-mins (each stage's window references
    * the previous stage's column on the same partitioning), the
    * per-user fold is map-side combined, and everything after runs on
    * the 2-row grid + one broadcast 1-row anchored total (the q295
    * rule).
    */
  def q309BranchingFunnel(s: SparkSession, dir: String): DataFrame =
    branchingFunnelOf(s, Tables.events(s, dir))

  /** One step of a [[matchRecognize]] pattern: a label, the event type
    * the step consumes, and a quantifier (`one`, `star` — greedy ≥ 0,
    * `plus` — greedy ≥ 1). Steps match CONTIGUOUS rows, the
    * MATCH_RECOGNIZE row-pattern discipline. */
  final case class PatternStep(label: String, eventType: String,
      quant: String) {
    require(Seq("one", "star", "plus").contains(quant),
      s"quantifier must be one|star|plus, got '$quant'")
  }

  /** q310's engine: MATCH_RECOGNIZE-style sequential row-pattern
    * matching — the general form q22/q113/q309 all specialize (those
    * pick fixed stage lists; this takes an arbitrary contiguous pattern
    * with quantifiers). Semantics follow the SQL standard's defaults:
    * rows per user ordered by (ts, event_id); GREEDY quantifiers with
    * backtracking; matches emitted left-to-right with AFTER MATCH SKIP
    * PAST LAST ROW (no overlapping matches). Output: one row per match
    * — user_id, start/end event ids, per-star/plus-step consumed
    * counts, span seconds (exact integer measures only, the §6 rule).
    *
    * Shape: ONE exchange on user_id, then executor-side matching inside
    * `flatMapGroups` over each user's collected, sorted row array (the
    * q176 discipline: per-key state bounded by one user's event count —
    * session-scale; a pathological single hot key is the same skew every
    * per-user window here carries, and the documented salting remedy
    * applies). The matcher is a ~20-line backtracking walk, not a regex
    * engine: patterns are short and predicates are type-equality, so
    * the worst case is O(rows · pattern) per user with greedy star
    * back-off bounded by run lengths.
    */
  private[graft] def matchRecognize(ev: DataFrame,
      steps: Seq[PatternStep]): DataFrame = {
    require(steps.nonEmpty, "matchRecognize needs at least one step")
    val s = ev.sparkSession
    import s.implicits._
    val starLabels = steps.filter(_.quant != "one").map(_.label)
    val stepTypes = steps.map(_.eventType).toArray
    val stepQuants = steps.map(_.quant).toArray
    // the loud skew guard (dedup-bucket style, default generous): one
    // user's full history materializes per task below, so a bot account
    // with 10⁸ events would otherwise OOM the executor silently — the
    // cap names the key and the remedies instead
    val maxUserRows = s.conf.getOption("graft.match.maxUserRows")
      .map(_.toInt).getOrElse(5000000)
    val typed = ev.select(
      col("user_id").cast("long"), col("event_type"),
      unix_micros(col("ts")), col("event_id").cast("long"))
      .as[(Long, String, Long, Long)]
    val matched = typed.groupByKey(_._1).flatMapGroups { (uid, it) =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long)]
      while (it.hasNext) {
        buf += it.next()
        if (buf.length > maxUserRows)
          throw new IllegalStateException(
            s"matchRecognize: user $uid exceeds graft.match.maxUserRows=" +
              s"$maxUserRows events — a key this hot dominates one task " +
              "(bot-account shape); raise the cap, pre-filter the user, or " +
              "bound the input window before matching")
      }
      val rows = buf.toArray.sortBy(r => (r._3, r._4))
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Seq[Long], Long)]
      /** Greedy match of steps(si..) at rows(pos..): returns (end index,
        * consumed count per step) for the LONGEST-first quantifier
        * assignment, None if no assignment completes the pattern. */
      def go(pos: Int, si: Int): Option[(Int, List[Long])] = {
        if (si == stepTypes.length) return Some((pos - 1, Nil))
        val t = stepTypes(si)
        stepQuants(si) match {
          case "one" =>
            if (pos < rows.length && rows(pos)._2 == t)
              go(pos + 1, si + 1).map { case (e, c) => (e, 1L :: c) }
            else None
          case q =>
            var run = 0
            while (pos + run < rows.length && rows(pos + run)._2 == t) run += 1
            val minK = if (q == "plus") 1 else 0
            var k = run
            while (k >= minK) {
              go(pos + k, si + 1) match {
                case Some((e, c)) => return Some((e, k.toLong :: c))
                case None => k -= 1
              }
            }
            None
        }
      }
      var i = 0
      while (i < rows.length) {
        go(i, 0) match {
          // `end >= i` rejects the EMPTY match an all-star pattern can
          // produce (zero rows consumed) — the standard's minimum-one-row
          // rule, and what keeps skip-past from looping in place
          case Some((end, counts)) if end >= i =>
            val starCounts = steps.indices
              .filter(si => stepQuants(si) != "one").map(si => counts(si))
            out += ((uid, rows(i)._4, rows(end)._4, starCounts,
              (rows(end)._3 - rows(i)._3) / 1000000L))
            i = end + 1 // AFTER MATCH SKIP PAST LAST ROW
          case _ => i += 1
        }
      }
      out
    }
    val base = matched.toDF("user_id", "start_event_id", "end_event_id",
      "star_counts", "span_s")
    starLabels.zipWithIndex.foldLeft(base) { case (df, (lbl, i)) =>
      df.withColumn(s"n_$lbl", element_at(col("star_counts"), i + 1))
    }.drop("star_counts")
  }

  /** q310: event-pattern matches — the registered MATCH_RECOGNIZE run:
    * `view (click)* purchase` over contiguous per-user rows, skip past
    * last row. For THIS pattern the greedy NFA's matches coincide with
    * a closed-form SQL mirror (a match is a view row whose FIRST
    * following non-click row is a purchase; no view can occur inside a
    * match span, so matches are naturally disjoint and backtracking
    * never fires) — which is what makes the operator class oracleable:
    * the engine is general, the pinned query picks a pattern whose
    * match set has a pure-SQL characterization. The planted-sequence
    * spec exercises the general engine (plus-quantifiers, backtracking
    * shapes, skip-past overlap suppression) beyond what the oracle can.
    */
  def q310EventPatterns(s: SparkSession, dir: String): DataFrame =
    matchRecognize(Tables.events(s, dir), Seq(
      PatternStep("start", "view", "one"),
      PatternStep("clicks", "click", "star"),
      PatternStep("buy", "purchase", "one")))
      .select(col("user_id"), col("start_event_id"), col("end_event_id"),
        col("n_clicks"), col("span_s"))

  /** q311: the PLUS-quantifier MATCH_RECOGNIZE run — `(click)+ purchase`,
    * a maximal run of ≥ 1 clicks immediately followed by a purchase (the
    * "click burst that converted"). Greedy + skip-past give THIS pattern
    * a closed form too, by a different argument than q310's: greedy
    * consumes the whole click run; every backtracked shorter assignment
    * still faces a CLICK (not a purchase) at the next step, so
    * backtracking can never succeed; and a match consumes run + purchase
    * whole, so skip-past never splits a run. Match set ≡ one row per
    * (maximal click run, directly-following purchase) pair — the
    * gaps-and-islands SQL below, which is what lets the plus quantifier
    * carry its own DuckDB oracle (q310 exercises star; the planted spec
    * exercises backtracking shapes no closed form covers). */
  def q311ClickBursts(s: SparkSession, dir: String): DataFrame =
    matchRecognize(Tables.events(s, dir), Seq(
      PatternStep("clicks", "click", "plus"),
      PatternStep("buy", "purchase", "one")))
      .select(col("user_id"), col("start_event_id"), col("end_event_id"),
        col("n_clicks"), col("span_s"))

  /** q309 on ANY (user_id, event_type, ts) frame — spec'd on planted
    * tie/branch/window-expiry users beside the oracled corpus run. */
  private[graft] def branchingFunnelOf(s: SparkSession, ev: DataFrame): DataFrame = {
    val stepUs = 72L * 3600L * 1000000L
    val w = Window.partitionBy(col("user_id"))
    val perUser = ev
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("tc", min(when(col("event_type") === "click" &&
        col("us") > col("t1") && col("us") <= col("t1") + stepUs, col("us"))).over(w))
      .withColumn("tg", min(when(col("event_type") === "signup" &&
        col("us") > col("t1") && col("us") <= col("t1") + stepUs, col("us"))).over(w))
      .withColumn("t2", least(col("tc"), col("tg")))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("us") > col("t2") && col("us") <= col("t2") + stepUs, col("us"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("t1")).as("t1"), min(col("tc")).as("tc"),
        min(col("t2")).as("t2"), min(col("t3")).as("t3"))
      .withColumn("branch",
        when(col("t2").isNull, lit(null))
          .when(col("tc") <=> col("t2"), lit("click")) // exact tie → click
          .otherwise(lit("signup")))
      .localCheckpoint() // two consumers: the branch fold + the total
    val per = perUser.filter(col("branch").isNotNull)
      .groupBy(col("branch"))
      .agg(count(lit(1)).as("n_stage2"),
        count(col("t3")).as("n_purchase"),
        sum(when(col("t3").isNotNull, col("t3") - col("t2"))).as("lat_us"))
    val anchored = perUser.agg(count(col("t1")).as("n_anchored"))
    import s.implicits._
    Seq("click", "signup").toDF("branch")
      .join(broadcast(per), Seq("branch"), "left")
      .na.fill(0L, Seq("n_stage2", "n_purchase"))
      .crossJoin(broadcast(anchored))
      .select(col("branch"), col("n_anchored"), col("n_stage2"), col("n_purchase"),
        expr("CASE WHEN n_stage2 > 0 THEN n_purchase * 10000 DIV n_stage2 END")
          .as("conv_bp"),
        expr("CASE WHEN n_purchase > 0 THEN lat_us DIV n_purchase DIV 1000000 END")
          .as("mean_lat_s"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q310_event_patterns" -> (q310EventPatterns _),
    "q311_click_bursts" -> (q311ClickBursts _),
    "q309_branching_funnel" -> (q309BranchingFunnel _),
    "q253_audience_overlap" -> (q253AudienceOverlap _),
    "q254_user_type_entropy" -> (q254UserTypeEntropy _),
    "q243_return_curve" -> (q243ReturnCurve _),
    "q217_diurnal_entropy" -> (q217DiurnalEntropy _),
    "q149_time_weighted" -> (q149TimeWeighted _),
    "q138_interval_union" -> (q138IntervalUnion _),
    "q140_decay_attribution" -> (q140DecayAttribution _),
    "q136_sliding_window" -> (q136SlidingWindow _),
    "q127_nearest_click" -> (q127NearestClick _),
    "q128_utilization" -> (q128Utilization _),
    "q120_ewma" -> (q120Ewma _),
    "q117_conversion_latency" -> (q117ConversionLatency _),
    "q112_seasonality"     -> (q112Seasonality _),
    "q108_session_window"  -> (q108SessionWindow _),
    "q107_engagement"      -> (q107Engagement _),
    "q100_funnel_windowed" -> (q100FunnelWindowed _),
    "q97_concurrency"      -> (q97Concurrency _),
    "q90_paths"            -> (q90Paths _),
    "q85_attribution_linear" -> (q85AttributionLinear _),
    "q86_revenue_growth"   -> (q86RevenueGrowth _),
    "q20_sessionize"       -> (q20Sessionize _),
    "q293_session_size_profile" -> (q293SessionSizeProfile _),
    "q47_asof_custom"      -> (q47AsofCustom _),
    "q21_time_bucket"      -> (q21TimeBucket _),
    "q22_funnel"           -> (q22Funnel _),
    "q23_json_props"       -> (q23JsonProps _),
    "q24_asof_attribution" -> (q24AsofAttribution _),
    "q25_monthly_revenue"  -> (q25MonthlyRevenue _),
    "q26_event_gaps"       -> (q26EventGaps _),
    "q27_first_last"       -> (q27FirstLast _),
    "q60_trip_metrics"     -> (q60TripMetrics _),
    "q62_resample_ffill"   -> (q62ResampleFfill _),
    "q71_moving_avg"       -> (q71MovingAvg _))

  val oracles: Map[String, String] = Map(
    "q310_event_patterns" ->
      """WITH seq AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS rn
           FROM events),
         stops AS (
           SELECT user_id, rn FROM seq WHERE event_type <> 'click'),
         m AS (
           SELECT v.user_id, v.rn AS srn, min(t.rn) AS ern
           FROM seq v
           JOIN stops t ON t.user_id = v.user_id AND t.rn > v.rn
           WHERE v.event_type = 'view'
           GROUP BY 1, 2)
         SELECT m.user_id,
                ss.event_id AS start_event_id,
                se.event_id AS end_event_id,
                CAST(m.ern - m.srn - 1 AS BIGINT) AS n_clicks,
                (se.us - ss.us) // 1000000 AS span_s
         FROM m
         JOIN seq ss ON ss.user_id = m.user_id AND ss.rn = m.srn
         JOIN seq se ON se.user_id = m.user_id AND se.rn = m.ern
         WHERE se.event_type = 'purchase'""",
    "q311_click_bursts" ->
      """WITH seq AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS rn
           FROM events),
         clicks AS (
           SELECT user_id, rn, event_id, us,
                  rn - row_number() OVER (PARTITION BY user_id
                                          ORDER BY rn) AS grp
           FROM seq WHERE event_type = 'click'),
         cr AS (
           SELECT user_id, grp, min(rn) AS srn, max(rn) AS ern,
                  CAST(count(*) AS BIGINT) AS n_clicks
           FROM clicks GROUP BY 1, 2)
         SELECT cr.user_id,
                ss.event_id AS start_event_id,
                p.event_id AS end_event_id,
                cr.n_clicks,
                (p.us - ss.us) // 1000000 AS span_s
         FROM cr
         JOIN seq ss ON ss.user_id = cr.user_id AND ss.rn = cr.srn
         JOIN seq p  ON p.user_id  = cr.user_id AND p.rn  = cr.ern + 1
         WHERE p.event_type = 'purchase'""",
    "q309_branching_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         l1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
                  OVER (PARTITION BY user_id) AS t1 FROM e),
         l2 AS (SELECT *,
                  min(CASE WHEN event_type = 'click' AND us > t1
                           AND us <= t1 + 259200000000 THEN us END)
                    OVER (PARTITION BY user_id) AS tc,
                  min(CASE WHEN event_type = 'signup' AND us > t1
                           AND us <= t1 + 259200000000 THEN us END)
                    OVER (PARTITION BY user_id) AS tg
                FROM l1),
         l3 AS (SELECT *, least(tc, tg) AS t2 FROM l2),
         l4 AS (SELECT *,
                  min(CASE WHEN event_type = 'purchase' AND us > t2
                           AND us <= t2 + 259200000000 THEN us END)
                    OVER (PARTITION BY user_id) AS t3
                FROM l3),
         u AS (SELECT user_id, min(t1) AS t1, min(tc) AS tc,
                      min(t2) AS t2, min(t3) AS t3
               FROM l4 GROUP BY 1),
         ub AS (SELECT *, CASE WHEN t2 IS NULL THEN NULL
                               WHEN tc IS NOT DISTINCT FROM t2 THEN 'click'
                               ELSE 'signup' END AS branch FROM u),
         tot AS (SELECT CAST(count(t1) AS BIGINT) AS n_anchored FROM ub),
         per AS (SELECT branch, CAST(count(*) AS BIGINT) AS n_stage2,
                        CAST(count(t3) AS BIGINT) AS n_purchase,
                        CAST(sum(CASE WHEN t3 IS NOT NULL THEN t3 - t2 END)
                          AS BIGINT) AS lat_us
                 FROM ub WHERE branch IS NOT NULL GROUP BY 1),
         g AS (SELECT unnest(['click', 'signup']) AS branch)
         SELECT g.branch, tot.n_anchored,
                COALESCE(per.n_stage2, 0) AS n_stage2,
                COALESCE(per.n_purchase, 0) AS n_purchase,
                CASE WHEN COALESCE(per.n_stage2, 0) > 0
                     THEN COALESCE(per.n_purchase, 0) * 10000 // per.n_stage2
                END AS conv_bp,
                CASE WHEN COALESCE(per.n_purchase, 0) > 0
                     THEN per.lat_us // per.n_purchase // 1000000
                END AS mean_lat_s
         FROM g LEFT JOIN per USING (branch) CROSS JOIN tot""",
    "q253_audience_overlap" ->
      """WITH ud AS (SELECT DISTINCT event_type, user_id FROM events),
         sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nu
                FROM ud GROUP BY 1),
         iv AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                       CAST(count(*) AS BIGINT) AS ns
                FROM ud a JOIN ud b
                  ON a.user_id = b.user_id AND a.event_type < b.event_type
                GROUP BY 1, 2)
         SELECT sa.event_type AS type_a, sb.event_type AS type_b,
                sa.nu AS n_users_a, sb.nu AS n_users_b,
                COALESCE(iv.ns, 0) AS n_shared,
                (COALESCE(iv.ns, 0) * 10000)
                  // (sa.nu + sb.nu - COALESCE(iv.ns, 0)) AS jaccard_bp,
                (COALESCE(iv.ns, 0) * 10000) // least(sa.nu, sb.nu)
                  AS overlap_bp
         FROM sz sa JOIN sz sb ON sa.event_type < sb.event_type
         LEFT JOIN iv ON iv.type_a = sa.event_type
                     AND iv.type_b = sb.event_type""",
    "q254_user_type_entropy" -> {
      val base = graft.operators.Entropy.dominantAndEntropySql(
        "SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt " +
          "FROM events GROUP BY 1, 2",
        "user_id", "event_type", "n_events", "n_types", "top_type")
      s"""SELECT user_id, n_events, n_types, top_type, top_share_bp,
                 entropy_x1000,
                 n_events >= 50 AND top_share_bp >= 9000 AS suspicious
          FROM ($base) WHERE n_events >= 20"""
    },
    "q243_return_curve" ->
      """WITH ud AS (
           SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
           FROM events),
         ds AS (SELECT day, CAST(count(*) AS BIGINT) AS n_active
                FROM ud GROUP BY 1),
         lags AS (SELECT unnest(generate_series(1, 14)) AS lag),
         den AS (
           SELECT lag, CAST(count(*) AS BIGINT) AS n_day_pairs,
                  CAST(sum(x.n_active) AS BIGINT) AS n_at_risk
           FROM ds x CROSS JOIN lags JOIN ds y ON y.day = x.day + lag
           GROUP BY 1),
         num AS (
           SELECT lag, CAST(count(*) AS BIGINT) AS n_returned
           FROM ud a CROSS JOIN lags
           JOIN ud b ON a.user_id = b.user_id AND b.day = a.day + lag
           GROUP BY 1)
         SELECT l.lag, coalesce(d.n_day_pairs, 0) AS n_day_pairs,
                coalesce(d.n_at_risk, 0) AS n_at_risk,
                coalesce(n.n_returned, 0) AS n_returned,
                CASE WHEN coalesce(d.n_at_risk, 0) > 0
                     THEN (coalesce(n.n_returned, 0) * 10000) // d.n_at_risk
                END AS return_bp
         FROM lags l LEFT JOIN den d USING (lag) LEFT JOIN num n USING (lag)""",
    "q217_diurnal_entropy" -> {
      val base = graft.operators.Entropy.dominantAndEntropySql(
        "SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hod, " +
          "count(*) AS cnt FROM events GROUP BY 1, 2",
        "event_type", "hod", "n_events", "n_hours", "peak_hour")
      s"""SELECT event_type, n_events, n_hours, peak_hour,
                 top_share_bp AS peak_share_bp, entropy_x1000
          FROM ($base)"""
    },
    "q149_time_weighted" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
                  epoch_us(ts) // 86400000000 AS day,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         seg AS (
           SELECT user_id, day, cents,
                  coalesce(lead(us, 1) OVER (PARTITION BY user_id, day
                                             ORDER BY us, event_id),
                           (day + 1) * 86400000000) - us AS dur_us
           FROM e)
         SELECT user_id, day,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(dur_us) AS BIGINT) AS covered_us,
                round(CAST(sum(CAST(cents AS HUGEINT) * dur_us) AS DOUBLE)
                      / CAST(CAST(sum(dur_us) AS BIGINT) AS DOUBLE), 4) AS twa_cents
         FROM seg GROUP BY 1, 2""",
    "q138_interval_union" ->
      """WITH iv AS (
           SELECT user_id, event_id, epoch_us(ts) AS s_us,
                  epoch_us(ts) + CAST(round(value * 100) AS BIGINT) * 10000 AS e_us
           FROM events),
         w AS (
           SELECT user_id, s_us, e_us,
                  max(e_us) OVER (PARTITION BY user_id ORDER BY s_us, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS prev_max
           FROM iv),
         g AS (
           SELECT user_id, count(*) AS n_iv,
                  CAST(sum(e_us - s_us) AS BIGINT) AS raw_us,
                  CAST(sum(CASE
                    WHEN prev_max IS NULL OR prev_max < s_us THEN e_us - s_us
                    WHEN prev_max >= e_us THEN 0
                    ELSE e_us - prev_max END) AS BIGINT) AS covered_us
           FROM w GROUP BY user_id)
         SELECT user_id, n_iv, raw_us, covered_us,
                raw_us - covered_us AS overlap_us
         FROM g""",
    "q140_decay_attribution" ->
      """WITH p AS (
           SELECT event_id AS p_event_id, user_id, epoch_us(ts) AS p_us
           FROM events WHERE event_type = 'purchase'),
         c AS (
           SELECT event_id AS c_event_id, user_id, epoch_us(ts) AS c_us
           FROM events WHERE event_type = 'click'),
         j AS (
           SELECT p_event_id, c_event_id, p.user_id AS user_id, p_us, c_us,
                  CAST(8 >> CAST((p_us - c_us) // 900000000 AS INT) AS BIGINT) AS wt
           FROM p JOIN c ON p.user_id = c.user_id
           WHERE c_us <= p_us AND c_us > p_us - 3600000000),
         w AS (
           SELECT *, sum(wt) OVER (PARTITION BY p_event_id) AS w_total FROM j),
         b AS (
           SELECT *, wt * 10000 // w_total AS base_bp,
                  wt * 10000 % w_total AS rem,
                  row_number() OVER (PARTITION BY p_event_id
                    ORDER BY c_us DESC, c_event_id) AS click_rank
           FROM w),
         f AS (
           SELECT *, row_number() OVER (PARTITION BY p_event_id
                    ORDER BY rem DESC, c_us DESC, c_event_id) AS rem_rank,
                  10000 - sum(base_bp) OVER (PARTITION BY p_event_id) AS leftover
           FROM b)
         SELECT p_event_id, c_event_id, user_id, click_rank, wt,
                CAST(base_bp + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
                  AS BIGINT) AS credit_bp
         FROM f""",
    // each event's 4 containing windows are the grid starts
    // (us div 15min − i)·15min for i in 0..3 — membership in the
    // half-open hour [start, start+1h) holds for exactly those i, so no
    // range filter is needed: (us mod 15min) + i·15min < 1h for all i ≤ 3
    "q136_sliding_window" ->
      """WITH e AS (
           SELECT epoch_us(ts) AS us, event_type, value FROM events),
         w AS (
           SELECT ((us // 900000000) - t.i) * 900000000 AS w_start_us,
                  event_type, value
           FROM e CROSS JOIN generate_series(0, 3) t(i))
         SELECT w_start_us, event_type, count(*) AS n,
                CAST(round(sum(CAST(value AS DECIMAL(8,2))), 2) AS DOUBLE) AS total_value
         FROM w GROUP BY 1, 2""",
    "q127_nearest_click" -> {
      val prevF = "OVER (PARTITION BY user_id ORDER BY us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
      val nextF = "OVER (PARTITION BY user_id ORDER BY us, event_id " +
        "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)"
      s"""WITH e AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us
            FROM events),
          w AS (
            SELECT *,
              last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS) $prevF AS pus,
              last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) $prevF AS pid,
              first_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS) $nextF AS nus,
              first_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) $nextF AS nid
            FROM e),
          p AS (
            SELECT event_id, user_id,
              CASE WHEN pus IS NOT NULL AND (nus IS NULL OR us - pus <= nus - us)
                   THEN pid ELSE nid END AS click_event_id,
              CASE WHEN pus IS NOT NULL AND (nus IS NULL OR us - pus <= nus - us)
                   THEN -(us - pus) ELSE nus - us END AS dt_us
            FROM w WHERE event_type = 'purchase')
          SELECT event_id, user_id, click_event_id, dt_us
          FROM p
          WHERE click_event_id IS NOT NULL AND abs(dt_us) <= 3600000000"""
    },
    "q128_utilization" ->
      """WITH l AS (
           SELECT user_id, ts, event_id,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS prev_us
           FROM events),
         se AS (
           SELECT user_id, epoch_us(ts) AS us,
                  CAST(sum(CASE WHEN prev_us IS NULL
                                  OR epoch_us(ts) - prev_us > 1800000000
                                THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
                    AS sess_no
           FROM l),
         sess AS (
           SELECT user_id, sess_no, min(us) AS s_us, max(us) AS e_us
           FROM se GROUP BY 1, 2)
         SELECT user_id, s_us // 86400000000 AS day,
                count(*) AS n_sessions,
                CAST(sum(e_us - s_us) AS BIGINT) AS active_us,
                CAST(CAST(sum(e_us - s_us) AS BIGINT) * 10000
                     // 86400000000 AS BIGINT) AS util_bp
         FROM sess GROUP BY 1, 2""",
    "q120_ewma" -> {
      val lags = (0 until 8).map(j =>
        s"lag(cents, $j) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS l$j")
        .mkString(", ")
      s"""WITH b AS (
            SELECT event_id, user_id, ts,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events),
          l AS (SELECT event_id, user_id, cents, $lags FROM b)
          SELECT event_id, user_id, cents, $ewmaExpr AS ewma_cents
          FROM l"""
    },
    "q117_conversion_latency" ->
      """WITH s AS (SELECT user_id, min(epoch_us(ts)) AS s_us
                    FROM events WHERE event_type = 'signup' GROUP BY user_id),
         l AS (SELECT e.user_id, min(epoch_us(e.ts)) - s.s_us AS lat_us
               FROM events e JOIN s ON e.user_id = s.user_id
               WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s.s_us
               GROUP BY e.user_id, s.s_us)
         SELECT count(*) AS n_converted,
                min(lat_us) AS min_us,
                round(quantile_cont(lat_us, 0.25), 4) AS p25_us,
                round(quantile_cont(lat_us, 0.50), 4) AS p50_us,
                round(quantile_cont(lat_us, 0.75), 4) AS p75_us,
                max(lat_us) AS max_us,
                CAST(sum(lat_us) AS BIGINT) // count(*) AS avg_us
         FROM l""",
    "q112_seasonality" ->
      """SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow7,
                (epoch_us(ts) // 3600000000) % 24 AS hod,
                count(*) AS n_events,
                count(DISTINCT user_id) AS n_users,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                  AS total_cents,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                  // count(*) AS avg_cents
         FROM events GROUP BY 1, 2""",
    "q108_session_window" ->
      """WITH l AS (
           SELECT user_id, ts, value, event_id,
                  lag(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev_ts
           FROM events),
         s AS (
           -- >= (not >): session_window's half-open [start, last+gap)
           -- window starts a NEW session at exactly the gap boundary
           SELECT user_id, ts, value,
                  CAST(sum(CASE WHEN prev_ts IS NULL
                                  OR ts - prev_ts >= INTERVAL 30 MINUTE
                                THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
                    AS sess_no
           FROM l)
         SELECT user_id, min(ts) AS sess_start,
                max(ts) + INTERVAL 30 MINUTE AS sess_end,
                count(*) AS n_events,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                  AS value_cents
         FROM s GROUP BY user_id, sess_no""",
    "q107_engagement" ->
      """WITH l AS (
           SELECT user_id, ts, event_id,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS prev_us
           FROM events),
         se AS (
           SELECT user_id, ts,
                  CAST(sum(CASE WHEN prev_us IS NULL
                                  OR epoch_us(ts) - prev_us > 1800000000
                                THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
                    AS sess_no
           FROM l),
         t AS (
           SELECT user_id, sess_no, count(*) AS n_events,
                  min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
           FROM se GROUP BY 1, 2),
         d AS (
           SELECT start_us // 86400000000 AS day,
                  count(*) AS n_sessions,
                  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_bounces,
                  CAST(sum((end_us - start_us) // 1000) AS BIGINT) AS total_dwell_ms,
                  round(quantile_cont((end_us - start_us) // 1000, 0.5), 4)
                    AS p50_dwell_ms
           FROM t GROUP BY 1)
         SELECT day, n_sessions, n_bounces,
                CAST(n_bounces * 10000 // n_sessions AS BIGINT) AS bounce_bp,
                CAST(total_dwell_ms // n_sessions AS BIGINT) AS avg_dwell_ms,
                p50_dwell_ms
         FROM d""",
    "q100_funnel_windowed" ->
      """WITH e AS (
           SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         u1 AS (
           SELECT user_id,
                  min(CASE WHEN event_type = 'signup' THEN us END) AS t1
           FROM e GROUP BY user_id),
         u2 AS (
           SELECT e.user_id, t1,
                  min(CASE WHEN event_type = 'click' AND us > t1
                             AND us <= t1 + 259200000000 THEN us END) AS t2
           FROM e JOIN u1 USING (user_id) GROUP BY e.user_id, t1),
         u3 AS (
           SELECT e.user_id, t1, t2,
                  min(CASE WHEN event_type = 'purchase' AND us > t2
                             AND us <= t2 + 259200000000 THEN us END) AS t3
           FROM e JOIN u2 USING (user_id) GROUP BY e.user_id, t1, t2)
         SELECT count(t1) AS n_signup,
                count(t2) AS n_click_72h,
                count(t3) AS n_purchase_72h,
                CASE WHEN count(t1) = 0 THEN NULL
                     ELSE CAST(count(t2) * 10000 // count(t1) AS BIGINT) END AS s2_bp,
                CASE WHEN count(t1) = 0 THEN NULL
                     ELSE CAST(count(t3) * 10000 // count(t1) AS BIGINT) END AS s3_bp
         FROM u3""",
    "q97_concurrency" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         l AS (
           SELECT user_id, us, event_id,
                  lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                    AS prev_us
           FROM e),
         s AS (
           SELECT user_id, us,
                  CAST(sum(CASE WHEN prev_us IS NULL
                                  OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT)
                    AS sess_no
           FROM l),
         t AS (
           SELECT user_id, sess_no, min(us) AS start_us, max(us) AS end_us
           FROM s GROUP BY 1, 2),
         p AS (
           SELECT user_id, sess_no, start_us AS us, CAST(1 AS BIGINT) AS delta FROM t
           UNION ALL
           SELECT user_id, sess_no, end_us, CAST(-1 AS BIGINT) FROM t),
         r AS (
           SELECT us // 86400000000 AS day, delta,
                  CAST(sum(delta) OVER (ORDER BY us, delta DESC, user_id, sess_no
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                    AS conc
           FROM p),
         pd AS (
           SELECT day, max(conc) AS mx,
                  CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
                  CAST(sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends
           FROM r GROUP BY day),
         tot AS (SELECT day, CAST(sum(delta) AS BIGINT) AS dd FROM r GROUP BY day),
         car AS (
           SELECT day,
                  CAST(coalesce(sum(dd) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                    AS carry,
                  CAST(sum(dd) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                    AS carry_after,
                  lead(day) OVER (ORDER BY day) AS next_day
           FROM tot)
         SELECT pd.day, greatest(mx, carry) AS max_concurrent, n_starts, n_ends
         FROM pd JOIN car USING (day)
         UNION ALL
         SELECT unnest(generate_series(day + 1, next_day - 1)) AS day,
                carry_after AS max_concurrent,
                CAST(0 AS BIGINT) AS n_starts, CAST(0 AS BIGINT) AS n_ends
         FROM car
         WHERE next_day IS NOT NULL AND next_day > day + 1 AND carry_after > 0""",
    "q90_paths" ->
      """WITH r AS (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM events),
         p AS (
           SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
           FROM r WHERE rn <= 5 GROUP BY user_id)
         SELECT path, count(*) AS n_users FROM p GROUP BY path""",
    "q85_attribution_linear" ->
      """WITH p AS (
           SELECT event_id AS p_event_id, user_id, ts AS p_ts
           FROM events WHERE event_type = 'purchase'),
         c AS (
           SELECT event_id AS c_event_id, user_id, ts AS c_ts
           FROM events WHERE event_type = 'click'),
         j AS (
           SELECT p_event_id, c_event_id, user_id,
                  count(*) OVER (PARTITION BY p_event_id) AS n_clicks,
                  row_number() OVER (PARTITION BY p_event_id
                                     ORDER BY c_ts DESC, c_event_id) AS click_rank
           FROM p JOIN c USING (user_id)
           WHERE c_ts <= p_ts AND c_ts > p_ts - INTERVAL 1 HOUR)
         SELECT p_event_id, c_event_id, user_id,
                CAST(click_rank AS INTEGER) AS click_rank, n_clicks,
                CAST(10000 // n_clicks
                     + CASE WHEN click_rank <= 10000 % n_clicks THEN 1 ELSE 0 END
                  AS BIGINT) AS credit_bp
         FROM j""",
    "q86_revenue_growth" ->
      """WITH m AS (
           SELECT strftime(o_orderdate, '%Y-%m') AS month,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                    AS revenue_cents
           FROM orders GROUP BY 1),
         g AS (
           SELECT month, revenue_cents,
                  lag(revenue_cents) OVER (ORDER BY month) AS prev_cents
           FROM m)
         SELECT month, revenue_cents, prev_cents,
                CASE WHEN prev_cents IS NULL THEN NULL
                     WHEN revenue_cents >= prev_cents
                       THEN CAST((revenue_cents - prev_cents) * 10000 // prev_cents AS BIGINT)
                     ELSE CAST(-((prev_cents - revenue_cents) * 10000 // prev_cents) AS BIGINT)
                END AS growth_bp
         FROM g""",
    "q293_session_size_profile" ->
      """WITH e AS (
           SELECT user_id, ts, event_id,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events),
         s AS (
           SELECT user_id, ts,
                  CAST(sum(CASE WHEN prev_ts IS NULL
                            OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess_no
           FROM e),
         sess AS (
           SELECT user_id, sess_no, CAST(count(*) AS BIGINT) AS n_events,
                  epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
           FROM s GROUP BY 1, 2),
         b AS (
           SELECT CASE WHEN n_events = 1 THEN 'a_single'
                       WHEN n_events <= 4 THEN 'b_2_4'
                       WHEN n_events <= 9 THEN 'c_5_9'
                       ELSE 'd_10_plus' END AS band,
                  n_events, dur_us
           FROM sess),
         a AS (
           SELECT band, CAST(count(*) AS BIGINT) AS n_sessions,
                  CAST(sum(n_events) AS BIGINT) AS n_events,
                  CAST(sum(dur_us) AS BIGINT) AS dur_us
           FROM b GROUP BY 1),
         t AS (SELECT CAST(sum(n_sessions) AS BIGINT) AS ts_,
                      CAST(sum(n_events) AS BIGINT) AS te FROM a)
         SELECT band, n_sessions, n_events,
                n_sessions * 10000 // ts_ AS session_share_bp,
                n_events * 10000 // te AS event_share_bp,
                dur_us // 1000000 // n_sessions AS mean_dur_s
         FROM a CROSS JOIN t""",
    "q20_sessionize" ->
      """WITH e AS (
           SELECT user_id, ts, value, event_id,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events),
         s AS (
           SELECT user_id, ts, value,
                  CAST(sum(CASE WHEN prev_ts IS NULL
                            OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess_no
           FROM e)
         SELECT user_id, sess_no, count(*) AS n_events,
                min(ts) AS sess_start, max(ts) AS sess_end,
                CAST(round(sum(CAST(value AS DECIMAL(8,2))), 2) AS DOUBLE) AS sess_value
         FROM s GROUP BY user_id, sess_no""",
    "q21_time_bucket" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
                event_type, count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(8,2))), 2) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""",
    "q22_funnel" ->
      """WITH e AS (
           SELECT user_id, event_type, ts,
                  min(CASE WHEN event_type = 'signup' THEN ts END)
                    OVER (PARTITION BY user_id) AS first_signup
           FROM events)
         SELECT user_id,
                count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
                count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
                count(*) FILTER (WHERE event_type = 'purchase'
                                   AND ts > first_signup) AS n_converted
         FROM e GROUP BY user_id""",
    "q23_json_props" ->
      """SELECT event_type, count(*) AS n_events,
                round(avg(k), 4) AS avg_k, min(k) AS min_k, max(k) AS max_k
         FROM (SELECT event_type,
                      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
               FROM events)
         GROUP BY event_type""",
    "q24_asof_attribution" ->
      """SELECT p.event_id AS event_id, p.user_id AS user_id,
                v.event_id AS attr_event_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN
              (SELECT * FROM events WHERE event_type IN ('click', 'view')) v
         ON p.user_id = v.user_id AND v.ts < p.ts""",
    "q47_asof_custom" ->
      """SELECT p.event_id AS event_id, p.user_id AS user_id,
                v.event_id AS attr_event_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN
              (SELECT * FROM events WHERE event_type IN ('click', 'view')) v
         ON p.user_id = v.user_id AND v.ts < p.ts""",
    "q25_monthly_revenue" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
                count(*) AS n_orders,
                CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
                round(avg(o_totalprice), 4) AS avg_order
         FROM orders GROUP BY 1""",
    "q26_event_gaps" ->
      """WITH g AS (
           SELECT user_id,
                  epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
           FROM events)
         SELECT user_id, count(*) AS n_gaps,
                round(avg(gap_us) / 1000000.0, 4) AS avg_gap_s,
                max(gap_us) AS max_gap_us
         FROM g WHERE gap_us IS NOT NULL GROUP BY user_id""",
    "q60_trip_metrics" ->
      """WITH e AS (
           SELECT user_id, ts, value, event_id, event_type,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events),
         s AS (
           SELECT user_id, ts, value, event_id, event_type,
                  CAST(sum(CASE WHEN prev_ts IS NULL
                            OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess_no
           FROM e),
         t AS (
           SELECT user_id, sess_no, count(*) AS n_events,
                  min(ts) AS sess_start, max(ts) AS sess_end,
                  CAST(round(sum(CAST(value AS DECIMAL(8,2))), 2) AS DOUBLE) AS sess_value,
                  min_by(event_type, event_id) AS entry_type
           FROM s GROUP BY user_id, sess_no)
         SELECT user_id, sess_no, n_events,
                (epoch_us(sess_end) - epoch_us(sess_start)) // 1000 AS duration_ms,
                CAST(hour(sess_start) AS BIGINT) AS start_hour,
                strftime(sess_start, '%a') IN ('Sat', 'Sun') AS is_weekend,
                CASE WHEN sess_value < 10 THEN 'low'
                     WHEN sess_value < 100 THEN 'mid'
                     ELSE 'high' END AS value_band,
                sess_value, entry_type
         FROM t""",
    "q62_resample_ffill" ->
      """WITH b AS (
           SELECT user_id, date_trunc('hour', min(ts)) AS h0,
                  date_trunc('hour', max(ts)) AS h1
           FROM events GROUP BY user_id),
         grid AS (
           SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
           FROM b),
         obs AS (
           SELECT user_id, hour, value AS obs_value FROM (
             SELECT user_id, date_trunc('hour', ts) AS hour, value,
                    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                       ORDER BY ts DESC, event_id DESC) AS rn
             FROM events) WHERE rn = 1),
         j AS (
           SELECT g.user_id, g.hour, o.obs_value,
                  last_value(o.obs_value IGNORE NULLS)
                    OVER (PARTITION BY g.user_id ORDER BY g.hour
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
           FROM grid g LEFT JOIN obs o USING (user_id, hour))
         SELECT user_id, strftime(hour, '%Y-%m-%d %H:00') AS hour,
                obs_value IS NOT NULL AS is_observed,
                value_ffill
         FROM j""",
    "q71_moving_avg" ->
      """WITH e AS (
           SELECT user_id, event_id, ts,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         w AS (
           SELECT user_id, event_id, cents,
                  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents,
                  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum7,
                  count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n7
           FROM e)
         SELECT user_id, event_id, cents, cum_cents,
                sum7 * 100 // n7 AS mavg7_cents_x100
         FROM w""",
    "q27_first_last" ->
      """SELECT user_id,
                min_by(event_type, event_id) AS first_type,
                max_by(event_type, event_id) AS last_type,
                min(event_id) AS first_event_id,
                max(event_id) AS last_event_id,
                count(*) AS n_events
         FROM events GROUP BY user_id""")
}
