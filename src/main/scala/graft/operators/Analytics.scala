package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** B'-block: longitudinal / customer analytics — cohort retention, RFM
  * segmentation, SCD2 dimension building and behavioural transition
  * matrices. These are the reporting-layer operators a trip or training
  * pipeline publishes after the per-event stages (q20-q27) run.
  *
  * Oracle-parity rules (SURVEY §6) applied throughout: every time value is
  * integer microseconds/days/weeks (`unix_micros` + integer division — no
  * rounded double seconds), every ratio is integer basis points, and every
  * window order carries a unique tiebreak column so rank-family functions
  * are deterministic in both engines.
  */
object Analytics {

  private val UsPerDay = 86400L * 1000000L

  /** q79: weekly cohort retention — users grouped by first-active week,
    * distinct-user counts per (cohort, week offset) and retention share in
    * basis points of the cohort size.
    *
    * Shape at scale: the (user, week) distinct and the per-user min are one
    * user_id exchange each (co-partitioned, so AQE coalesces them); the
    * final rollup shuffles only cohort-sized keys. The offset-0 cohort size
    * is recovered with a window over the cohort partition — no second scan
    * of events and no driver value.
    */
  def q79Retention(s: SparkSession, dir: String): DataFrame = {
    val active = Tables.events(s, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) div $UsPerDay div 7").as("week"))
      .distinct()
    val cohort = active.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val wc = Window.partitionBy(col("cohort_week"))
    active.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users")) // (user, week) is distinct ⇒ count = distinct users
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_users"))).over(wc))
      .withColumn("retention_bp", expr("n_users * 10000 div cohort_size"))
  }

  /** q305: weekly GROWTH ACCOUNTING — the new/retained/resurrected/
    * churned census (and quick ratio) that turns q79's cohort grid into
    * the one table a growth review actually opens: q79 answers "how do
    * cohorts decay", q243 "how fast do users come back", q137 "how
    * habitual are they" — this answers "did we GROW last week, and was
    * it acquisition or resurrection vs churn". Per observed-calendar
    * week: active users, new (first-ever week), retained (active the
    * week before), resurrected (active before, but not last week),
    * churned INTO the week (active last week, absent now — a later
    * return does not un-churn the week, it resurrects a later one), and
    * quick_ratio ×100 = (new + resurrected)·100 DIV churned.
    *
    * Honesty rules: the week grid densifies the full observed span
    * (an all-zero week is a report row, not an absence); churn past the
    * final observed week is unknowable and NOT emitted (users active in
    * the last week aren't assessed — the grid bound enforces it);
    * zero-churn weeks report a NULL ratio (division by wishful zero).
    * Identities (spec-pinned): active = new + retained + resurrected,
    * and active(w−1) = retained(w) + churned(w).
    *
    * Shape: ONE event-scale DISTINCT (user, week) exchange (the q243
    * pattern); the lag/lead windows ride the user partitioning of that
    * bounded frame; classification and churn fold to |weeks| rows; the
    * grid derives from a broadcast 1-row bounds aggregate via
    * sequence() (the q295 rule — no second scan, no driver value).
    */
  def q305GrowthAccounting(s: SparkSession, dir: String): DataFrame =
    growthAccountingOf(Tables.events(s, dir))

  /** q305 on ANY (user_id, ts) frame — spec'd on planted hand-built
    * user histories beside the oracled corpus run. */
    private[graft] def growthAccountingOf(ev: DataFrame): DataFrame =
    growthFromWeeks(ev
      .select(col("user_id"), expr(s"unix_micros(ts) div $UsPerDay div 7").as("week"))
      .distinct())

  /** The accounting census off an already-built DISTINCT (user_id,
    * week) frame — one definition serves q305 and s29's maintained
    * activity set (whose weekly fold is `day div 7`), so the batch
    * report and the streaming derivation cannot drift. */
  private[graft] def growthFromWeeks(weeks: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("week"))
    val tagged = weeks
      .withColumn("prev_week", lag(col("week"), 1).over(w))
      .withColumn("next_week", lead(col("week"), 1).over(w))
      .localCheckpoint() // three consumers: bounds, class fold, churn fold
    val bounds = tagged.agg(min(col("week")).as("w0"), max(col("week")).as("w1"))
    val classes = tagged.groupBy(col("week"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("prev_week").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("prev_week") === col("week") - 1, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("prev_week").isNotNull && col("prev_week") < col("week") - 1,
          1L).otherwise(0L)).as("n_resurrected"))
    val churn = tagged
      .filter(col("next_week").isNull || col("next_week") > col("week") + 1)
      .select((col("week") + 1).as("week"))
      .groupBy(col("week")).agg(count(lit(1)).as("n_churned"))
    broadcast(bounds)
      .select(explode(sequence(col("w0"), col("w1"))).as("week"))
      .join(classes, Seq("week"), "left")
      .join(churn, Seq("week"), "left")
      .na.fill(0L, Seq("n_active", "n_new", "n_retained", "n_resurrected",
        "n_churned"))
      .select(col("week"), col("n_active"), col("n_new"), col("n_retained"),
        col("n_resurrected"), col("n_churned"),
        expr("""CASE WHEN n_churned > 0
                THEN (n_new + n_resurrected) * 100 DIV n_churned
                END""").as("quick_ratio_x100"))
  }

  /** q80: RFM segmentation — recency / frequency / monetary quartiles per
    * market segment. Monetary is integer cents (per-row round then integer
    * sum — order-independent); recency is integer days against the corpus
    * max order day (carried as a cross-joined 1-row aggregate, not a driver
    * value). ntile(4) runs per-mktsegment with a custkey tiebreak, so the
    * windows stay partitioned (no global sort) and both engines assign
    * identical quartiles.
    */
  def q80Rfm(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(
        // o_orderdate is TIMESTAMP_NTZ (unix_micros rejects it) — integer
        // epoch days via date truncation, mirrored by DuckDB date_diff.
        max(expr("datediff(cast(o_orderdate as date), date'1970-01-01')")).as("last_day"),
        count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("monetary_cents"))
    val maxDay = perCust.agg(max(col("last_day")).as("corpus_max_day"))
    def q(metric: String, asc: Boolean) = ntile(4).over(
      Window.partitionBy(col("c_mktsegment"))
        .orderBy(if (asc) col(metric).asc else col(metric).desc, col("o_custkey").asc))
    perCust
      .crossJoin(maxDay)
      .withColumn("recency_days", col("corpus_max_day") - col("last_day"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey"), col("c_mktsegment"), col("recency_days"),
        col("n_orders"), col("monetary_cents"))
      .withColumn("r_q", q("recency_days", asc = false)) // oldest=1 … freshest=4
      .withColumn("f_q", q("n_orders", asc = true))
      .withColumn("m_q", q("monetary_cents", asc = true))
      .withColumn("rfm", col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
  }

  /** q81: SCD2 dimension build — collapse each user's event stream into
    * type-2 validity intervals: one row per state change (event_type run),
    * with [valid_from, valid_to) in integer ms and an is_current flag.
    * This is the "latest state + full history" table an ETL pipeline
    * publishes from a mutation log.
    *
    * Shape: both windows partition by user_id, so the whole operator is ONE
    * exchange; the change-row filter runs between them on the same
    * partitioning (Catalyst reuses the exchange).
    */
  def q81Scd2(s: SparkSession, dir: String): DataFrame =
    scd2Build(Tables.events(s, dir))

  /** Full-history SCD2 build over any (user_id, event_type, ts, event_id)
    * mutation log — the batch bootstrap path; [[scd2Merge]] is the
    * incremental continuation. */
  def scd2Build(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_from_ms", expr("unix_micros(ts) div 1000"))
      .withColumn("valid_to_ms", lead(col("valid_from_ms"), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", when(col("valid_to_ms").isNull, 1L).otherwise(0L))
      .select(col("user_id"), col("event_type"), col("version"),
        col("valid_from_ms"), col("valid_to_ms"), col("is_current"))
  }

  /** Incremental SCD2 upsert: apply an append-only CDC batch (every batch
    * event strictly later than all events already folded into `existing`)
    * without rebuilding history. Closed rows pass through untouched; each
    * touched user's open row is closed at their first new change; new
    * change rows continue the version sequence from the user's open
    * version. By construction `scd2Merge(scd2Build(old), new) ==
    * scd2Build(old ∪ new)` — q77 is oracled against exactly that rebuild.
    *
    * Shape at scale: the batch (small) is windowed per user_id, then
    * joined to `existing` on user_id — the open-state side is one row per
    * touched user, so AQE broadcasts it when the batch is small; the
    * existing dimension is never re-windowed, only hash-joined against the
    * per-user first-change row. Late (out-of-order) data is out of scope,
    * as for any SCD2 append pipeline.
    */
  def scd2Merge(existing: DataFrame, batch: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val open = existing.filter(col("is_current") === 1)
      .select(col("user_id"), col("event_type").as("open_type"),
        col("version").as("open_version"))
    // change rows within the batch: lag inside the batch, with the carried
    // open state standing in for the last pre-batch event's type
    val changes = batch
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .join(open, Seq("user_id"), "left")
      .filter(coalesce(col("prev_type"), col("open_type")).isNull ||
        coalesce(col("prev_type"), col("open_type")) =!= col("event_type"))
      .withColumn("valid_from_ms", expr("unix_micros(ts) div 1000"))
      .withColumn("valid_to_ms", lead(col("valid_from_ms"), 1).over(w))
      .withColumn("version", coalesce(col("open_version"), lit(0)) + row_number().over(w))
      .withColumn("is_current", when(col("valid_to_ms").isNull, 1L).otherwise(0L))
      .select(col("user_id"), col("event_type"), col("version"),
        col("valid_from_ms"), col("valid_to_ms"), col("is_current"))
      // referenced twice below (firstChange + the union): Catalyst has no
      // common-subplan elimination, so without a persist the batch window
      // and open-state join would execute twice per action
      .persist()
    // close each touched user's open row at their first new change
    val firstChange = changes.groupBy(col("user_id"))
      .agg(min(col("valid_from_ms")).as("first_change_ms"))
    existing.join(firstChange, Seq("user_id"), "left")
      .withColumn("closes", col("is_current") === 1 && col("first_change_ms").isNotNull)
      .withColumn("valid_to_ms",
        when(col("closes"), col("first_change_ms")).otherwise(col("valid_to_ms")))
      .withColumn("is_current", when(col("closes"), 0L).otherwise(col("is_current")))
      .select(col("user_id"), col("event_type"), col("version"),
        col("valid_from_ms"), col("valid_to_ms"), col("is_current"))
      .unionByName(changes)
  }

  /** q77: the CDC round-trip — build the dimension from events up to the
    * cut, merge the post-cut batch incrementally, and return the merged
    * table. The oracle is the FULL rebuild's SQL (q81's), i.e. the query
    * asserts merge-equals-rebuild in the driver's own hash compare.
    */
  def q77Scd2Merge(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val cut = lit("2024-01-21 00:00:00").cast("timestamp")
    scd2Merge(scd2Build(ev.filter(col("ts") <= cut)), ev.filter(col("ts") > cut))
  }

  /** q78: multi-granularity revenue report — (flag, status) detail,
    * per-flag subtotal and grand total, gid from grouping() bits
    * identically in both engines.
    *
    * Detail-first shape (r8): aggregate ONCE at the finest grain, then
    * `rollup` the tiny detail frame — rollup(flag, status)'s grouping
    * sets ((f,s),(f),()) are exactly q78's, and its Expand now triples
    * ~|flags×statuses| rows instead of every lineitem row. The direct
    * `groupingSets` form (r1–r7) planned scan → Expand(3×) → partial agg,
    * pushing 3N rows through the hash aggregate and writing the 3× cell
    * set per map task; this form pays one extra cell-sized exchange to
    * cut the aggregate's input back to N (A/B in SURVEY §8 round-8
    * notes). Counts roll up as sums; flag/status are never NULL in the
    * data, so detail keys cannot collide with rollup's null subtotal
    * rows (the caveat of re-deriving grouping() above the detail grain).
    */
  def q78GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("d_items"),
        sum(expr("cast(round(l_extendedprice * 100) as bigint)")).as("d_cents"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus"))).cast("int").as("gid"),
        sum(col("d_items")).as("n_items"),
        sum(col("d_cents")).as("revenue_cents"))

  /** q83: pretraining sequence packing (concat-and-chop) — documents are
    * deterministically shuffled by md5, sharded into 256 md5-prefix
    * buckets, and each bucket is packed independently into fixed
    * token-budget bins by a running token count. Per-bucket packing is the
    * standard scale-out: each shard's window is independent (no global
    * ordering), so at 100 TB the 256-way (configurable) partition keeps
    * every window partition executor-sized while staying byte-for-byte
    * deterministic across runs and engines.
    */
  def q83PackSequences(s: SparkSession, dir: String): DataFrame = {
    val budget = 2048L
    val w = Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bucket", substring(col("h"), 1, 2))
      .withColumn("offset_in_bucket", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("bucket"), col("n_tokens"), col("offset_in_bucket"),
        expr(s"offset_in_bucket div $budget").as("bin_id"),
        (col("offset_in_bucket") % budget).as("offset_in_bin"))
  }

  /** q82: behavioural transition matrix — first-order Markov counts over
    * consecutive event types per user, with the per-source row share in
    * integer basis points. One user_id exchange for the lag window, one
    * (prev, next)-key rollup; the per-prev total is a window over the tiny
    * result, not a rescan.
    */
  def q82Transitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("share_bp", expr(
        "n_transitions * 10000 div sum(n_transitions) over (partition by prev_type)"))
  }

  /** q106: market-basket association over sessions — which event types
    * CO-OCCUR in the same session (q82 is the sequential complement):
    * per unordered type pair, basket support, both directional
    * confidences (integer basis points) and the lift ratio (one scalar
    * double from exact counts). The cross-sell / journey-affinity report
    * of a product-analytics layer.
    *
    * Shape: sessionize (one user_id exchange) → distinct
    * (basket, item) frame → self-join ON THE BASKET KEY (per-basket pair
    * expansion is bounded by |event types|², never corpus-quadratic) →
    * |types|²-row rollup; item totals and the basket count come back as
    * broadcasts.
    */
  def q106BasketLift(s: SparkSession, dir: String): DataFrame = {
    val items = Events.withSessionNo(Tables.events(s, dir))
      .select(col("user_id"), col("sess_no"), col("event_type"))
      .distinct()
      .localCheckpoint() // three consumers below; sessionize once
    val nBaskets = items.select(col("user_id"), col("sess_no")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCounts = items.groupBy(col("event_type")).agg(count(lit(1)).as("n_item"))
    val a = items.select(col("user_id"), col("sess_no"), col("event_type").as("item_a"))
    val b = items.select(col("user_id"), col("sess_no"), col("event_type").as("item_b"))
    a.join(b, Seq("user_id", "sess_no"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_pair"))
      .join(broadcast(itemCounts.select(col("event_type").as("item_a"),
        col("n_item").as("n_a"))), "item_a")
      .join(broadcast(itemCounts.select(col("event_type").as("item_b"),
        col("n_item").as("n_b"))), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_pair"), col("n_a"), col("n_b"),
        expr("n_pair * 10000 div n_baskets").as("support_bp"),
        expr("n_pair * 10000 div n_a").as("conf_a_to_b_bp"),
        expr("n_pair * 10000 div n_b").as("conf_b_to_a_bp"),
        expr("""round(CAST(n_pair * n_baskets AS DOUBLE) /
                      CAST(n_a * n_b AS DOUBLE), 4)""").as("lift"))
  }

  /** q109: SCD1 latest-record upsert — the "current state" table a CDC
    * stream maintains: every user's last change wins, and a user whose
    * last operation is a delete (`error` here stands in for the tombstone
    * op) is absent from the result. This is the compaction/merge operator
    * of any mutable-table publish (dedupe-by-recency), the type-1
    * complement of [[scd2Build]]'s full-history type-2 dimension.
    *
    * Shape: one user_id exchange for the recency window, then a filter —
    * identical to Spark's own `dropDuplicates`-by-max-ts idiom but
    * deterministic under ties (event_id tiebreak). At 100 TB the window
    * rides the same partitioning every other per-user operator uses.
    */
  def q109UpsertLatest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_type").as("last_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("last_value_cents"),
        expr("unix_micros(ts) div 1000").as("last_ts_ms"))
  }

  /** q110: point-in-time (interval) join — each purchase looked up against
    * the SCD2 state dimension valid AT its timestamp: the
    * "which dimension version was current when this fact happened"
    * join every warehouse with slowly-changing dimensions runs. The
    * dimension is [[scd2Build]] over the non-purchase activity log, so the
    * result reads "what was the user doing when they bought".
    *
    * Shape: both sides hash-partition on user_id (the dimension already is
    * — scd2Build's window leaves it that way), so the join is ONE exchange
    * per side with the `[valid_from, valid_to)` bounds as a residual
    * condition — each probe matches at most one interval by construction
    * (adjacent half-open intervals). Never a range/BNL join: the equi-key
    * carries all the data movement. Left join keeps purchases that precede
    * any state (null state columns).
    */
  def q110PointInTime(s: SparkSession, dir: String): DataFrame = {
    val dim = scd2Build(
      Tables.events(s, dir).filter(col("event_type") =!= "purchase"))
      .select(col("user_id").as("d_user_id"),
        col("event_type").as("state_type"),
        col("version").as("state_version"),
        col("valid_from_ms"), col("valid_to_ms"))
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts) div 1000").as("ts_ms"))
      .join(dim,
        col("user_id") === col("d_user_id") &&
          col("valid_from_ms") <= col("ts_ms") &&
          (col("valid_to_ms").isNull || col("ts_ms") < col("valid_to_ms")),
        "left")
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("state_type"), col("state_version"))
  }

  /** q123: calendar-hierarchy revenue rollup with contribution — revenue
    * at month, quarter, year and grand-total granularity in ONE scan
    * (`rollup` plans a single Expand, the q78 shape, here over the time
    * hierarchy every trip-data publication ships), plus each month's
    * share of its year in basis points via a window over the tiny rollup
    * frame — never a second scan. Calendar parts come from year/quarter/
    * month extraction, integer-identical across engines on DATE columns.
    */
  def q123CalendarRollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("y", year(col("o_orderdate")).cast("long"))
      .withColumn("qtr", quarter(col("o_orderdate")).cast("long"))
      .withColumn("mon", month(col("o_orderdate")).cast("long"))
      .rollup(col("y"), col("qtr"), col("mon"))
      .agg(
        (grouping(col("y")) * 4 + grouping(col("qtr")) * 2 +
          grouping(col("mon"))).cast("int").as("gid"),
        count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("revenue_cents"))
      .withColumn("share_of_year_bp",
        when(col("gid") === 0,
          expr("""revenue_cents * 10000 div
                  sum(CASE WHEN gid = 0 THEN revenue_cents END)
                    OVER (PARTITION BY y)""")))

  /** q130: revenue-change decomposition (volume vs price effect) — per
    * market segment between 1996 and 1997: ΔRev split into the part
    * explained by order-count change at old prices ((n₂−n₁)·avg₁) and
    * the part explained by average-order-value change at new volume
    * (n₂·(avg₂−avg₁)) — the Laspeyres/Paasche "why did revenue move"
    * report. The two effects sum to ΔRev exactly in the reals; computed
    * as doubles they are single formulas over exact integer sums (the
    * q87 rule — deterministic on both engines), and ΔRev itself is
    * emitted as an exact integer. Shape: broadcast customer-dim join,
    * one segment-key exchange, conditional aggregation (the q15 pivot
    * idiom) — no second scan for the year split.
    */
  def q130MixDecomposition(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("y", year(col("o_orderdate")))
      .filter(col("y").isin(1996, 1997))
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .withColumn("cents", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(when(col("y") === 1996, 1L).otherwise(0L)).as("n1"),
        sum(when(col("y") === 1996, col("cents")).otherwise(0L)).as("rev1"),
        sum(when(col("y") === 1997, 1L).otherwise(0L)).as("n2"),
        sum(when(col("y") === 1997, col("cents")).otherwise(0L)).as("rev2"))
      .select(col("c_mktsegment"), col("n1"), col("rev1"), col("n2"), col("rev2"),
        (col("rev2") - col("rev1")).as("delta_cents"),
        // each operand is cast to double BEFORE the multiply: a
        // segment-year revenue (~1e13 cents at 100 TB) times an order
        // delta (~1e6) overflows BIGINT, which non-ANSI Spark wraps
        // silently while DuckDB errors — the double×double product is
        // IEEE-identical on both engines and cannot overflow
        expr("round(CAST(n2 - n1 AS DOUBLE) * CAST(rev1 AS DOUBLE) / nullif(n1, 0), 2)")
          .as("volume_effect_cents"),
        expr("""round(CAST(n2 AS DOUBLE) *
                      (CAST(rev2 AS DOUBLE) / nullif(n2, 0)
                       - CAST(rev1 AS DOUBLE) / nullif(n1, 0)), 2)""")
          .as("price_effect_cents"))

  /** q113: sequential pattern support ("A happens before B") — for every
    * ordered event-type pair, how many users' FIRST occurrence of A
    * precedes their first occurrence of B. q82 counts adjacent transitions
    * and q90 whole prefix paths; this is the skip-gram middle ground
    * (PrefixSpan's length-2 core) that drives "what leads to what"
    * product-funnel reports.
    *
    * Shape: first occurrences via a min over the (us, event_id) pair
    * PACKED into one DECIMAL(38,0) — us·10¹⁸ + eid, lexicographic because
    * eid < 10¹⁸, and a 16-byte fixed-width buffer so the min stays a
    * HASH aggregate (min over a struct — and min_by — both degrade to
    * SortAggregate in this Spark build: a full sort of the events frame;
    * the q116 packing lesson, decimal-width because µs·10¹⁸ outgrows a
    * long). Map-side combining, NOT a window. The per-user self-join then
    * expands at most |vocab|² rows per user (vocab = event-type universe,
    * ≤5 here), so candidate work is bounded per user no matter the corpus
    * size. The user-count denominator folds in as a broadcast scalar off
    * the checkpointed firsts frame — no second events scan.
    */
  private val PackBase = "1000000000000000000" // 10^18 > any event_id
  /** the pre-checkpoint firsts plan — separated so PlanShapeSpec can pin
    * the hash-aggregate shape (a checkpoint truncates lineage, which
    * would make any plan assertion on the public query vacuous). */
  private[graft] def q113Firsts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(expr(
        s"CAST(unix_micros(ts) AS DECIMAL(38,0)) * $PackBase + event_id"))
        .as("k"))
      .select(col("user_id"), col("event_type"),
        expr(s"CAST(k DIV $PackBase AS BIGINT)").as("us"),
        expr(s"CAST(k % $PackBase AS BIGINT)").as("eid"))

  def q113SeqPairs(s: SparkSession, dir: String): DataFrame = {
    val firsts = q113Firsts(s, dir)
      .localCheckpoint() // referenced twice (pairs + denominator): no CSE
    val total = firsts.agg(
      countDistinct(col("user_id")).as("n_total"))
    val a = firsts.select(col("user_id"), col("event_type").as("type_a"),
      col("us").as("us_a"), col("eid").as("eid_a"))
    val b = firsts.select(col("user_id"), col("event_type").as("type_b"),
      col("us").as("us_b"), col("eid").as("eid_b"))
    a.join(b, Seq("user_id"))
      .filter(col("us_a") < col("us_b") ||
        (col("us_a") === col("us_b") && col("eid_a") < col("eid_b")))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(total))
      .select(col("type_a"), col("type_b"), col("n_users"),
        expr("n_users * 10000 div n_total").as("support_bp"))
  }

  /** q137: DAU / trailing-7-day WAU / stickiness per day — the
    * daily-vs-weekly active-user engagement report (stickiness =
    * DAU/WAU, how much of the weekly audience shows up on a given day).
    *
    * Exact distincts, decomposed so nothing ever holds a 7-day window of
    * raw events: one (user, day) DISTINCT off the scan (the only
    * event-scale exchange), then a bounded 7× offset explode of that
    * already-deduplicated frame re-deduplicated per target day. At 100 TB
    * the (user, day) frame is ~|users|×|days| — the persisted activity
    * table every growth stack maintains — and the 7× explode stays
    * proportional to IT, not to events. Stickiness is integer basis
    * points (dau·10000 div wau — wau ≥ dau > 0 by construction, and only
    * days with events report, identically in both engines via the inner
    * join on the DAU day set).
    */
  def q137Stickiness(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"), explode(sequence(lit(0), lit(6))).as("off"),
        col("day"))
      .select(col("user_id"), (col("day") + col("off")).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        expr("dau * 10000 DIV wau").as("stickiness_bp"))
  }

  /** q139: revenue-concentration (Pareto) report per market segment — how
    * few customers carry half the segment's revenue. Per segment: customer
    * count, total integer-cents revenue, the size of the SMALLEST prefix
    * of customers (by revenue desc, custkey tiebreak) reaching ≥ half the
    * total, and that prefix as bp of the customer base.
    *
    * Shape: one (segment, custkey) aggregate off the scan (map-side
    * combined), then windows over the CUSTOMER ROLLUP frame only — the
    * same accepted per-segment window q80's ntile uses; nothing event- or
    * order-scale is ever sorted. "Half" is (total+1) DIV 2 so the
    * threshold is integer-exact on both engines; a customer is in the
    * minimal prefix iff the cumsum BEFORE it is < half (cents are
    * strictly positive, so prefix minimality is well-defined).
    */
  def q139Pareto(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val wseg = Window.partitionBy(col("c_mktsegment"))
    val word = wseg.orderBy(col("cents").desc, col("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    cust
      .withColumn("cum", sum(col("cents")).over(word))
      .withColumn("total", sum(col("cents")).over(wseg))
      .withColumn("n_cust", count(lit(1)).over(wseg))
      .groupBy(col("c_mktsegment"))
      .agg(max(col("n_cust")).as("n_customers"),
        max(col("total")).as("revenue_cents"),
        sum(when(col("cum") - col("cents") < expr("(total + 1) DIV 2"), 1L)
          .otherwise(0L)).as("n_half"))
      .withColumn("half_share_bp", expr("n_half * 10000 DIV n_customers"))
  }

  /** q163: Kaplan–Meier SESSION survival — the continuous-time complement
    * of q79's calendar-cohort retention, over the subject with real
    * lifetime spread: how long does a session LAST, with sessions whose
    * final event sits within one 30-minute gap of the corpus's max
    * timestamp treated as CENSORED (their closing gap is not yet
    * observable — we know they lasted ≥ t, not when they ended). Per
    * duration minute t: n_risk (sessions with duration ≥ t), n_ended,
    * n_censored, and the cumulative hazard −ln S(t) as `chaz_micro` =
    * Σ_{i ≤ t} [round(ln nᵢ·1e6) − round(ln(nᵢ−dᵢ)·1e6)] — each KM
    * factor (1 − dᵢ/nᵢ) split into two ln-of-integer terms under the
    * q156 micro-nat discipline, summed exactly in both engines
    * (S(t) = e^(−chaz/1e6) is a client-side projection). A
    * total-extinction minute (nᵢ = dᵢ, S = 0) clamps its ln argument to
    * 1 — an infinite hazard is capped, identically in both engines.
    *
    * Shape: ONE event-scale user_id exchange (q20's session window +
    * the session rollup riding its partitioning), then everything — the
    * corpus max timestamp, per-duration counts, the risk-set running
    * sum and the hazard cumsum — runs on the duration-bounded frame
    * (≤ max session minutes rows; the single-partition windows are the
    * q68 bounded-frame rule). The risk set is total − cumsum(shorter
    * durations): a running sum over that tiny frame, never per-session.
    */
  def q163Survival(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sessions = Events.withSessionNo(Tables.events(s, dir))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
      // two consumers (maxUs + durations) — Catalyst has no CSE; without
      // this the event-scale sessionize window runs twice
      .localCheckpoint()
    val maxUs = sessions.agg(max(col("end_us")).as("max_us"))
    val durations = sessions.crossJoin(broadcast(maxUs))
      .select(expr("(end_us - start_us) DIV 60000000").as("t_min"),
        when(col("end_us") < col("max_us") - 1800L * 1000000L, 1L)
          .otherwise(0L).as("ended"))
      .groupBy(col("t_min"))
      .agg(sum(col("ended")).as("n_ended"),
        sum(lit(1L) - col("ended")).as("n_censored"))
    val wOrd = Window.orderBy(col("t_min"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    durations
      .withColumn("n_total", sum(col("n_ended") + col("n_censored"))
        .over(Window.partitionBy()))
      .withColumn("n_left_before", sum(col("n_ended") + col("n_censored")).over(wOrd)
        - (col("n_ended") + col("n_censored")))
      .withColumn("n_risk", col("n_total") - col("n_left_before"))
      .withColumn("term_micro", when(col("n_ended") > 0,
        expr("""CAST(round(ln(n_risk) * 1000000) AS BIGINT)
                - CAST(round(ln(greatest(n_risk - n_ended, 1)) * 1000000) AS BIGINT)"""))
        .otherwise(0L))
      .withColumn("chaz_micro", sum(col("term_micro")).over(wOrd))
      .select(col("t_min"), col("n_risk"), col("n_ended"), col("n_censored"),
        col("chaz_micro"))
  }

  /** q177: demand-forecast feature materialization — the feature-store
    * table a per-(event_type, day) volume model trains on: calendar
    * lags (lag-1, lag-7), the trailing-7-day window (sum + days
    * present), and next-day volume as the supervised target. All frames
    * are RANGE on the integer epoch day (the q95 rule: data gaps must
    * yield NULL lags / shorter baselines, not silently stretch the
    * lookback the way ROWS frames would), so a feature row is honest
    * about missing history and the model sees the gap. Everything is an
    * exact integer count; day-of-week is the portable (d+4) mod 7.
    *
    * Shape: one scan → (type, day) agg (partial-combined), then every
    * window runs per type over the calendar-bounded day frame — the
    * 100 TB cost is the scan; the feature table itself is |types|×days
    * rows. The target row's NULL on the stream head is the label
    * horizon, not an error.
    */
  def q177DemandFeatures(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("lag_1", max(col("n")).over(w.rangeBetween(-1, -1)))
      .withColumn("lag_7", max(col("n")).over(w.rangeBetween(-7, -7)))
      .withColumn("trail7_sum", sum(col("n")).over(w.rangeBetween(-7, -1)))
      .withColumn("trail7_days", count(col("n")).over(w.rangeBetween(-7, -1)))
      .withColumn("target_next", max(col("n")).over(w.rangeBetween(1, 1)))
      .select(col("event_type"), col("day"),
        expr("((day + 4) % 7)").as("dow7"),
        col("n").as("n_events"),
        col("lag_1"), col("lag_7"),
        col("trail7_sum"),
        col("trail7_days"),
        col("target_next"))
  }

  /** q181: STL-lite decomposition of the daily volume series — per
    * (event_type, day): trend (centered 7-day moving average), seasonal
    * (mean detrended value of the day-of-week), residual (what's left —
    * the series a monitor should actually alarm on, q95/q172's input
    * denoised). Everything lives in micro-units: window/group sums are
    * exact integers, and each mean is ONE round(double/double) over
    * identical integer operands on both engines — never an integer
    * division whose truncate-vs-floor could split on negative detrended
    * values (the q86 lesson).
    *
    * Shape: one scan → daily agg; the centered-RANGE trend window, the
    * (type, dow) seasonal rollup and its join back all run on the
    * calendar-bounded day frame (localCheckpointed once for the branch
    * reuse).
    */
  def q181StlDecompose(s: SparkSession, dir: String): DataFrame =
    stlFrame(Tables.events(s, dir))
      .select(col("event_type"), col("day"), col("dow7"), col("n").as("n_events"),
        col("trend_micro"), col("seasonal_micro"), col("residual_micro"))

  /** The decomposed (event_type, day, dow7, n, trend_micro,
    * detrended_micro, seasonal_micro, residual_micro) frame — ONE
    * definition feeding q181's per-day table and q238's strength rollup
    * (the SQL twin is [[stlSql]]'s `dec` CTE).
    */
  private[graft] def stlFrame(ev: DataFrame): DataFrame = {
    val daily = ev
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val wT = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-3, 3)
    val trended = daily
      .withColumn("t_sum", sum(col("n")).over(wT))
      .withColumn("t_cnt", count(col("n")).over(wT))
      .withColumn("trend_micro", expr(
        "CAST(round(1000000.0 * CAST(t_sum AS DOUBLE) / CAST(t_cnt AS DOUBLE)) AS BIGINT)"))
      .withColumn("detrended_micro", expr("n * 1000000 - trend_micro"))
      .withColumn("dow7", expr("((day + 4) % 7)"))
    val seasonal = trended.groupBy(col("event_type"), col("dow7"))
      .agg(expr("""CAST(round(CAST(sum(detrended_micro) AS DOUBLE) /
                   CAST(count(*) AS DOUBLE)) AS BIGINT)""").as("seasonal_micro"))
    trended.join(seasonal, Seq("event_type", "dow7"))
      .withColumn("residual_micro",
        expr("n * 1000000 - trend_micro - seasonal_micro"))
  }

  /** q238: seasonal STRENGTH per event type — the one-number verdict on
    * q181's decomposition (STL's F_s): 1 − Var(residual)/Var(detrended),
    * floored at 0, in basis points. ~0 says the dow-7 seasonal explains
    * nothing (q177 should drop lag-7; q234's lag-7 echo will be weak
    * too); near 10000 says the series is almost pure weekly cadence and
    * q95-style alarms must compare same-weekday baselines or they alarm
    * every Saturday. The strength table is what decides WHETHER the
    * seasonal column of q181 is signal or noise before anyone models on
    * it.
    *
    * Exactness: both variances enter as the integer numerators
    * n·Σx² − (Σx)² over the micro-unit columns (DECIMAL(38,0)/HUGEINT —
    * micro values square to ~1e30 at 100 TB daily volumes, the q170/q171
    * widening rule; the common 1/n² scale cancels in the ratio), and
    * strength_bp is ONE round over one double division. Degenerate
    * series (zero detrended variance — a constant feed) emit NULL, not a
    * fabricated 0.
    *
    * Shape: everything after q181's calendar-bounded machinery is a
    * |types|-row fold.
    */
  def q238SeasonalStrength(s: SparkSession, dir: String): DataFrame =
    stlFrame(Tables.events(s, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(expr("CAST(detrended_micro AS DECIMAL(38,0))")).as("sd"),
        sum(expr("CAST(detrended_micro AS DECIMAL(38,0)) * detrended_micro")).as("sd2"),
        sum(expr("CAST(residual_micro AS DECIMAL(38,0))")).as("sr"),
        sum(expr("CAST(residual_micro AS DECIMAL(38,0)) * residual_micro")).as("sr2"))
      .select(col("event_type"), col("n_days"),
        expr("""CASE WHEN n_days * sd2 - sd * sd > 0
                     THEN CAST(greatest(round(10000.0 *
                          (1.0 - CAST(n_days * sr2 - sr * sr AS DOUBLE) /
                                 CAST(n_days * sd2 - sd * sd AS DOUBLE))),
                          0.0) AS BIGINT) END""").as("strength_bp"))

  /** q244: revenue-concentration HHI per market segment — the antitrust
    * verdict next to q105's Gini (Gini measures inequality of the whole
    * distribution; Herfindahl measures how few heads CARRY it —
    * a segment can be Gini-equal yet HHI-concentrated): per segment,
    * customer count, revenue cents, HHI ×10⁴ (Σ share², the classic
    * 0–10000 scale where > 2500 reads "highly concentrated") and the
    * effective head count 1/HHI ×100 — "this segment behaves like N
    * equal customers", the number a capacity/risk planner actually uses.
    *
    * Exactness: per-customer revenue is exact integer cents; Σs² and S²
    * run in DECIMAL(38,0)/HUGEINT (cents² ~ 1e18 × 1e7 customers
    * overflows BIGINT — the widening rule); HHI and effective-n are each
    * ONE round(double/double) over those exact integers.
    *
    * Shape: one orders scan → per-customer fold (map-side combined) ⋈
    * broadcast customer dim → per-segment Σs/Σs² fold; nothing after the
    * first agg exceeds |customers| rows.
    */
  def q244Hhi(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    perCust
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(expr("CAST(cents AS DECIMAL(38,0))")).as("s1"),
        sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("s2"))
      .select(col("c_mktsegment").as("mktsegment"), col("n_customers"),
        // BIGINT rendering for the oracle hash (HUGEINT renders float in
        // pandas) — the exact DECIMAL stays internal to the ratio math
        expr("CAST(s1 AS BIGINT)").as("revenue_cents"),
        expr("""CAST(round(10000.0 * CAST(s2 AS DOUBLE) /
                (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))) AS BIGINT)""")
          .as("hhi_x10000"),
        expr("""CAST(round(100.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) /
                CAST(s2 AS DOUBLE)) AS BIGINT)""").as("effective_n_x100"))
  }

  /** q246: fulfillment-lag SLA table by order priority — days from order
    * date to FIRST shipment per order, summarized per priority as exact
    * median / p90 / max: the operations report that says whether the
    * priority ladder is honored in practice (urgent orders should
    * dominate the low-lag mass; a p90 inversion between adjacent
    * priorities is an SLA breach the mean would smooth away).
    *
    * Exactness: the lag is a SUBTRACTION of two epoch-day integers (each
    * a positive-operand div under the post-epoch contract) — never a div
    * of a possibly-negative µs difference, whose truncate-vs-floor would
    * split the engines on early-ship rows (the q86 trap); percentiles
    * are the exact interpolated percentile ≡ quantile_cont (q117's
    * parity rule) over integer days, ×100 rounded.
    *
    * Shape: one lineitem scan folds per order (map-side combined) and
    * joins orders on the order key — the q03 shuffle-join family; the
    * per-priority percentile runs on |orders| integer lags, grouped to
    * the 5-row priority domain.
    */
  def q246ShipLag(s: SparkSession, dir: String): DataFrame = {
    val firstShip = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(min(expr("unix_micros(l_shipdate) div 86400000000")).as("ship_day"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("unix_micros(o_orderdate) div 86400000000").as("order_day"))
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        (col("ship_day") - col("order_day")).as("lag_days"))
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n_orders"),
        expr("CAST(round(percentile(lag_days, 0.5D) * 100) AS BIGINT)")
          .as("p50_x100"),
        expr("CAST(round(percentile(lag_days, 0.9D) * 100) AS BIGINT)")
          .as("p90_x100"),
        max(col("lag_days")).as("max_lag_days"))
  }

  /** q302: supplier RELIABILITY league — q246's fulfillment lag pivoted
    * onto the axis a sourcing decision actually acts on: per supplier,
    * shipment count, exact p50/p90 lag days, the share of lines beyond a
    * 30-day SLA bar, and a pooled-binomial z against the corpus late
    * rate (the q242/q104 device applied to fulfillment): `laggard`/`fast`
    * at the two-sided 5% bar, `ok` inside it. q246 answers "is the
    * priority ladder honored"; this answers "WHICH suppliers are breaking
    * it" — the row a procurement review reads before a contract renewal,
    * and the complement of q291's fragility view (q291: who depends on
    * one supplier; this: which suppliers one shouldn't depend on).
    *
    * Exactness: the lag is the q246 epoch-day subtraction (never a
    * possibly-negative µs div — the q86 trap); percentiles are the exact
    * interpolated percentile ≡ quantile_cont ×100 rounded; the z is
    * (L·N − n·T)/√(n·T·(N−T)) — the pooled z with its algebra cleared of
    * divisions, numerator and radicand exact DECIMAL(38,0)/HUGEINT
    * integers (L·N ~ 1e21 at 1e12 lines — BIGINT would overflow, the
    * q170/q171 widening rule), ONE double division + round; degenerate
    * corpora (no late lines anywhere, or all late) verdict z = 0
    * identically on both engines.
    *
    * Shape: one lineitem⋈orders join on the order key (the q03
    * shuffle-join family — bucketing-co-locatable at scale), folded to
    * the |suppliers| frame; totals are ONE broadcast 1-row crossJoin off
    * the checkpointed per-supplier frame (the q295 rule — never a second
    * fact scan for two scalars).
    */
  def q302SupplierReliability(s: SparkSession, dir: String): DataFrame =
    supplierReliabilityOf(Tables.lineitem(s, dir), Tables.orders(s, dir))

  /** q302 on ANY (l_orderkey, l_suppkey, l_shipdate) × (o_orderkey,
    * o_orderdate) frames — spec'd on a planted laggard/fast/ok trio
    * beside the oracled corpus run. */
  private[graft] def supplierReliabilityOf(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val lags = lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("unix_micros(l_shipdate) div 86400000000").as("ship_day"))
      .join(orders.select(col("o_orderkey"),
        expr("unix_micros(o_orderdate) div 86400000000").as("order_day")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("suppkey"),
        (col("ship_day") - col("order_day")).as("lag_days"))
    // VALUE-DOMAIN fold before the exact percentiles (q67's discipline):
    // lag_days spans ~10² distinct values per supplier, so the codegen'd
    // (suppkey, lag_days) count fold compresses the join output map-side
    // and the percentile buffers hold weighted distinct values instead of
    // every line — identical by definition to the row-level form
    // (Spark's `percentile(col, p, freq)` is the exact weighted
    // percentile; counters ride the same fold as Σfreq).
    val vd = lags.groupBy(col("suppkey"), col("lag_days"))
      .agg(count(lit(1)).as("f"))
    val per = vd.groupBy(col("suppkey"))
      .agg(sum(col("f")).as("n_lines"),
        sum(when(col("lag_days") > 30L, col("f")).otherwise(0L)).as("n_late"),
        expr("CAST(round(percentile(lag_days, 0.5D, f) * 100) AS BIGINT)")
          .as("p50_x100"),
        expr("CAST(round(percentile(lag_days, 0.9D, f) * 100) AS BIGINT)")
          .as("p90_x100"))
      .localCheckpoint() // two consumers: the 1-row totals + the league
    val tot = per.agg(sum(col("n_lines")).as("nn"), sum(col("n_late")).as("tt"))
    per.crossJoin(broadcast(tot))
      .select(col("suppkey"), col("n_lines"), col("p50_x100"), col("p90_x100"),
        expr("n_late * 10000 DIV n_lines").as("late_bp"),
        expr("""CASE WHEN tt = 0 OR tt = nn THEN CAST(0 AS BIGINT)
                ELSE CAST(round((CAST(n_late AS DECIMAL(38,0)) * nn
                                 - CAST(n_lines AS DECIMAL(38,0)) * tt)
                     / sqrt(CAST(CAST(n_lines AS DECIMAL(38,0)) * tt * (nn - tt) AS DOUBLE))
                     * 1000) AS BIGINT) END""").as("z_x1000"))
      .withColumn("verdict",
        when(col("z_x1000") >= 1960L, "laggard")
          .when(col("z_x1000") <= -1960L, "fast").otherwise("ok"))
  }

  /** q182: seasonal-naive forecast backtest — before anyone trains on
    * q177's features, the baseline every volume model must beat:
    * forecast(d) = n(d−7) (seasonal naive) vs n(d−1) (naive), scored
    * over every day where the lag exists. Per type: scored days, each
    * model's MAE (rounded micro), the symmetric APE in basis points
    * (Σ|n−f| / Σ(n+f) — denominators can't vanish on nonempty days),
    * and the skill of seasonal over naive. Gap honesty: lags are RANGE
    * frames, so a missing day scores nothing rather than sliding the
    * comparison (q177's rule).
    */
  def q182ForecastBacktest(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("f7", max(col("n")).over(w.rangeBetween(-7, -7)))
      .withColumn("f1", max(col("n")).over(w.rangeBetween(-1, -1)))
      .filter(col("f7").isNotNull && col("f1").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days_scored"),
        sum(abs(col("n") - col("f7"))).as("ae7"),
        sum(abs(col("n") - col("f1"))).as("ae1"),
        sum(col("n") + col("f7")).as("den7"))
      .select(col("event_type"), col("n_days_scored"),
        expr("""CAST(round(1000000.0 * CAST(ae7 AS DOUBLE) /
                CAST(n_days_scored AS DOUBLE)) AS BIGINT)""").as("mae7_micro"),
        expr("""CAST(round(1000000.0 * CAST(ae1 AS DOUBLE) /
                CAST(n_days_scored AS DOUBLE)) AS BIGINT)""").as("mae1_micro"),
        expr("""CAST(round(10000.0 * CAST(ae7 AS DOUBLE) /
                CAST(den7 AS DOUBLE)) AS BIGINT)""").as("smape7_bp"),
        expr("""CASE WHEN ae1 > 0
                THEN CAST(round(10000.0 * (1.0 - CAST(ae7 AS DOUBLE) /
                     CAST(ae1 AS DOUBLE))) AS BIGINT) END""").as("skill_bp"))
  }

  /** q183: cohort LTV curves — cumulative revenue per original cohort
    * member by months-since-first-order, the lifetime-value companion of
    * q79's activity retention (q79 answers "do they come back", this
    * answers "what are they WORTH over time"; the divisor is the FULL
    * cohort size, not the still-active count, so curves are comparable
    * across cohorts). Months are integer year·12+month arithmetic (no
    * engine month-diff semantics in play); revenue is exact cents;
    * ltv_cents_per_cust floors an always-nonnegative division, where
    * truncate-vs-floor cannot split.
    *
    * Shape: the customer-bounded cohort frame is localCheckpointed so
    * its two consumers (sizes + the fact join) don't re-run the cohort
    * aggregate's scan — orders is read twice (cohort aggregate + fact
    * side), both projection-only; everything after the (cohort, age)
    * aggregate runs on a months²-bounded frame with a broadcast
    * cohort-size join and a cohort-partitioned cumsum window.
    */
  def q183CohortLtv(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"),
        expr("""CAST(year(CAST(o_orderdate AS DATE)) * 12 +
                month(CAST(o_orderdate AS DATE)) AS BIGINT)""").as("m"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val cohort = o.groupBy(col("o_custkey")).agg(min(col("m")).as("m0"))
      .localCheckpoint()
    val sizes = cohort.groupBy(col("m0")).agg(count(lit(1)).as("cohort_n"))
    val wCum = Window.partitionBy(col("m0")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.join(cohort, Seq("o_custkey"))
      .groupBy(col("m0"), (col("m") - col("m0")).as("age"))
      .agg(countDistinct(col("o_custkey")).as("n_active"),
        sum(col("cents")).as("rev_cents"))
      .join(broadcast(sizes), Seq("m0"))
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(wCum))
      .select(col("m0").as("cohort_month"), col("age"), col("n_active"),
        col("rev_cents"), col("cohort_n"),
        expr("cum_rev_cents DIV cohort_n").as("ltv_cents_per_cust"))
  }

  /** q277: inter-ORDER gap profile — the purchase-cadence table behind
    * replenishment/churn decisions: gaps between a customer's consecutive
    * orders (deterministic (date, orderkey) order), banded same-day /
    * ≤1w / ≤1mo / ≤3mo / longer, rolled up per market segment with
    * within-segment share and the exact integer mean gap. q79 says WHO
    * comes back by month, q243 the return curve by day offset; this says
    * how far apart the purchases themselves sit — the number an
    * inventory/CRM cadence is actually tuned to.
    *
    * Exactness: day gaps are integer date arithmetic; share and mean are
    * all-positive integer DIVs.
    *
    * Scale shape: ONE orders exchange on o_custkey feeds the lag window
    * (per-customer partitions, inherently the join key); the segment join
    * is dim-scale (broadcast), the fold is |segments|×|bands|.
    */
  def q277OrderGapProfile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val bySeg = Window.partitionBy(col("c_mktsegment"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("gap_days", datediff(col("o_orderdate"), col("prev")).cast("long"))
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .withColumn("gap_band",
        when(col("gap_days") === 0, "a_same_day")
          .when(col("gap_days") <= 7, "b_within_week")
          .when(col("gap_days") <= 30, "c_within_month")
          .when(col("gap_days") <= 90, "d_within_quarter")
          .otherwise("e_longer"))
      .groupBy(col("c_mktsegment"), col("gap_band"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap_days")).as("sum_days"))
      .withColumn("tot", sum(col("n_gaps")).over(bySeg))
      .select(col("c_mktsegment"), col("gap_band"), col("n_gaps"),
        expr("n_gaps * 10000 DIV tot").as("share_bp"),
        expr("sum_days DIV n_gaps").as("avg_gap_days"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q277_order_gap_profile" -> (q277OrderGapProfile _),
    "q183_cohort_ltv"      -> (q183CohortLtv _),
    "q181_stl_decompose"   -> (q181StlDecompose _),
    "q238_seasonal_strength" -> (q238SeasonalStrength _),
    "q244_hhi"             -> (q244Hhi _),
    "q246_ship_lag"        -> (q246ShipLag _),
    "q302_supplier_reliability" -> (q302SupplierReliability _),
    "q305_growth_accounting" -> (q305GrowthAccounting _),
    "q182_forecast_backtest" -> (q182ForecastBacktest _),
    "q177_demand_features" -> (q177DemandFeatures _),
    "q163_survival"     -> (q163Survival _),
    "q139_pareto"       -> (q139Pareto _),
    "q137_stickiness"   -> (q137Stickiness _),
    "q106_basket_lift"  -> (q106BasketLift _),
    "q109_upsert_latest" -> (q109UpsertLatest _),
    "q110_point_in_time" -> (q110PointInTime _),
    "q113_seq_pairs"    -> (q113SeqPairs _),
    "q123_calendar_rollup" -> (q123CalendarRollup _),
    "q130_mix_decomposition" -> (q130MixDecomposition _),
    "q77_scd2_merge"    -> (q77Scd2Merge _),
    "q78_grouping_sets" -> (q78GroupingSets _),
    "q79_retention"     -> (q79Retention _),
    "q80_rfm"           -> (q80Rfm _),
    "q81_scd2"          -> (q81Scd2 _),
    "q82_transitions"   -> (q82Transitions _),
    "q83_pack_sequences" -> (q83PackSequences _),
    "q263_pack_budget_sweep" -> (q263PackBudgetSweep _))

  /** q263's swept bin budgets — code-owned; the oracle inlines the same
    * literals. Brackets q83's production 2048. */
  private[graft] val PackBudgets = Seq(512L, 1024L, 2048L, 4096L)

  /** q263: PACKING-BUDGET sweep — the sequence-length knob table read
    * beside q83 (the packing itself) and q212 (per-doc padding waste):
    * per budget ∈ {512 … 4096}, the bins the greedy layout opens, the
    * fill ratio achieved, and how many documents STRADDLE a bin boundary
    * (the rows a trainer must truncate, split, or attention-mask across
    * — the real cost of a small budget that fill_bp alone understates;
    * a large budget fills worse but straddles less). Shares q83's exact
    * layout frame (same hash order, same cumulative offsets), so the
    * sweep prices the very layout q83 ships.
    *
    * Exactness: pure integer window sums and DIVs off ONE windowed
    * frame; the per-budget sweep is 4 projections of that frame.
    *
    * Shape: q83's 256-bucket hash windows (bounded partitions), one
    * |buckets|-row fold per budget, 4-row answer.
    */
  def q263PackBudgetSweep(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bucket", substring(col("h"), 1, 2))
      .withColumn("off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .localCheckpoint() // one layout frame feeds every sweep point
    PackBudgets.map { b =>
      packed
        .select(col("bucket"), col("n_tokens"),
          expr(s"off div $b").as("bin"),
          when(expr(s"off % $b") + col("n_tokens") > b, 1L).otherwise(0L)
            .as("straddle"))
        .groupBy(col("bucket"))
        .agg(max(col("bin")).as("maxbin"), sum(col("n_tokens")).as("nt"),
          sum(col("straddle")).as("ns"))
        .agg(sum(expr("maxbin + 1")).as("n_bins"),
          sum(col("nt")).as("total_tokens"),
          sum(col("ns")).as("n_straddlers"))
        .select(lit(b).as("budget"), col("n_bins"), col("total_tokens"),
          expr(s"(total_tokens * 10000) DIV (n_bins * $b)").as("fill_bp"),
          col("n_straddlers"))
    }.reduce(_ unionByName _)
  }

  /** q81's full-rebuild SQL — also q77's oracle: the incremental merge must
    * hash-identically reproduce the batch rebuild. */
  private val scd2RebuildSql =
    """WITH typed AS (
         SELECT user_id, event_type, ts, event_id,
                lag(event_type) OVER w AS prev_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       changes AS (
         SELECT user_id, event_type, ts, event_id,
                epoch_us(ts) // 1000 AS valid_from_ms
         FROM typed
         WHERE prev_type IS NULL OR prev_type <> event_type)
       SELECT user_id, event_type,
              CAST(row_number() OVER w AS INTEGER) AS version,
              valid_from_ms,
              lead(valid_from_ms) OVER w AS valid_to_ms,
              CASE WHEN lead(valid_from_ms) OVER w IS NULL
                   THEN 1 ELSE 0 END AS is_current
       FROM changes
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""

  /** [[stlFrame]]'s DuckDB rendering, ending in the `dec` CTE — shared
    * by the q181 and q238 oracles (one decomposition definition per
    * engine pair).
    */
  private val stlSql: String =
    """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         tr AS (
           SELECT *,
                  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
                    RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS t_sum,
                  CAST(count(n) OVER (PARTITION BY event_type ORDER BY day
                    RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS t_cnt
           FROM daily),
         t2 AS (
           SELECT *, CAST(round(1000000.0 * CAST(t_sum AS DOUBLE) /
                       CAST(t_cnt AS DOUBLE)) AS BIGINT) AS trend_micro,
                  (day + 4) % 7 AS dow7
           FROM tr),
         t3 AS (SELECT *, n * 1000000 - trend_micro AS detrended_micro FROM t2),
         se AS (
           SELECT event_type, dow7,
                  CAST(round(CAST(sum(detrended_micro) AS DOUBLE) /
                    CAST(count(*) AS DOUBLE)) AS BIGINT) AS seasonal_micro
           FROM t3 GROUP BY 1, 2),
         dec AS (
           SELECT t3.event_type, day, t3.dow7, n, trend_micro,
                  detrended_micro, seasonal_micro,
                  n * 1000000 - trend_micro - seasonal_micro AS residual_micro
           FROM t3 JOIN se ON t3.event_type = se.event_type AND t3.dow7 = se.dow7)"""

  val oracles: Map[String, String] = Map(
    "q277_order_gap_profile" ->
      """WITH g AS (
           SELECT o_custkey, o_orderdate,
                  lag(o_orderdate) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey) AS prev
           FROM orders),
          d AS (SELECT o_custkey,
                       CAST(date_diff('day', prev, o_orderdate) AS BIGINT) AS gap_days
                FROM g WHERE prev IS NOT NULL),
          b AS (SELECT c.c_mktsegment,
                       CASE WHEN gap_days = 0 THEN 'a_same_day'
                            WHEN gap_days <= 7 THEN 'b_within_week'
                            WHEN gap_days <= 30 THEN 'c_within_month'
                            WHEN gap_days <= 90 THEN 'd_within_quarter'
                            ELSE 'e_longer' END AS gap_band,
                       gap_days
                FROM d JOIN customer c ON o_custkey = c_custkey),
          a AS (SELECT c_mktsegment, gap_band,
                       CAST(count(*) AS BIGINT) AS n_gaps,
                       CAST(sum(gap_days) AS BIGINT) AS sum_days
                FROM b GROUP BY 1, 2),
          t AS (SELECT *, CAST(sum(n_gaps) OVER (PARTITION BY c_mktsegment)
                            AS BIGINT) AS tot FROM a)
          SELECT c_mktsegment, gap_band, n_gaps,
                 n_gaps * 10000 // tot AS share_bp,
                 sum_days // n_gaps AS avg_gap_days
          FROM t""",
    "q183_cohort_ltv" ->
      """WITH o AS (
           SELECT o_custkey,
                  CAST(year(CAST(o_orderdate AS DATE)) * 12 +
                       month(CAST(o_orderdate AS DATE)) AS BIGINT) AS m,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
         cohort AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY 1),
         sizes AS (SELECT m0, CAST(count(*) AS BIGINT) AS cohort_n
                   FROM cohort GROUP BY 1),
         cells AS (
           SELECT c.m0, o.m - c.m0 AS age,
                  CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
                  CAST(sum(o.cents) AS BIGINT) AS rev_cents
           FROM o JOIN cohort c USING (o_custkey)
           GROUP BY 1, 2),
         w AS (
           SELECT cells.*, sizes.cohort_n,
                  CAST(sum(rev_cents) OVER (PARTITION BY cells.m0 ORDER BY age
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                    AS cum_rev_cents
           FROM cells JOIN sizes USING (m0))
         SELECT m0 AS cohort_month, age, n_active, rev_cents, cohort_n,
                cum_rev_cents // cohort_n AS ltv_cents_per_cust
         FROM w""",
    "q305_growth_accounting" ->
      """WITH a AS (
           SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 // 7 AS week
           FROM events),
         t AS (
           SELECT user_id, week,
                  lag(week) OVER (PARTITION BY user_id ORDER BY week)
                    AS prev_week,
                  lead(week) OVER (PARTITION BY user_id ORDER BY week)
                    AS next_week
           FROM a),
         b AS (SELECT min(week) AS w0, max(week) AS w1 FROM t),
         g AS (SELECT unnest(generate_series(w0, w1)) AS week FROM b),
         c AS (
           SELECT week, CAST(count(*) AS BIGINT) AS n_active,
                  CAST(sum(CASE WHEN prev_week IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
                  CAST(sum(CASE WHEN prev_week = week - 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_retained,
                  CAST(sum(CASE WHEN prev_week IS NOT NULL
                                 AND prev_week < week - 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_resurrected
           FROM t GROUP BY 1),
         ch AS (
           SELECT week + 1 AS week, CAST(count(*) AS BIGINT) AS n_churned
           FROM t WHERE next_week IS NULL OR next_week > week + 1
           GROUP BY 1)
         SELECT g.week, COALESCE(c.n_active, 0) AS n_active,
                COALESCE(c.n_new, 0) AS n_new,
                COALESCE(c.n_retained, 0) AS n_retained,
                COALESCE(c.n_resurrected, 0) AS n_resurrected,
                COALESCE(ch.n_churned, 0) AS n_churned,
                CASE WHEN COALESCE(ch.n_churned, 0) > 0
                     THEN (COALESCE(c.n_new, 0) + COALESCE(c.n_resurrected, 0))
                          * 100 // ch.n_churned END AS quick_ratio_x100
         FROM g LEFT JOIN c USING (week) LEFT JOIN ch USING (week)""",
    "q302_supplier_reliability" ->
      """WITH lag AS (
           SELECT l_suppkey AS suppkey,
                  (epoch_us(l_shipdate) // 86400000000)
                    - (epoch_us(o_orderdate) // 86400000000) AS lag_days
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         per AS (
           SELECT suppkey, CAST(count(*) AS BIGINT) AS n_lines,
                  CAST(sum(CASE WHEN lag_days > 30 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_late,
                  CAST(round(quantile_cont(lag_days, 0.5) * 100) AS BIGINT)
                    AS p50_x100,
                  CAST(round(quantile_cont(lag_days, 0.9) * 100) AS BIGINT)
                    AS p90_x100
           FROM lag GROUP BY 1),
         tot AS (
           SELECT CAST(sum(n_lines) AS BIGINT) AS nn,
                  CAST(sum(n_late) AS BIGINT) AS tt
           FROM per),
         z AS (
           SELECT suppkey, n_lines, p50_x100, p90_x100,
                  n_late * 10000 // n_lines AS late_bp,
                  CASE WHEN tt = 0 OR tt = nn THEN CAST(0 AS BIGINT)
                       ELSE CAST(round((CAST(n_late AS HUGEINT) * nn
                                        - CAST(n_lines AS HUGEINT) * tt)
                            / sqrt(CAST(CAST(n_lines AS HUGEINT) * tt * (nn - tt) AS DOUBLE))
                            * 1000) AS BIGINT) END AS z_x1000
           FROM per CROSS JOIN tot)
         SELECT suppkey, n_lines, p50_x100, p90_x100, late_bp, z_x1000,
                CASE WHEN z_x1000 >= 1960 THEN 'laggard'
                     WHEN z_x1000 <= -1960 THEN 'fast'
                     ELSE 'ok' END AS verdict
         FROM z""",
    "q246_ship_lag" ->
      """WITH fs AS (
           SELECT l_orderkey,
                  min(epoch_us(l_shipdate) // 86400000000) AS ship_day
           FROM lineitem GROUP BY 1),
         lag AS (
           SELECT o_orderpriority AS priority,
                  ship_day - (epoch_us(o_orderdate) // 86400000000) AS lag_days
           FROM orders JOIN fs ON o_orderkey = l_orderkey)
         SELECT priority, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(round(quantile_cont(lag_days, 0.5) * 100) AS BIGINT)
                  AS p50_x100,
                CAST(round(quantile_cont(lag_days, 0.9) * 100) AS BIGINT)
                  AS p90_x100,
                CAST(max(lag_days) AS BIGINT) AS max_lag_days
         FROM lag GROUP BY 1""",
    "q244_hhi" ->
      """WITH pc AS (
           SELECT o_custkey,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
           FROM orders GROUP BY 1),
         seg AS (
           SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
                  sum(CAST(cents AS HUGEINT)) AS s1,
                  sum(CAST(cents AS HUGEINT) * cents) AS s2
           FROM pc JOIN customer ON o_custkey = c_custkey
           GROUP BY 1)
         SELECT c_mktsegment AS mktsegment, n_customers,
                CAST(s1 AS BIGINT) AS revenue_cents,
                CAST(round(10000.0 * CAST(s2 AS DOUBLE) /
                     (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))) AS BIGINT)
                  AS hhi_x10000,
                CAST(round(100.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) /
                     CAST(s2 AS DOUBLE)) AS BIGINT) AS effective_n_x100
         FROM seg""",
    "q181_stl_decompose" -> s"""$stlSql
         SELECT event_type, day, dow7, n AS n_events,
                trend_micro, seasonal_micro, residual_micro
         FROM dec""",
    "q238_seasonal_strength" -> s"""$stlSql,
         a AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                  sum(CAST(detrended_micro AS HUGEINT)) AS sd,
                  sum(CAST(detrended_micro AS HUGEINT) * detrended_micro) AS sd2,
                  sum(CAST(residual_micro AS HUGEINT)) AS sr,
                  sum(CAST(residual_micro AS HUGEINT) * residual_micro) AS sr2
           FROM dec GROUP BY 1)
         SELECT event_type, n_days,
                CASE WHEN n_days * sd2 - sd * sd > 0
                     THEN CAST(greatest(round(10000.0 *
                          (1.0 - CAST(n_days * sr2 - sr * sr AS DOUBLE) /
                                 CAST(n_days * sd2 - sd * sd AS DOUBLE))),
                          0.0) AS BIGINT) END AS strength_bp
         FROM a""",
    "q182_forecast_backtest" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         f AS (
           SELECT *,
                  max(n) OVER (PARTITION BY event_type ORDER BY day
                    RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS f7,
                  max(n) OVER (PARTITION BY event_type ORDER BY day
                    RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS f1
           FROM daily),
         sc AS (
           SELECT event_type,
                  CAST(count(*) AS BIGINT) AS n_days_scored,
                  CAST(sum(abs(n - f7)) AS BIGINT) AS ae7,
                  CAST(sum(abs(n - f1)) AS BIGINT) AS ae1,
                  CAST(sum(n + f7) AS BIGINT) AS den7
           FROM f WHERE f7 IS NOT NULL AND f1 IS NOT NULL
           GROUP BY 1)
         SELECT event_type, n_days_scored,
                CAST(round(1000000.0 * CAST(ae7 AS DOUBLE) /
                  CAST(n_days_scored AS DOUBLE)) AS BIGINT) AS mae7_micro,
                CAST(round(1000000.0 * CAST(ae1 AS DOUBLE) /
                  CAST(n_days_scored AS DOUBLE)) AS BIGINT) AS mae1_micro,
                CAST(round(10000.0 * CAST(ae7 AS DOUBLE) /
                  CAST(den7 AS DOUBLE)) AS BIGINT) AS smape7_bp,
                CASE WHEN ae1 > 0
                     THEN CAST(round(10000.0 * (1.0 - CAST(ae7 AS DOUBLE) /
                          CAST(ae1 AS DOUBLE))) AS BIGINT) END AS skill_bp
         FROM sc""",
    "q177_demand_features" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2)
         SELECT event_type, day, (day + 4) % 7 AS dow7, n AS n_events,
                max(n) OVER (PARTITION BY event_type ORDER BY day
                  RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS lag_1,
                max(n) OVER (PARTITION BY event_type ORDER BY day
                  RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS lag_7,
                CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
                  RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS trail7_sum,
                CAST(count(n) OVER (PARTITION BY event_type ORDER BY day
                  RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS trail7_days,
                max(n) OVER (PARTITION BY event_type ORDER BY day
                  RANGE BETWEEN 1 FOLLOWING AND 1 FOLLOWING) AS target_next
         FROM daily""",
    "q163_survival" ->
      """WITH e AS (
           SELECT user_id, ts, event_id,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events),
         sx AS (
           SELECT user_id, ts,
                  CAST(sum(CASE WHEN prev_ts IS NULL
                            OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess_no
           FROM e),
         u AS (
           SELECT user_id, sess_no,
                  min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
           FROM sx GROUP BY 1, 2),
         mx AS (SELECT max(end_us) AS max_us FROM u),
         d AS (
           SELECT (end_us - start_us) // 60000000 AS t_min,
                  CASE WHEN end_us < max_us - 1800000000 THEN 1 ELSE 0 END AS ended
           FROM u CROSS JOIN mx),
         g AS (
           SELECT t_min,
                  CAST(sum(ended) AS BIGINT) AS n_ended,
                  CAST(sum(1 - ended) AS BIGINT) AS n_censored
           FROM d GROUP BY 1),
         r AS (
           SELECT *,
                  CAST(sum(n_ended + n_censored) OVER () AS BIGINT)
                    - CAST(sum(n_ended + n_censored) OVER (
                        ORDER BY t_min ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT)
                    + (n_ended + n_censored) AS n_risk
           FROM g),
         h AS (
           SELECT *, CASE WHEN n_ended > 0 THEN
                       CAST(round(ln(n_risk) * 1000000) AS BIGINT)
                       - CAST(round(ln(greatest(n_risk - n_ended, 1)) * 1000000) AS BIGINT)
                     ELSE 0 END AS term_micro
           FROM r)
         SELECT t_min, n_risk, n_ended, n_censored,
                CAST(sum(term_micro) OVER (
                  ORDER BY t_min ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS chaz_micro
         FROM h""",
    "q139_pareto" ->
      """WITH cust AS (
           SELECT c_mktsegment, c_custkey,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                    AS cents
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         w AS (
           SELECT c_mktsegment, cents,
                  sum(cents) OVER (PARTITION BY c_mktsegment
                    ORDER BY cents DESC, c_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                  sum(cents) OVER (PARTITION BY c_mktsegment) AS total,
                  count(*) OVER (PARTITION BY c_mktsegment) AS n_cust
           FROM cust),
         g AS (
           SELECT c_mktsegment,
                  max(n_cust) AS n_customers,
                  max(total) AS revenue_cents,
                  sum(CASE WHEN cum - cents < (total + 1) // 2
                      THEN 1 ELSE 0 END) AS n_half
           FROM w GROUP BY 1)
         SELECT c_mktsegment,
                CAST(n_customers AS BIGINT) AS n_customers,
                CAST(revenue_cents AS BIGINT) AS revenue_cents,
                CAST(n_half AS BIGINT) AS n_half,
                CAST(n_half * 10000 // n_customers AS BIGINT) AS half_share_bp
         FROM g""",
    // WAU(d) counts users active on any of days d-6..d, i.e. a user's
    // activity day `day` contributes to target days day..day+6 — the same
    // 7× offset explode of the deduplicated (user, day) frame as Spark.
    "q137_stickiness" ->
      """WITH ud AS (
           SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
           FROM events),
         dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
         wau AS (
           SELECT day, count(*) AS wau FROM (
             SELECT DISTINCT ud.day + t.i AS day, ud.user_id
             FROM ud CROSS JOIN generate_series(0, 6) t(i))
           GROUP BY day)
         SELECT dau.day AS day, dau, wau, dau * 10000 // wau AS stickiness_bp
         FROM dau JOIN wau ON dau.day = wau.day""",
    "q130_mix_decomposition" ->
      """WITH o AS (
           SELECT c_mktsegment,
                  CAST(date_part('year', o_orderdate) AS INTEGER) AS y,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE CAST(date_part('year', o_orderdate) AS INTEGER) IN (1996, 1997)),
         a AS (
           SELECT c_mktsegment,
                  CAST(sum(CASE WHEN y = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                  CAST(sum(CASE WHEN y = 1996 THEN cents ELSE 0 END) AS BIGINT) AS rev1,
                  CAST(sum(CASE WHEN y = 1997 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                  CAST(sum(CASE WHEN y = 1997 THEN cents ELSE 0 END) AS BIGINT) AS rev2
           FROM o GROUP BY c_mktsegment)
         SELECT c_mktsegment, n1, rev1, n2, rev2,
                rev2 - rev1 AS delta_cents,
                round(CAST(n2 - n1 AS DOUBLE) * CAST(rev1 AS DOUBLE) / nullif(n1, 0), 2)
                  AS volume_effect_cents,
                round(CAST(n2 AS DOUBLE) *
                      (CAST(rev2 AS DOUBLE) / nullif(n2, 0)
                       - CAST(rev1 AS DOUBLE) / nullif(n1, 0)), 2)
                  AS price_effect_cents
         FROM a""",
    "q123_calendar_rollup" ->
      """WITH r AS (
           SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS y,
                  CAST(date_part('quarter', o_orderdate) AS BIGINT) AS qtr,
                  CAST(date_part('month', o_orderdate) AS BIGINT) AS mon,
                  CAST(GROUPING(date_part('year', o_orderdate)) * 4
                     + GROUPING(date_part('quarter', o_orderdate)) * 2
                     + GROUPING(date_part('month', o_orderdate)) AS INTEGER) AS gid,
                  count(*) AS n_orders,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                    AS revenue_cents
           FROM orders
           GROUP BY ROLLUP (date_part('year', o_orderdate),
                            date_part('quarter', o_orderdate),
                            date_part('month', o_orderdate)))
         SELECT y, qtr, mon, gid, n_orders, revenue_cents,
                CASE WHEN gid = 0 THEN
                  CAST(revenue_cents * 10000 //
                       sum(CASE WHEN gid = 0 THEN revenue_cents END)
                         OVER (PARTITION BY y) AS BIGINT)
                END AS share_of_year_bp
         FROM r""",
    "q109_upsert_latest" ->
      """WITH r AS (
           SELECT user_id, event_type,
                  CAST(round(value * 100) AS BIGINT) AS cents,
                  epoch_us(ts) // 1000 AS ts_ms,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
         SELECT user_id, event_type AS last_type,
                cents AS last_value_cents, ts_ms AS last_ts_ms
         FROM r WHERE rn = 1 AND event_type <> 'error'""",
    "q110_point_in_time" ->
      """WITH typed AS (
           SELECT user_id, event_type, ts, event_id,
                  lag(event_type) OVER w AS prev_type
           FROM events WHERE event_type <> 'purchase'
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         changes AS (
           SELECT user_id, event_type, ts, event_id,
                  epoch_us(ts) // 1000 AS valid_from_ms
           FROM typed WHERE prev_type IS NULL OR prev_type <> event_type),
         dim AS (
           SELECT user_id, event_type AS state_type,
                  CAST(row_number() OVER w AS INTEGER) AS state_version,
                  valid_from_ms, lead(valid_from_ms) OVER w AS valid_to_ms
           FROM changes
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         p AS (
           SELECT event_id, user_id, epoch_us(ts) // 1000 AS ts_ms
           FROM events WHERE event_type = 'purchase')
         SELECT p.event_id, p.user_id, p.ts_ms, d.state_type, d.state_version
         FROM p LEFT JOIN dim d
           ON p.user_id = d.user_id
          AND d.valid_from_ms <= p.ts_ms
          AND (d.valid_to_ms IS NULL OR p.ts_ms < d.valid_to_ms)""",
    "q113_seq_pairs" ->
      """WITH r AS (
           SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn
           FROM events),
         firsts AS (
           SELECT user_id, event_type, us, event_id FROM r WHERE rn = 1),
         tot AS (SELECT count(DISTINCT user_id) AS n_total FROM events),
         p AS (
           SELECT a.event_type AS type_a, b.event_type AS type_b,
                  count(*) AS n_users
           FROM firsts a JOIN firsts b ON a.user_id = b.user_id
             AND (a.us < b.us OR (a.us = b.us AND a.event_id < b.event_id))
           GROUP BY 1, 2)
         SELECT type_a, type_b, n_users,
                CAST(n_users * 10000 // n_total AS BIGINT) AS support_bp
         FROM p CROSS JOIN tot""",
    "q106_basket_lift" ->
      """WITH l AS (
           SELECT user_id, event_type, ts, event_id,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS prev_us
           FROM events),
         se AS (
           SELECT user_id, event_type,
                  CAST(sum(CASE WHEN prev_us IS NULL
                                  OR epoch_us(ts) - prev_us > 1800000000
                                THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
                    AS sess_no
           FROM l),
         items AS (SELECT DISTINCT user_id, sess_no, event_type FROM se),
         nb AS (SELECT count(*) AS n_baskets
                FROM (SELECT DISTINCT user_id, sess_no FROM items)),
         ic AS (SELECT event_type, count(*) AS n_item FROM items GROUP BY 1),
         p AS (
           SELECT a.event_type AS item_a, b.event_type AS item_b,
                  count(*) AS n_pair
           FROM items a
           JOIN items b ON a.user_id = b.user_id AND a.sess_no = b.sess_no
                        AND a.event_type < b.event_type
           GROUP BY 1, 2)
         SELECT item_a, item_b, n_pair,
                ia.n_item AS n_a, ib.n_item AS n_b,
                CAST(n_pair * 10000 // n_baskets AS BIGINT) AS support_bp,
                CAST(n_pair * 10000 // ia.n_item AS BIGINT) AS conf_a_to_b_bp,
                CAST(n_pair * 10000 // ib.n_item AS BIGINT) AS conf_b_to_a_bp,
                round(CAST(n_pair * n_baskets AS DOUBLE) /
                      CAST(ia.n_item * ib.n_item AS DOUBLE), 4) AS lift
         FROM p
         JOIN ic ia ON item_a = ia.event_type
         JOIN ic ib ON item_b = ib.event_type
         CROSS JOIN nb""",
    "q77_scd2_merge" -> scd2RebuildSql,
    "q78_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS INTEGER) AS gid,
                count(*) AS n_items,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""",
    "q263_pack_budget_sweep" -> {
      val per = PackBudgets.map { b =>
        s"""SELECT CAST($b AS BIGINT) AS budget,
               CAST(sum(maxbin + 1) AS BIGINT) AS n_bins,
               CAST(sum(nt) AS BIGINT) AS total_tokens,
               (CAST(sum(nt) AS BIGINT) * 10000)
                 // (CAST(sum(maxbin + 1) AS BIGINT) * $b) AS fill_bp,
               CAST(sum(ns) AS BIGINT) AS n_straddlers
           FROM (SELECT bucket, max(off // $b) AS maxbin,
                        CAST(sum(n_tokens) AS BIGINT) AS nt,
                        CAST(sum(CASE WHEN off % $b + n_tokens > $b
                                 THEN 1 ELSE 0 END) AS BIGINT) AS ns
                 FROM packed GROUP BY 1)"""
      }
      s"""WITH toks AS (
           SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         packed AS (
           SELECT doc_id, substring(h, 1, 2) AS bucket, n_tokens,
                  CAST(coalesce(sum(n_tokens) OVER (
                    PARTITION BY substring(h, 1, 2) ORDER BY h, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                    AS off
           FROM toks)
         ${per.mkString("\nUNION ALL\n")}"""
    },
    "q83_pack_sequences" ->
      """WITH toks AS (
           SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         packed AS (
           SELECT doc_id, substring(h, 1, 2) AS bucket, n_tokens,
                  CAST(coalesce(sum(n_tokens) OVER (
                    PARTITION BY substring(h, 1, 2) ORDER BY h, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                    AS offset_in_bucket
           FROM toks)
         SELECT doc_id, bucket, n_tokens, offset_in_bucket,
                offset_in_bucket // 2048 AS bin_id,
                offset_in_bucket % 2048 AS offset_in_bin
         FROM packed""",
    "q79_retention" ->
      """WITH active AS (
           SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 // 7 AS week
           FROM events),
         cohort AS (
           SELECT user_id, min(week) AS cohort_week FROM active GROUP BY user_id),
         cells AS (
           SELECT cohort_week, week - cohort_week AS week_offset,
                  count(*) AS n_users
           FROM active JOIN cohort USING (user_id)
           GROUP BY 1, 2)
         SELECT cohort_week, week_offset, n_users,
                max(CASE WHEN week_offset = 0 THEN n_users END)
                  OVER (PARTITION BY cohort_week) AS cohort_size,
                n_users * 10000 // max(CASE WHEN week_offset = 0 THEN n_users END)
                  OVER (PARTITION BY cohort_week) AS retention_bp
         FROM cells""",
    "q80_rfm" ->
      """WITH per_cust AS (
           SELECT o_custkey,
                  max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS last_day,
                  count(*) AS n_orders,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
           FROM orders GROUP BY o_custkey),
         scored AS (
           SELECT o_custkey, c_mktsegment,
                  (SELECT max(last_day) FROM per_cust) - last_day AS recency_days,
                  n_orders, monetary_cents
           FROM per_cust JOIN customer ON o_custkey = c_custkey)
         SELECT o_custkey, c_mktsegment, recency_days, n_orders, monetary_cents,
                ntile(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY recency_days DESC, o_custkey ASC) AS r_q,
                ntile(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY n_orders ASC, o_custkey ASC) AS f_q,
                ntile(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY monetary_cents ASC, o_custkey ASC) AS m_q,
                ntile(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY recency_days DESC, o_custkey ASC) * 100
                + ntile(4) OVER (PARTITION BY c_mktsegment
                                 ORDER BY n_orders ASC, o_custkey ASC) * 10
                + ntile(4) OVER (PARTITION BY c_mktsegment
                                 ORDER BY monetary_cents ASC, o_custkey ASC) AS rfm
         FROM scored""",
    "q81_scd2" -> scd2RebuildSql,
    "q82_transitions" ->
      """WITH pairs AS (
           SELECT lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev_type,
                  event_type AS next_type
           FROM events),
         counted AS (
           SELECT prev_type, next_type, count(*) AS n_transitions
           FROM pairs WHERE prev_type IS NOT NULL
           GROUP BY 1, 2)
         SELECT prev_type, next_type, n_transitions,
                CAST(n_transitions * 10000 // sum(n_transitions)
                  OVER (PARTITION BY prev_type) AS BIGINT) AS share_bp
         FROM counted""")
}
