package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** A-block: the relational core of the engine — the ingest → clean →
  * aggregate path of a trip-data ETL pipeline re-expressed as declarative
  * Spark plans so Catalyst handles pushdown, pruning and join planning.
  *
  * Determinism rules (SURVEY.md §6): every double aggregate is rounded
  * identically here and in the DuckDB oracle; top-k ties are broken by a
  * unique key.
  */
object Relational {

  private def money(c: Column): Column = round(c, 2)
  private def ratio(c: Column): Column = round(c, 4)

  /** §6 upgraded (r18, found by the full-surface sf≈1 sweep): MONEY SUMS
    * aggregate EXACTLY, never as doubles — `round(sum(double), 2)` is
    * summation-ORDER-sensitive (the 2-decimal source values are not
    * representable, so partition order moves the sum by ULPs), and at
    * 10× volume the error crosses the cent boundary: a re-run of the
    * same query on the same data could flip the last digit, and Spark
    * and DuckDB DID (q01/q04/q09 at sf1ev).
    *
    * r19 upgraded the MECHANISM, not the semantics: the r18 fold cast
    * each operand to its domain-tight decimal and summed decimals, but
    * any sum whose buffer precision exceeds 18 digits pays a 128-bit
    * BigDecimal add PER ROW (measured 1.5–2.7× on q01/q04/q09/q43).
    * The fold now recovers each operand's exact scaled-integer units
    * with codegen'd long arithmetic ([[graft.functions.MoneySum.units]]
    * — provably identical to the decimal cast on the 2-dp money
    * domain), multiplies units in 64-bit (per-row magnitudes ≤ 10¹¹,
    * nowhere near 2⁶³), and sums through the native
    * [[graft.functions.MoneySumUnits]] aggregate: one overflow-checked
    * 64-bit register per partition partial, 128-bit only at actual
    * overflow. The exact total is identical to the decimal sum — the
    * oracle SQL below is UNCHANGED — and the output is still ONE
    * deterministic decimal→double conversion. Quantity sums stay
    * double: integer-valued doubles below 2⁵³ add exactly in any
    * order. */
  import graft.functions.MoneySum
  /** Exact integer cents (or percent) of a 2-dp money double. */
  private def centsU(c: Column): Column = MoneySum.units(c, 2)
  /** extendedprice·(1−discount) in exact 10⁻⁴-dollar units. */
  private val discU: Column =
    centsU(col("l_extendedprice")) * (lit(100L) - centsU(col("l_discount")))
  /** Exact money sum of long units → rounded-to-cents double. */
  private def moneySumU(units: Column, scale: Int): Column =
    round(MoneySum.sum(units, scale), 2).cast("double")
  private def ts(s: String): Column    = lit(s).cast("timestamp")

  /** q01: pricing-summary aggregation with filter pushed to the scan. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(sum(col("l_quantity"))).as("sum_qty"),
        moneySumU(centsU(col("l_extendedprice")), 2).as("sum_base_price"),
        moneySumU(discU, 4).as("sum_disc_price"),
        moneySumU(discU * (lit(100L) + centsU(col("l_tax"))), 6).as("sum_charge"),
        ratio(avg(col("l_quantity"))).as("avg_qty"),
        // exact integer-units sum, ONE double division: order-independent
        ratio(MoneySum.sum(centsU(col("l_extendedprice")), 2).cast("double") /
          count(lit(1))).as("avg_price"),
        ratio(MoneySum.sum(centsU(col("l_discount")), 2).cast("double") /
          count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** q02: selective filter + narrow projection — column pruning must reach
    * the parquet scan (ReadSchema shows 4 columns, PushedFilters the range).
    */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
              col("l_shipdate") <  ts("1997-02-01") &&
              col("l_quantity") < 5)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))

  /** q03: customer ⋈ orders ⋈ lineitem revenue top-k (TPC-H Q3 shape).
    * customer is broadcast (small dim); orders⋈lineitem shuffles on
    * orderkey — at 100 TB both facts would be bucketed on that key.
    */
  def q03JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < ts("1998-03-15"))
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > ts("1998-03-15"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(moneySumU(discU, 4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** q04: fact ⋈ broadcast dim, revenue per brand. */
  def q04BroadcastJoin(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        moneySumU(discU, 4).as("revenue"),
        count(lit(1)).as("n_items"))

  /** q05: 6-table star join (TPC-H Q5 shape): local-supplier revenue per
    * nation. All dims broadcast; the only shuffle is orders⋈lineitem.
    */
  def q05MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir)
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
    val su = Tables.supplier(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01"))
    val l = Tables.lineitem(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c),
        col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(moneySumU(discU, 4).as("revenue"))
  }

  /** q06: single-pass selective aggregate (TPC-H Q6 shape) — the whole
    * query is scan + filter + partial/final agg, no shuffle of raw rows.
    */
  def q06SelectiveAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
              col("l_shipdate") <  ts("1998-01-01") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(moneySumU(centsU(col("l_extendedprice")) * centsU(col("l_discount")),
             4).as("revenue"),
           count(lit(1)).as("n_items"))

  /** q07: global top-k with unique-key tie-break. */
  def q07SortLimit(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(15)

  /** q08: distinct cardinalities per group. */
  def q08Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("n_rows"))

  /** q09: windowed rank — top-3 revenue suppliers within each nation. */
  def q09WindowRank(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("s_suppkey"))
      .agg(moneySumU(discU, 4).as("revenue"))
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("revenue").desc, col("s_suppkey").asc)
    rev.withColumn("rnk", rank().over(w)).filter(col("rnk") <= 3)
  }

  /** q10: left-semi join (EXISTS). */
  def q10SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val f = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    Tables.customer(s, dir)
      .join(f, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** q11: left-anti join (NOT EXISTS) — customers with no urgent order. */
  def q11AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    Tables.customer(s, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
  }

  /** q12: set ops — union / intersect / except of two key sets, tagged.
    * One full-outer join of the two distinct key sets, with each key
    * exploding into the ops whose set it belongs to — the literal
    * union/intersect/except composition executed each input subtree three
    * times (Spark shares no common subtrees across union branches).
    */
  def q12SetOps(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.lineitem(s, dir).filter(col("l_quantity") > 45)
      .select(col("l_partkey").as("key")).distinct()
    val b = Tables.part(s, dir).filter(col("p_size") > 40)
      .select(col("p_partkey").as("key")).distinct()
    val none = array().cast("array<string>")
    a.select(col("key"), lit(true).as("in_a"))
      .join(b.select(col("key"), lit(true).as("in_b")), Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("in_a"), lit(false)).as("in_a"),
        coalesce(col("in_b"), lit(false)).as("in_b"))
      .select(col("key"), explode(concat(
        array(lit("union")),
        when(col("in_a") && col("in_b"), array(lit("intersect"))).otherwise(none),
        when(col("in_a") && !col("in_b"), array(lit("except"))).otherwise(none)))
        .as("op"))
  }

  /** q13: rollup over status → priority hierarchy. */
  def q13Rollup(s: SparkSession, dir: String): DataFrame =
    // TWO-LEVEL rollup: aggregate to the (status, priority) cells first
    // (one exchange, each fact row passes the decimal fold ONCE), then
    // roll the ≤|statuses×priorities| cell frame up — the plain
    // .rollup() Expand would push every fact row through the 128-bit
    // decimal accumulator THREE times (sum-of-exact-sums is exact, so
    // the output is identical; at 100 TB this is 2 spared fact-scale
    // passes through the grouping-set expansion)
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        MoneySum.sum(centsU(col("o_totalprice")), 2).as("t"))
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(col("n")).as("n_orders"),
        round(sum(col("t")), 2).cast("double").as("total"))

  /** q14: cube over returnflag × linestatus. */
  def q14Cube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), money(sum(col("l_quantity"))).as("sum_qty"))

  /** q15: CASE-based conditional aggregates (pivot-by-hand on status). */
  def q15ConditionalAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(
        moneySumU(when(col("o_orderstatus") === "F",
          centsU(col("o_totalprice"))).otherwise(lit(0L)), 2).as("total_f"),
        moneySumU(when(col("o_orderstatus") === "O",
          centsU(col("o_totalprice"))).otherwise(lit(0L)), 2).as("total_o"),
        moneySumU(when(col("o_orderstatus") === "P",
          centsU(col("o_totalprice"))).otherwise(lit(0L)), 2).as("total_p"),
        count(when(col("o_orderpriority") === "1-URGENT", lit(1))).as("n_urgent"))

  /** q16: post-aggregation filter (HAVING). */
  def q16Having(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey"))
      .agg(money(sum(col("l_quantity"))).as("total_qty"), count(lit(1)).as("n_items"))
      .filter(col("total_qty") > 15000)

  /** q17: per-group average subquery (TPC-H Q17 shape, small-qty orders). */
  def q17AvgSubquery(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val avgQty = l.groupBy(col("l_partkey").as("ap_partkey"))
      .agg((avg(col("l_quantity")) * 0.5).as("half_avg_qty"))
    l.join(avgQty, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < col("half_avg_qty"))
      .agg(money(MoneySum.sum(centsU(col("l_extendedprice")), 2).cast("double") / 7.0)
             .as("avg_yearly"),
           count(lit(1)).as("n_small"))
  }

  /** q18: IN-subquery over high-balance customers. */
  def q18InSubquery(s: SparkSession, dir: String): DataFrame = {
    val rich = Tables.customer(s, dir).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"))
    Tables.orders(s, dir)
      .join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  /** q19: moment statistics per group (bounded-magnitude column so the
    * single-pass variance matches the oracle bit-for-bit after rounding).
    */
  def q19Stats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        ratio(avg(col("l_quantity"))).as("avg_qty"),
        ratio(stddev_samp(col("l_quantity"))).as("sd_qty"),
        ratio(var_samp(col("l_quantity"))).as("var_qty"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project"  -> (q02FilterProject _),
    "q03_join_agg"        -> (q03JoinAgg _),
    "q04_broadcast_join"  -> (q04BroadcastJoin _),
    "q05_multi_join"      -> (q05MultiJoin _),
    "q06_selective_agg"   -> (q06SelectiveAgg _),
    "q07_sort_limit"      -> (q07SortLimit _),
    "q08_distinct"        -> (q08Distinct _),
    "q09_window_rank"     -> (q09WindowRank _),
    "q10_semi_join"       -> (q10SemiJoin _),
    "q11_anti_join"       -> (q11AntiJoin _),
    "q12_set_ops"         -> (q12SetOps _),
    "q13_rollup"          -> (q13Rollup _),
    "q14_cube"            -> (q14Cube _),
    "q15_conditional_agg" -> (q15ConditionalAgg _),
    "q16_having"          -> (q16Having _),
    "q17_avg_subquery"    -> (q17AvgSubquery _),
    "q18_in_subquery"     -> (q18InSubquery _),
    "q19_stats"           -> (q19Stats _))

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_disc_price,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_charge,
         round(avg(l_quantity), 4) AS avg_qty,
         round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4) AS avg_price,
         round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate <  TIMESTAMP '1997-02-01'
           AND l_quantity < 5""",
    "q03_join_agg" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-03-15'
           AND l_shipdate  > TIMESTAMP '1998-03-15'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",
    "q04_broadcast_join" ->
      """SELECT p_brand,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",
    "q05_multi_join" ->
      """SELECT r_name, n_name,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1998-01-01'
         GROUP BY r_name, n_name""",
    "q06_selective_agg" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate <  TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q07_sort_limit" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15""",
    "q08_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS distinct_parts,
         count(DISTINCT l_suppkey) AS distinct_supps,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",
    "q09_window_rank" ->
      """SELECT * FROM (
           SELECT s_nationkey, s_suppkey, revenue,
                  rank() OVER (PARTITION BY s_nationkey
                               ORDER BY revenue DESC, s_suppkey ASC) AS rnk
           FROM (SELECT s_nationkey, s_suppkey,
                        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
                 FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                 GROUP BY s_nationkey, s_suppkey))
         WHERE rnk <= 3""",
    "q10_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""",
    "q11_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')""",
    "q12_set_ops" ->
      """WITH a AS (SELECT DISTINCT l_partkey AS key FROM lineitem WHERE l_quantity > 45),
              b AS (SELECT DISTINCT p_partkey AS key FROM part WHERE p_size > 40)
         SELECT key, 'union' AS op FROM (SELECT key FROM a UNION SELECT key FROM b)
         UNION ALL
         SELECT key, 'intersect' AS op FROM (SELECT key FROM a INTERSECT SELECT key FROM b)
         UNION ALL
         SELECT key, 'except' AS op FROM (SELECT key FROM a EXCEPT SELECT key FROM b)""",
    "q13_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
         count(*) AS n_orders, CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    "q14_cube" ->
      """SELECT l_returnflag, l_linestatus,
         count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "q15_conditional_agg" ->
      """SELECT c_nationkey,
         CAST(round(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS total_f,
         CAST(round(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS total_o,
         CAST(round(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS total_p,
         count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_nationkey""",
    "q16_having" ->
      """SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty, count(*) AS n_items
         FROM lineitem GROUP BY l_suppkey HAVING round(sum(l_quantity), 2) > 15000""",
    "q17_avg_subquery" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly, count(*) AS n_small
         FROM lineitem JOIN (SELECT l_partkey AS ap_partkey,
                                    0.5 * avg(l_quantity) AS half_avg_qty
                             FROM lineitem GROUP BY l_partkey) t
         ON l_partkey = ap_partkey
         WHERE l_quantity < half_avg_qty""",
    "q18_in_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)""",
    "q19_stats" ->
      """SELECT l_returnflag, count(*) AS n_rows,
         min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
         round(avg(l_quantity), 4) AS avg_qty,
         round(stddev_samp(l_quantity), 4) AS sd_qty,
         round(var_samp(l_quantity), 4) AS var_qty
         FROM lineitem GROUP BY l_returnflag""")
}
