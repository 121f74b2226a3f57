package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** R-block: statistical analysis — correlation, independence testing and
  * distribution-drift detection. These are the "is the data changing /
  * related" operators a publication pipeline runs before releasing a new
  * snapshot (and a training pipeline runs to catch dataset drift between
  * crawls).
  *
  * Cross-engine determinism strategy (the hard part of statistics oracles):
  * every aggregate SUM runs over exact integers (cents / counts) widened to
  * decimal — summation order cannot change the result — and doubles appear
  * only in FINAL per-row scalar formulas computed from those exact sums.
  * IEEE 754 ops are deterministic given identical operands and operation
  * order, so writing the same formula on both engines yields bit-identical
  * doubles; `corr()`/`covar_pop()` built-ins are deliberately NOT used
  * (their internal double accumulation is summation-order-dependent and
  * would ulp-diverge between engines — and between two runs at different
  * partition counts).
  */
object Stats {

  /** q87: Pearson correlation + OLS slope of extendedprice (cents) against
    * quantity per return flag — "does price scale with quantity, and how
    * tightly" as a per-group statistic.
    *
    * Exactness: the five sufficient statistics (Σx, Σy, Σx², Σy², Σxy) are
    * decimal sums of bounded integer products — exact at any scale and any
    * partitioning (Spark widens decimal sums to precision+10; DuckDB sums
    * bigint into int128). The correlation itself is then one double formula
    * over a single row of exact decimals. One scan, one shuffle of 6
    * counters per flag; this is also the 100 TB shape (the sufficient
    * statistics are classic map-side-combining aggregates).
    */
  def q87Correlation(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        expr("CAST(l_quantity AS DECIMAL(10,0))").as("x"),
        expr("CAST(round(l_extendedprice * 100) AS DECIMAL(12,0))").as("y"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("l_returnflag"), col("n_items"),
        // exact integers: covN = n·Σxy − Σx·Σy, varxN = n·Σx² − (Σx)²,
        // varyN = n·Σy² − (Σy)² — then ONE double expression each engine
        // evaluates identically
        expr("""round(CAST(n_items * sxy - sx * sy AS DOUBLE) /
                      sqrt(CAST(n_items * sxx - sx * sx AS DOUBLE) *
                           CAST(n_items * syy - sy * sy AS DOUBLE)), 6)""")
          .as("pearson_r"),
        expr("""round(CAST(n_items * sxy - sx * sy AS DOUBLE) /
                      CAST(n_items * sxx - sx * sx AS DOUBLE), 6)""")
          .as("slope_cents_per_unit"))

  /** q89: chi-square independence test — is `event_type` independent of the
    * value band? Emits the full contingency diagnostics (observed, expected,
    * per-cell χ² contribution in millionths) plus the table-wide χ² total,
    * one row per cell.
    *
    * Shape: one scan → one |types|×|bands| cell aggregate; row/column/grand
    * totals are windows over that tiny frame (never a rescan). Expected
    * counts and χ² terms are per-row scalar doubles from exact integers
    * (deterministic, see block doc); the χ² TOTAL is a sum of integerized
    * millionth-terms, so even the total is summation-order-proof.
    */
  def q89ChiSquare(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(s, dir)
      .select(col("event_type"),
        // DIV truncates where DuckDB's // floors — identical only because
        // value ≥ 0 by data contract (q55 audits the domain); a signed
        // metric would need q86's sign-split division here
        expr("CAST(round(value * 100) AS BIGINT) DIV 10000").as("band"))
      .groupBy(col("event_type"), col("band"))
      .agg(count(lit(1)).as("n_obs"))
    val wRow = Window.partitionBy(col("event_type"))
    val wCol = Window.partitionBy(col("band"))
    val wAll = Window.partitionBy()
    cells
      .withColumn("row_n", sum(col("n_obs")).over(wRow))
      .withColumn("col_n", sum(col("n_obs")).over(wCol))
      .withColumn("total_n", sum(col("n_obs")).over(wAll))
      .withColumn("expected",
        expr("CAST(row_n * col_n AS DOUBLE) / CAST(total_n AS DOUBLE)"))
      .withColumn("term_micro", expr(
        """CAST(round((CAST(n_obs AS DOUBLE) - expected) *
                      (CAST(n_obs AS DOUBLE) - expected) / expected * 1000000)
             AS BIGINT)"""))
      .select(col("event_type"), col("band"), col("n_obs"),
        expr("round(expected, 4)").as("expected_r"), col("term_micro"),
        sum(col("term_micro")).over(wAll).as("chi2_micro_total"))
  }

  /** q91: Kolmogorov–Smirnov drift statistic per event type — the maximum
    * gap between the weekday and weekend empirical CDFs of `value`, in
    * basis points. The pipeline's "did this segment's distribution move"
    * alarm, here split on a calendar attribute; in production the two
    * populations would be this-crawl vs last-crawl.
    *
    * Fully integer-exact: with per-population totals t1, t2 and cumulative
    * counts c1, c2 at each observed value,
    * |F1−F2| = |c1·t2 − c2·t1| / (t1·t2), so the sup-statistic is
    * max(|c1·t2 − c2·t1|·10⁴ div (t1·t2)) — no doubles anywhere. (Products
    * stay in int64 up to ~10⁷ rows per (type, population); beyond that the
    * same expression runs in decimal.) The weekday flag is integer epoch-day
    * arithmetic ((d+4) mod 7 with 0=Sunday), not engine-specific dayofweek.
    *
    * Shape: one scan → (type, cents) cell aggregate (map-side combining) →
    * one window partition per type for the running CDFs → per-type max.
    */
  def q91KsDrift(s: SparkSession, dir: String): DataFrame = {
    val byValue = Tables.events(s, dir)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        expr("((unix_micros(ts) div 86400000000) + 4) % 7").as("dow7"))
      .groupBy(col("event_type"), col("cents"))
      .agg(
        sum(when(expr("dow7 IN (0, 6)"), 0L).otherwise(1L)).as("n_wd"),
        sum(when(expr("dow7 IN (0, 6)"), 1L).otherwise(0L)).as("n_we"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    byValue
      .withColumn("c1", sum(col("n_wd")).over(wCum))
      .withColumn("c2", sum(col("n_we")).over(wCum))
      .withColumn("t1", sum(col("n_wd")).over(wAll))
      .withColumn("t2", sum(col("n_we")).over(wAll))
      .groupBy(col("event_type"))
      .agg(
        max(col("t1")).as("n_weekday"),
        max(col("t2")).as("n_weekend"),
        max(expr("""CASE WHEN t1 = 0 OR t2 = 0 THEN NULL
                    ELSE abs(c1 * t2 - c2 * t1) * 10000 div (t1 * t2) END"""))
          .as("ks_bp"))
  }

  /** q95: trailing-window volume anomaly — per (event_type, day) event
    * counts z-scored against the preceding 7 calendar days (RANGE frame on
    * the integer day, so data gaps don't stretch the lookback the way a
    * ROWS frame would). The "did traffic spike/collapse" monitor of an
    * ingest pipeline.
    *
    * Determinism: the trailing Σx and Σx² are integer window sums;
    * z = (x·cnt − s) / sqrt(cnt·s2 − s²) is one scalar double from exact
    * integers (population σ; algebraically identical to (x−μ)/σ but with
    * no intermediate rounding). Windows with <3 prior days or zero
    * variance yield null — an alarm needs a baseline.
    *
    * Shape: one scan → (type, day) rollup → one |types|-partition window
    * over day-level rows (thousands of rows per type even at 100 TB —
    * day-granular frames never blow up with the corpus).
    */
  def q95VolumeAnomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-7, -1)
    daily
      .withColumn("cnt", count(col("n")).over(w))
      .withColumn("s", sum(col("n")).over(w))
      .withColumn("s2", sum(col("n") * col("n")).over(w))
      .withColumn("z", expr(
        """CASE WHEN cnt < 3 OR cnt * s2 - s * s <= 0 THEN NULL
           ELSE round(CAST(n * cnt - s AS DOUBLE) /
                      sqrt(CAST(cnt * s2 - s * s AS DOUBLE)), 4) END"""))
      .select(col("event_type"), col("day"), col("n"),
        col("cnt").as("n_baseline_days"), col("z"),
        expr("CASE WHEN z IS NOT NULL AND abs(z) > 2.0 THEN 1 ELSE 0 END")
          .as("is_anomaly"))
  }

  /** q99: covariance/correlation matrix — every pairwise population
    * covariance and Pearson r over four lineitem measures (quantity,
    * price cents, discount %, tax %) from ONE pass: the 15 sufficient
    * statistics (n, four Σx, ten Σx·y) aggregate exactly in decimal, and
    * each of the six emitted pairs is a scalar double formula over that
    * single row (q87's strategy generalized to the matrix the §9 plan
    * deferred). One scan, one shuffle of 15 counters total, then a
    * stack() over one row — the 100 TB cost is the scan.
    */
  /** q99's shared skeleton: the column names, the unordered pairs, and the
    * cov/corr formulas over the sufficient-statistic row are defined ONCE
    * and consumed by both the Spark plan and the generated oracle SQL —
    * the two sides can only drift in the engine-specific integer casts. */
  private val covNames = Seq("quantity", "price_cents", "discount_pct", "tax_pct")
  private val covPairs =
    for { i <- covNames.indices; j <- (i + 1) until covNames.length }
      yield (covNames(i), covNames(j))
  private def covFormula(a: String, b: String): String =
    s"""round(CAST(n * p_${a}_$b - s_$a * s_$b AS DOUBLE) /
              (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)"""
  private def corrFormula(a: String, b: String): String =
    s"""round(CAST(n * p_${a}_$b - s_$a * s_$b AS DOUBLE) /
              sqrt(CAST(n * p_${a}_$a - s_$a * s_$a AS DOUBLE) *
                   CAST(n * p_${b}_$b - s_$b * s_$b AS DOUBLE)), 6)"""

  def q99CovMatrix(s: SparkSession, dir: String): DataFrame = {
    // Exactness strategy (r19 opt): per-row work is pure BIGINT codegen —
    // the 10 pairwise products stay under 2⁶³ by the declared domain
    // bounds (quantity < 10⁴, price < $10⁶ ⇒ widest product price_cents²
    // < 10¹⁶), and the SUMS run on graft_money_sum's overflow-checked
    // 64-bit partials that widen to 128-bit only at actual overflow.
    // The former DECIMAL form was exact too, but its > 18-digit sum
    // buffers (DECIMAL(19..27,0)) left the compact-long path and paid a
    // BigDecimal add per row per product column — the r18-measured money
    // class tax, here ×10 columns (StageCensus: the whole query was one
    // 1.1 s aggregate stage). Outputs re-cast to the former sum types so
    // the shared cov/corr formula stage (and the DuckDB oracle, which
    // sums BIGINT into HUGEINT) is bit-identical. ANSI keeps the domain
    // loud: an out-of-range cast or a 64→128 partial overflow still
    // computes exactly, and the final down-cast would THROW only if a
    // corpus broke the declared 10¹²-row/10²⁷-sum envelope.
    // DOMAIN-ENFORCEMENT NOTE (r19 advice): the former DECIMAL(4/8,0)
    // casts ALSO rejected a single out-of-domain row loudly at ingestion
    // (price ≥ $10⁶ failed its cast); the BIGINT form accepts any int64,
    // so per-row domain rejection is gone and exactness relies on the
    // ANSI overflow checks asserted by CosineFusionSpec (Spark 4 default;
    // a non-ANSI session would wrap a >2⁶³ product silently). Re-adding a
    // checked per-row cast would re-pay the BigDecimal tax this rewrite
    // removed — the trade is deliberate and the spec pins ANSI stays on.
    val digits = Map(
      "quantity" -> 4, "price_cents" -> 8, "discount_pct" -> 4, "tax_pct" -> 4)
    val defs = Seq(
      "CAST(l_quantity AS BIGINT)",
      "CAST(round(l_extendedprice * 100) AS BIGINT)",
      "CAST(round(l_discount * 100) AS BIGINT)",
      "CAST(round(l_tax * 100) AS BIGINT)")
    val base = Tables.lineitem(s, dir)
      .select(covNames.zip(defs).map { case (n, e) => expr(e).as(n) }: _*)
    val prodPairs =
      for { i <- covNames.indices; j <- i until covNames.length }
        yield (covNames(i), covNames(j))
    val proj = base.select(covNames.map(col) ++ prodPairs.map { case (a, b) =>
      (col(a) * col(b)).as(s"x_${a}_$b") }: _*)
    val sums =
      Seq(count(lit(1)).as("n")) ++
        covNames.map(n => sum(col(n))
          .cast(s"decimal(${digits(n) + 10},0)").as(s"s_$n")) ++
        prodPairs.map { case (a, b) =>
          graft.functions.MoneySum.sum(col(s"x_${a}_$b"), 0)
            .cast(s"decimal(${digits(a) + digits(b) + 11},0)").as(s"p_${a}_$b")
        }
    val stackArgs = covPairs.map { case (a, b) =>
      s"'$a', '$b', ${covFormula(a, b)}, ${corrFormula(a, b)}"
    }.mkString(", ")
    proj.agg(sums.head, sums.tail: _*)
      .select(expr(
        s"stack(${covPairs.length}, $stackArgs) AS (col_a, col_b, cov, pearson_r)"))
  }

  /** The two-proportion z formula — one string, used verbatim by the Spark
    * plan and the oracle so the scalar double math cannot drift. The
    * degenerate pools (no conversions at all, or everyone converted) have
    * an undefined z (pooled variance 0) and yield NULL — under Spark 4's
    * default ANSI mode the unguarded division would THROW, not return
    * infinity. */
  private val abZFormula =
    """CASE WHEN n_a = 0 OR n_b = 0
              OR c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN NULL ELSE
         round((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
              sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 4)
       END"""

  /** q104: A/B experiment readout — users split deterministically by the
    * md5 coin of user_id (the engine-portable q68/q74 draw), per-variant
    * conversion on a non-saturating metric (the user's FIRST event is a
    * purchase — "any purchase ever" converts essentially every active
    * user, making p̂=1 and the z undefined), and the pooled two-proportion
    * z statistic: one scalar double over four exact integers (per the
    * block's determinism strategy), rates in integer basis points.
    *
    * Shape: one user_id exchange for the first-event window, then a
    * 1-row conditional aggregate.
    */
  def q104AbTest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("converted"))
      .withColumn("coin", TextAnalysis.md5Coin(col("user_id")))
      .agg(
        sum(when(col("coin") < 128, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("coin") < 128, col("converted")).otherwise(0L)).as("c_a"),
        sum(when(col("coin") >= 128, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("coin") >= 128, col("converted")).otherwise(0L)).as("c_b"))
      .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        // nullif: an empty variant (possible on a tiny or filtered user
        // population) yields NULL rates, not an ANSI DIVIDE_BY_ZERO throw
        expr("c_a * 10000 div nullif(n_a, 0)").as("conv_a_bp"),
        expr("c_b * 10000 div nullif(n_b, 0)").as("conv_b_bp"),
        expr(abZFormula).as("z"))
  }

  /** q105: revenue concentration (Gini coefficient) over per-customer
    * revenue — the inequality lens of a customer-analytics layer.
    * G = 2·Σ(rank·x) / (n·Σx) − (n+1)/n over revenue ranked ascending.
    *
    * The global rank is the scale trick again (q97/q103's decomposition,
    * here keyed on the VALUE): rank within an equi-depth revenue band
    * ([[Bands]] — sketch-quantile boundaries, balanced on any
    * distribution) + the broadcast count of all lower bands — the band is
    * a monotone function of the sort key, so band-then-key order IS the
    * global order and no single-partition window ever sees the customer
    * table.
    * Σ(rank·x) aggregates in decimal (exact at any scale); the Gini is
    * one final scalar double.
    */
  def q105Gini(s: SparkSession, dir: String): DataFrame = {
    // equi-depth bands from a quantile sketch (Bands): balanced window
    // partitions on any revenue distribution, where the former fixed
    // $10k widths would collapse a concentrated distribution into one
    // partition; ranks are boundary-independent, so the oracle hash
    // cannot move
    val pc = Bands.withEquiDepthBand(
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents")),
      "cents")
    val wBand = Window.partitionBy(col("band")).orderBy(col("cents"), col("o_custkey"))
    val counts = pc.groupBy(col("band")).agg(count(lit(1)).as("bn"))
      .withColumn("n_before", coalesce(
        sum(col("bn")).over(Window.orderBy(col("band"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("band"), col("n_before"))
    pc
      .withColumn("r_in_band", row_number().over(wBand))
      .join(broadcast(counts), "band")
      .withColumn("rnk", col("n_before") + col("r_in_band"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("cents")).as("t"),
        sum(expr("CAST(rnk AS DECIMAL(20,0)) * cents")).as("s"))
      .select(col("n").as("n_customers"), col("t").as("total_cents"),
        expr("""round(2.0 * CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
                      - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6)""").as("gini"))
  }

  /** q142: Population Stability Index — the industry-standard "has this
    * feature's distribution shifted" score between two populations, here
    * weekday vs weekend event values per type (in production: this-crawl
    * vs last-crawl, or serving vs training). Five fixed value bands,
    * add-one (Laplace) smoothing over the DENSIFIED band grid so empty
    * cells contribute identically in both engines, and
    * psi = Σ (p−q)·ln(p/q).
    *
    * Cross-engine determinism: ln() is the one non-IEEE-mandated function
    * in this file, so each band's term is rounded to 1e-4 PSI units and
    * the TOTAL is an exact BIGINT sum of those integers — engine
    * summation order cannot move the result, and a last-ulp ln()
    * divergence would have to land within 5e-9 of a rounding boundary to
    * flip a term.
    *
    * Shape: one scan → (type, band) cell agg (partial-combined) → a
    * |types|×5-row frame for everything after — the expensive part never
    * exceeds one exchange at any scale.
    */
  def q142PsiDrift(s: SparkSession, dir: String): DataFrame = {
    // clamp BOTH ends: without greatest(0, ...) a negative value would bin
    // to -1 and silently vanish in the 0..4 grid join below — a drift
    // monitor must never lose the out-of-domain rows it exists to notice
    val binned = Tables.events(s, dir)
      .select(col("event_type"),
        expr("least(greatest(CAST(round(value * 100) AS BIGINT) DIV 5000, 0), 4)").as("bin"),
        expr("((unix_micros(ts) div 86400000000) + 4) % 7").as("dow7"))
      .groupBy(col("event_type"), col("bin"))
      .agg(
        sum(when(expr("dow7 IN (0, 6)"), 0L).otherwise(1L)).as("n_wd"),
        sum(when(expr("dow7 IN (0, 6)"), 1L).otherwise(0L)).as("n_we"))
    // densify to the full (type × band 0..4) grid: smoothing must see
    // empty cells, and both engines must see the SAME cell set
    val grid = binned.select(col("event_type")).distinct()
      .select(col("event_type"),
        explode(expr("sequence(CAST(0 AS BIGINT), CAST(4 AS BIGINT))")).as("bin"))
    grid.join(binned, Seq("event_type", "bin"), "left")
      .na.fill(0L, Seq("n_wd", "n_we"))
      .withColumn("t_wd", sum(col("n_wd")).over(Window.partitionBy(col("event_type"))))
      .withColumn("t_we", sum(col("n_we")).over(Window.partitionBy(col("event_type"))))
      .withColumn("p", expr("CAST(n_wd + 1 AS DOUBLE) / CAST(t_wd + 5 AS DOUBLE)"))
      .withColumn("q", expr("CAST(n_we + 1 AS DOUBLE) / CAST(t_we + 5 AS DOUBLE)"))
      .withColumn("term_dbp", expr("CAST(round((p - q) * ln(p / q) * 10000) AS BIGINT)"))
      .groupBy(col("event_type"))
      .agg(
        max(col("t_wd")).as("n_weekday"),
        max(col("t_we")).as("n_weekend"),
        sum(col("term_dbp")).as("psi_dbp"))
  }

  /** The two arms of the rank test — code-owned, like q147's rule table. */
  private val RankArmA = "click"
  private val RankArmB = "purchase"

  /** Tie-corrected normal-approximation variance of U, one double formula
    * over the exact integer sufficient statistics (n1, n2, Σ(t³−t)) —
    * shared verbatim between the Spark plan and the DuckDB oracle. */
  private val mwuVarSql =
    """(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0) *
       ((CAST(n1 + n2 AS DOUBLE) + 1.0) -
        CAST(tsum AS DOUBLE) /
        (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1.0)))"""

  /** z from 2·U1 (kept doubled so it stays integral under tied ranks);
    * NULL when the tie-corrected variance degenerates (all values equal). */
  private val mwuZSql =
    s"""CASE WHEN $mwuVarSql > 0
          THEN round((CAST(u1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) /
                     (2.0 * sqrt($mwuVarSql)), 4) END"""

  /** Common-language effect size U1/(n1·n2) in basis points (the
    * probability a random A-value exceeds a random B-value, ties half). */
  private val mwuAucSql =
    """CAST(round(10000.0 * CAST(u1x2 AS DOUBLE) /
         (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) AS BIGINT)"""

  /** q171: Mann–Whitney U rank test — "do click and purchase event values
    * come from the same distribution", the non-parametric complement to
    * q104's parametric z-test (rank-based, so outliers and skew cannot
    * distort it). Midranks with tie correction; the reported z uses the
    * normal approximation (exact for these sample sizes to ~1e-3).
    *
    * Exactness: ranks never materialize per row. The value domain is
    * cents-integral, so grouping by cents yields per-value counts
    * (n1_v, n2_v) on a frame bounded by the VALUE DOMAIN, not the data
    * size; the midrank of the tie group at v is cum_before(v) +
    * (n_v+1)/2, kept doubled (2·R1 = Σ n1_v·(2·cum_before + n_v + 1)) so
    * every sufficient statistic — n1, n2, 2·R1, Σ(t³−t) — is an exact
    * integer (DECIMAL(38,0) / HUGEINT sums). z and the AUC effect size
    * are single double formulas over those integers, identical on both
    * engines.
    *
    * Shape: one scan → cents-domain agg (partial-combined) → the prefix
    * counts decompose over equi-depth bands exactly like q105 (balanced
    * window partitions + a broadcast band-offset frame — no global
    * single-partition sort at any scale) → one final 1-row rollup.
    */
  def q171RankTest(s: SparkSession, dir: String): DataFrame = {
    val byVal = Tables.events(s, dir)
      .filter(col("event_type").isin(RankArmA, RankArmB))
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        when(col("event_type") === RankArmA, 1L).otherwise(0L).as("is_a"))
      .groupBy(col("cents"))
      .agg(sum(col("is_a")).as("n1v"), sum(lit(1L) - col("is_a")).as("n2v"))
      .withColumn("nv", col("n1v") + col("n2v"))
      // value-domain-bounded; localCheckpoint so the band-boundary agg,
      // the offsets rollup and the main pass share ONE event scan
      .localCheckpoint()
    mwuSummary(byVal, "cents")
  }

  /** The banded-midrank Mann–Whitney machinery, factored so every rank
    * test in the library (q171's two-arm distribution test, q233's
    * score-predicts-dup AUC audit) runs ONE definition. `byVal` must be
    * the per-value frame (key, n1v, n2v, nv) — value-domain-bounded and
    * already checkpointed by the caller (the band-boundary sketch, the
    * offsets rollup and the main pass each consume it). Returns the
    * single-row (n1, n2, z_score, auc_bp) summary; the exactness and
    * scale arguments are q171's Scaladoc.
    */
  private[operators] def mwuSummary(byVal: DataFrame, key: String): DataFrame = {
    val banded = Bands.withEquiDepthBand(byVal, key)
    val offsets = banded.groupBy(col("band")).agg(sum(col("nv")).as("bn"))
      .withColumn("n_before", coalesce(
        sum(col("bn")).over(Window.orderBy(col("band"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("band"), col("n_before"))
    banded
      .withColumn("cum_in_band", coalesce(
        sum(col("nv")).over(Window.partitionBy(col("band")).orderBy(col(key))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(offsets), "band")
      .withColumn("cum_before", col("n_before") + col("cum_in_band"))
      .agg(
        sum(col("n1v")).as("n1"), sum(col("n2v")).as("n2"),
        sum(expr("CAST(n1v AS DECIMAL(38,0)) * (2 * cum_before + nv + 1)")).as("r1x2"),
        sum(expr("CAST(nv AS DECIMAL(38,0)) * nv * nv - nv")).as("tsum"))
      .withColumn("u1x2", expr("r1x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)"))
      .select(col("n1"), col("n2"),
        expr(mwuZSql).as("z_score"), expr(mwuAucSql).as("auc_bp"))
  }

  /** The oracle-side twin of [[mwuSummary]]: given a CTE body `e(cents,
    * is_a)` (one row per observation), emit the full DuckDB statement
    * computing (n1, n2, z_score, auc_bp) with the SAME shared formula
    * fragments the Spark plan uses. Oracle-local: HUGEINT sums and one
    * global-order window (Spark decomposes it over Bands — midranks are
    * band-boundary-independent, so the results are identical).
    */
  private[operators] def mwuOracleFrom(eCte: String): String =
    s"""WITH e AS ($eCte),
          v AS (
            SELECT cents,
                   CAST(sum(is_a) AS BIGINT) AS n1v,
                   CAST(sum(1 - is_a) AS BIGINT) AS n2v
            FROM e GROUP BY 1),
          w AS (
            SELECT *, n1v + n2v AS nv,
                   coalesce(sum(n1v + n2v) OVER (ORDER BY cents
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
            FROM v),
          st AS (
            SELECT CAST(sum(n1v) AS BIGINT) AS n1, CAST(sum(n2v) AS BIGINT) AS n2,
                   sum(CAST(n1v AS HUGEINT) * (2 * cum_before + nv + 1)) AS r1x2,
                   sum(CAST(nv AS HUGEINT) * nv * nv - nv) AS tsum
            FROM w),
          u AS (SELECT *, r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS u1x2 FROM st)
          SELECT n1, n2, $mwuZSql AS z_score, $mwuAucSql AS auc_bp FROM u"""

  /** q172: CUSUM change-point detection on the daily event volume — "did
    * the level of this feed shift, and when", the offline twin of s09's
    * streaming drift monitor. Page's classic cumulative-sum statistic
    * against the full-window mean; the flagged day(s) maximize |CUSUM|.
    *
    * Exactness: the deviation is scaled by the day count — cusum_d =
    * Σ_{i≤d}(D·n_i − T) — so mean-centering never leaves integers
    * (bounded by D·T ≲ 4e15 at 100 TB: BIGINT-safe), and the argmax
    * comparison is integer equality.
    *
    * Shape: one scan → daily agg, then everything runs on the day frame
    * (calendar-bounded: ~4k rows even at a decade of 100 TB feeds). The
    * day frame is localCheckpointed once for its three consumers
    * (totals, cusum, max) so the event scan runs exactly once; the
    * unpartitioned day-order window is bounded by the same calendar
    * domain.
    */
  def q172Cusum(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val tot = daily.agg(count(lit(1)).as("n_days"), sum(col("n")).as("n_total"))
    val wc = daily.crossJoin(broadcast(tot))
      .withColumn("cusum", sum(expr("n_days * n - n_total"))
        .over(Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint() // consumed twice: per-day rows + the global max
    val mx = wc.agg(max(abs(col("cusum"))).as("max_abs"))
    wc.crossJoin(broadcast(mx))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n").as("n_events"),
        col("cusum").as("cusum_scaled"),
        (abs(col("cusum")) === col("max_abs")).as("is_changepoint"))
  }

  /** q231: Mann–Kendall TREND test on daily event volumes per event
    * type — "is this feed monotonically drifting", the non-parametric
    * complement of q172's CUSUM (which detects a LEVEL SHIFT and its
    * day; a slow steady drift never produces a sharp CUSUM corner but
    * accumulates sign agreements here). S = Σ_{i<j} sign(n_j − n_i) over
    * day-ordered daily counts; the tie-corrected variance is kept as the
    * exact INTEGER var18 = n(n−1)(2n+5) − Σ t(t−1)(2t+5) (= 18·Var(S)),
    * so S and var18 are engine-exact and only the final z =
    * (S − sign S)/√(var18/18) pays one double + round (the q142/q173
    * rounded-term rule). Verdict at the classic two-sided 5% bar
    * (|z| ≥ 1.96).
    *
    * Shape: ONE event scan folds to the (type, day) frame
    * (calendar-bounded — ~4k rows/type at a decade, the q172 argument);
    * the pair "join" runs per type on that tiny frame (days² pairs of
    * integers, never event-scale), ties fold by VALUE. The daily frame
    * is localCheckpointed for its two consumers.
    */
  def q231TrendTest(s: SparkSession, dir: String): DataFrame =
    trendTestOf(Tables.events(s, dir))

  /** q231 on ANY (event_type, ts) frame — spec'd on planted monotone /
    * flat series beside the oracled corpus run. */
  private[graft] def trendTestOf(ev: DataFrame): DataFrame =
    trendFromDaily(ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")))

  /** The Mann–Kendall estimator itself, off an already-built
    * (event_type, day, n) daily frame — `day` may be DATE (the batch
    * path) or epoch-day BIGINT (s28's maintained table): only its ORDER
    * enters S. One definition serves q231 and the streaming monitor.
    */
  private[graft] def trendFromDaily(daily0: DataFrame): DataFrame = {
    val daily = daily0
      .localCheckpoint() // three consumers: both pair sides + tie groups
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.day") < col("b.day"))
      .groupBy(col("a.event_type").as("event_type"))
      .agg(sum(expr("CAST(sign(b.n - a.n) AS BIGINT)")).as("s"))
    val ties = daily.groupBy(col("event_type"), col("n"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(sum(col("t")).as("n_days"),
        sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie18"))
    // ties covers EVERY type (one row per type regardless of day count);
    // pairs has no row for a type with a single observed day — left-join
    // with S coalesced to 0, or a newly-onboarded one-day feed would
    // silently vanish from the trend report instead of verdicting "none"
    ties.join(pairs, Seq("event_type"), "left")
      .withColumn("s", coalesce(col("s"), lit(0L)))
      .withColumn("var18",
        expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie18"))
      .withColumn("z_x1000", expr(
        """CASE WHEN s = 0 OR var18 <= 0 THEN CAST(0 AS BIGINT)
           ELSE CAST(round((s - CAST(sign(s) AS BIGINT))
                / sqrt(CAST(var18 AS DOUBLE) / 18.0) * 1000) AS BIGINT) END"""))
      .select(col("event_type"), col("n_days"), col("s"), col("var18"),
        col("z_x1000"),
        when(col("z_x1000") >= 1960L, "increasing")
          .when(col("z_x1000") <= -1960L, "decreasing")
          .otherwise("none").as("trend"))
  }

  /** q234: autocorrelation function (ACF) of the global daily event
    * volume at lags 1..14 — "does today's volume echo last week's", the
    * periodicity probe that tells q177/q182 WHICH seasonal lag to model
    * (a strong lag-7 with a weak lag-1 says weekly cadence; all-lags-high
    * says trend, and q231 should fire too). Pairing is gap-honest: day t
    * pairs with t+k only if BOTH days exist (a missing day contributes
    * no fabricated zero), while the mean/denominator use the full
    * observed series — the standard ACF estimator restricted to observed
    * pairs.
    *
    * Exactness: deviations are mean-centered WITHOUT leaving integers by
    * scaling through the day count — dev_d = D·n_d − T (q172's trick) —
    * so num_k = Σ dev_t·dev_{t+k} and den = Σ dev² are exact
    * DECIMAL(38,0)/HUGEINT integers (dev² ~ (D·n)² overflows BIGINT at
    * ~1e5 events/day; the q170/q171 widening rule), and acf_bp is ONE
    * round(double/double) over identical operands. The common D² factor
    * cancels in the ratio, so the scaling is exact-in-the-reals too.
    *
    * Shape: one scan → daily agg (calendar-bounded); the 14× lag explode,
    * the self-join on day+k and the denominator rollup all run on that
    * tiny frame (dev is localCheckpointed for its three consumers); the
    * 1..14 grid left-join guarantees every lag rows even when no pair
    * exists (n_pairs = 0, acf NULL — honest, not absent).
    */
  def q234Acf(s: SparkSession, dir: String): DataFrame =
    acfOf(s, Tables.events(s, dir))

  /** q234 on ANY (ts) frame — spec'd on a planted pure-period-7 series
    * (lag-7 echo, sign-alternating short lags) beside the oracled
    * corpus run. */
  private[graft] def acfOf(s: SparkSession, ev: DataFrame): DataFrame = {
    val daily = ev
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // two consumers: the total rollup + dev
    val tot = daily.agg(count(lit(1)).as("d"), sum(col("n")).as("t"))
    val dev = daily.crossJoin(broadcast(tot))
      .select(col("day"),
        expr("CAST(d AS DECIMAL(38,0)) * n - t").as("dev"))
      .localCheckpoint() // three consumers: den + both pair sides
    val den = dev.agg(sum(expr("dev * dev")).as("den"))
    val lags = s.range(1, 15).select(col("id").as("lag"))
    val pairs = dev.as("a")
      .crossJoin(lags)
      .join(dev.as("b"), col("b.day") === col("a.day") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("a.dev * b.dev")).as("num"))
    lags.join(pairs, Seq("lag"), "left")
      .withColumn("n_pairs", coalesce(col("n_pairs"), lit(0L)))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        expr("""CASE WHEN n_pairs > 0 AND den > 0
                     THEN CAST(round(10000.0 * CAST(num AS DOUBLE) /
                          CAST(den AS DOUBLE)) AS BIGINT) END""").as("acf_bp"))
  }

  /** q235: Theil–Sen trend SLOPE per event type — the magnitude next to
    * q231's direction verdict (Mann–Kendall says "this feed is
    * drifting"; this says "by N events/day"): the median of all pairwise
    * slopes (n_j − n_i)/(d_j − d_i) over day-ordered daily counts, the
    * classic robust estimator (breakdown point ~29% — a month of outage
    * days cannot swing it, where OLS would).
    *
    * Exactness: every slope is ONE double division of two exact BIGINTs
    * — identical multisets on both engines — and the median is the exact
    * interpolated `percentile(0.5)` ≡ `quantile_cont(0.5)` (the
    * q73/q117 parity rule), reported ×1000 rounded. Single-day types
    * left-join in with n_pairs = 0 and a NULL slope (q231's lesson: a
    * newly-onboarded feed must row, not vanish).
    *
    * Shape: one scan folds to the (type, day) frame (calendar-bounded);
    * the pair join and the per-type percentile run per type on days²
    * pairs of integers — never event-scale (q231's argument). The daily
    * frame is localCheckpointed for its two consumers.
    */
  def q235TheilSen(s: SparkSession, dir: String): DataFrame =
    theilSenOf(Tables.events(s, dir))

  /** q235 on ANY (event_type, ts) frame — spec'd on planted exact-linear
    * / outlier-contaminated / one-day series beside the oracled corpus
    * run. */
  private[graft] def theilSenOf(ev: DataFrame): DataFrame =
    slopeFromDaily(ev
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n")))

  /** The Theil–Sen estimator off an already-built (event_type, day, n)
    * daily frame — `day` must be NUMERIC (epoch day): the slope divides
    * by the day delta. One definition serves q235 and s28.
    */
  private[graft] def slopeFromDaily(daily0: DataFrame): DataFrame = {
    val daily = daily0
      .localCheckpoint() // three consumers: both pair sides + type sizes
    val med = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.day") < col("b.day"))
      .select(col("a.event_type").as("event_type"),
        expr("CAST(b.n - a.n AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)").as("slope"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("CAST(round(percentile(slope, 0.5D) * 1000) AS BIGINT)").as("slope_x1000"))
    daily.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
      .join(med, Seq("event_type"), "left")
      .withColumn("n_pairs", coalesce(col("n_pairs"), lit(0L)))
      .select(col("event_type"), col("n_days"), col("n_pairs"), col("slope_x1000"))
  }

  /** q301: CHANGEPOINT localization per event type — binary segmentation
    * over the day-ordered daily counts: the split maximizing the
    * between-segment sum of squares. The drift family's missing axis:
    * q231 says "this feed trends", q172's CUSUM says "the level shifted
    * somewhere", this names the DAY the new regime starts (`split_day` =
    * first day of the right segment) and prices the break as the share
    * of total variance it explains (`r2_bp` — the two-segment R², 10000
    * = the split explains everything). Verdict `shift` at r2_bp ≥ 2500
    * with ≥ 8 observed days (a fixed bar like q231's 1.96: a quarter of
    * the variance in one break is an operational regime change, not
    * noise).
    *
    * Exactness: with prefix sums S_L and sizes n_L over OBSERVED days
    * (gap-honest — q234's rule), the between-SS at a split is
    * A²/(n_L·n_R·n) with A = n_R·S_L − n_L·S_R, and the total SS is
    * (n·Q − S²)/n with Q = Σ n_d² — so the argmax needs only
    * A²/(n_L·n_R), ONE double division of exact DECIMAL(38,0)/HUGEINT
    * integers per split (A ≤ days·events ~ 4e15 at 1e12 events, A² ~
    * 1.6e31 — the q170/q171 widening rule; BIGINT would overflow), and
    * ties break to the EARLIEST split day on both engines. r2_bp =
    * A²/(n_L·n_R·(nQ − S²)) and the segment means pay one rounded double
    * each (the q142 rounded-term rule). An all-equal series has total
    * SS 0 → NULL r2 → `none`; a single-day feed has no split and rows
    * with NULL split columns (q231's one-day-feed lesson).
    *
    * Shape: ONE event scan folds to the (type, day) frame
    * (calendar-bounded — q231's argument); prefix sums, the split scan
    * and the argmax are windows over that tiny frame partitioned by
    * type (never a global single-partition window). One definition
    * serves the batch query and s28's maintained daily table
    * ([[changepointFromDaily]] — the FIFTH estimator off one table).
    */
  def q301Changepoint(s: SparkSession, dir: String): DataFrame =
    changepointOf(Tables.events(s, dir))

  /** q301 on ANY (event_type, ts) frame — spec'd on planted step / flat
    * / one-day series beside the oracled corpus run. */
  private[graft] def changepointOf(ev: DataFrame): DataFrame =
    changepointFromDaily(ev
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n")))

  /** The binary-segmentation estimator off an already-built
    * (event_type, day, n) daily frame (epoch day) — one definition
    * serves q301 and s28's maintained table. */
  private[graft] def changepointFromDaily(daily: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("event_type"))
    val scored = daily
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("s_l", sum(col("n")).over(wOrd))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("s", sum(col("n")).over(wAll))
      .withColumn("q", sum(expr("CAST(n AS DECIMAL(38,0)) * n")).over(wAll))
      .withColumn("split_day", lead(col("day"), 1).over(wOrd))
      .localCheckpoint() // two consumers: the split scan + the type spine
    val best = scored.filter(col("i") < col("n_days"))
      .withColumn("n_l", col("i"))
      .withColumn("n_r", col("n_days") - col("i"))
      .withColumn("s_r", col("s") - col("s_l"))
      .withColumn("a", expr(
        "CAST(n_r AS DECIMAL(38,0)) * s_l - CAST(n_l AS DECIMAL(38,0)) * s_r"))
      .withColumn("a2", expr("a * a"))
      .withColumn("score", expr(
        "CAST(a2 AS DOUBLE) / CAST(CAST(n_l AS DECIMAL(38,0)) * n_r AS DOUBLE)"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("score").desc, col("split_day").asc)))
      .filter(col("rk") === 1)
      .withColumn("sst", expr(
        "CAST(n_days AS DECIMAL(38,0)) * q - CAST(s AS DECIMAL(38,0)) * s"))
      .select(col("event_type"), col("split_day"), col("n_l").as("left_days"),
        expr("CAST(round(100.0 * CAST(s_l AS DOUBLE) / CAST(n_l AS DOUBLE)) AS BIGINT)")
          .as("left_mean_x100"),
        expr("CAST(round(100.0 * CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE)) AS BIGINT)")
          .as("right_mean_x100"),
        expr("""CASE WHEN sst > 0 THEN
                  CAST(round(10000.0 * CAST(a2 AS DOUBLE) /
                    CAST(CAST(n_l AS DECIMAL(38,0)) * n_r * sst AS DOUBLE)) AS BIGINT)
                END""").as("r2_bp"))
    scored.filter(col("i") === 1)
      .select(col("event_type"), col("n_days"))
      .join(best, Seq("event_type"), "left")
      .withColumn("verdict",
        when(coalesce(col("r2_bp"), lit(0L)) >= 2500L && col("n_days") >= 8L,
          "shift").otherwise("none"))
  }

  /** q307's fixed segment domain (TPC-H's five market segments) — the
    * χ² below is ONE literal 5-term fixed-order expression generated
    * from this list, identically on both engines (the q245 rule: a
    * per-group divide inside SUM() accumulates engine-dependent). */
  private val MixSegments = Seq(
    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  // CLOSED-DOMAIN contract, enforced LOUD: the fixed-order device
  // requires the literal list to cover the segment domain — a row
  // outside it would otherwise be silently excluded from both the month
  // totals and the pooled mix, a wrong answer with no symptom at
  // production scale where no spec runs. segmentMixDriftOf therefore
  // carries a `raise_error` filter (the q69 idiom: filter-anchored so
  // pruning can never elide it; it runs on the post-agg |months|×|segs|
  // frame, so its cost is nil) that fails the query on any unknown
  // segment. A production schema with an open domain must regenerate
  // the literal list from the dimension first (the q44
  // explicit-pivot-values rule) — and learns that from an error, not a
  // quietly wrong χ².

  /** (O·N − T·C) for one segment — the exact cross-multiplied deviation
    * of the month cell from its pooled expectation, ~2.5e21 at 1e12
    * orders (the q170/q171 widening rule). `dec` is DECIMAL(38,0) on
    * Spark, HUGEINT on DuckDB; everything else is one shared text. */
  private def mixNum(seg: String, dec: String): String =
    s"(CAST(o_$seg AS $dec) * nn - CAST(t AS $dec) * c_$seg)"

  private def mixTerm(seg: String, dec: String): String =
    s"""CASE WHEN c_$seg = 0 THEN 0.0 ELSE
        CAST(${mixNum(seg, dec)} AS DOUBLE) * CAST(${mixNum(seg, dec)} AS DOUBLE)
        / CAST(CAST(nn AS $dec) * t * c_$seg AS DOUBLE) END"""

  private[graft] def mixChi2Sql(dec: String): String =
    s"CAST(round(1000 * (${MixSegments.map(mixTerm(_, dec)).mkString(" + ")})) AS BIGINT)"

  /** The segment with the LARGEST positive deviation — exact
    * DECIMAL/HUGEINT compares, first-wins ties in the fixed literal
    * order. */
  private[graft] def mixOverSql(dec: String): String =
    MixSegments.init.map { s0 =>
      val cond = MixSegments.filter(_ != s0)
        .map(o => s"${mixNum(s0, dec)} >= ${mixNum(o, dec)}").mkString(" AND ")
      s"WHEN $cond THEN '$s0'"
    }.mkString("CASE ", " ", s" ELSE '${MixSegments.last}' END")

  /** q307: customer-MIX drift — per order month, Pearson's χ² of the
    * month's segment order mix against the pooled corpus mix, with the
    * largest-excess segment named: the time-resolved "is our customer
    * base shifting" monitor beside q130 (which DECOMPOSES revenue
    * growth into mix vs rate, but never asks if the mix move is
    * SIGNIFICANT) and q89 (one global contingency, no time axis). A
    * `shifted` month at the df=4 5% bar (χ² ≥ 9.488) is a real
    * composition change; `over_segment` says who drove it.
    *
    * Exactness: the χ² algebra is cleared of per-cell divides — each
    * term is (O·N − T·C)²/(N·T·C) with numerator and radicand-free
    * denominator exact DECIMAL(38,0)/HUGEINT integers, ONE double
    * division per term, and the five terms sum in ONE literal
    * fixed-order expression on both engines (the q245 device; a
    * corpus-absent segment contributes 0 — its month cells are
    * necessarily 0 too). The excess pick compares the exact integer
    * deviations, never the rounded terms.
    *
    * Shape: one orders⋈customer key join (the q03 family,
    * bucketing-co-locatable) folds straight to the |months|×5 pivoted
    * frame; the pooled totals are ONE broadcast 1-row crossJoin off the
    * checkpointed frame (the q295 rule).
    */
  def q307SegmentMixDrift(s: SparkSession, dir: String): DataFrame =
    segmentMixDriftOf(Tables.orders(s, dir), Tables.customer(s, dir))

  /** q307 on ANY (o_custkey, o_orderdate) × (c_custkey, c_mktsegment)
    * frames — spec'd on a planted uniform-then-shifted month beside the
    * oracled corpus run. */
  private[graft] def segmentMixDriftOf(orders: DataFrame, customer: DataFrame): DataFrame = {
    val withSeg = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      // loud closed-domain guard (see the MixSegments contract): fires on
      // the post-agg bounded frame, BEFORE the pivot can drop the evidence
      .filter(
        when(col("c_mktsegment").isin(MixSegments: _*), lit(true))
          .otherwise(raise_error(concat(
            lit("q307_segment_mix_drift: market segment '"),
            col("c_mktsegment"),
            lit("' is outside the closed 5-segment domain the fixed-order " +
              "literal χ² assumes — regenerate MixSegments from the " +
              "dimension (the q44 explicit-pivot-values rule) or the " +
              "segment would be silently excluded from the month totals " +
              "and the pooled mix")))))
    val wide = withSeg.groupBy(col("month"))
      .agg(sum(when(col("c_mktsegment") === MixSegments.head, col("n"))
          .otherwise(0L)).as(s"o_${MixSegments.head}"),
        MixSegments.tail.map(seg =>
          sum(when(col("c_mktsegment") === seg, col("n"))
            .otherwise(0L)).as(s"o_$seg")): _*)
      .withColumn("t", expr(MixSegments.map(s0 => s"o_$s0").mkString(" + ")))
      .localCheckpoint() // two consumers: pooled totals + the report
    val tot = wide.agg(sum(col("t")).as("nn"),
      MixSegments.map(seg => sum(col(s"o_$seg")).as(s"c_$seg")): _*)
    val dec = "DECIMAL(38,0)"
    wide.crossJoin(broadcast(tot))
      .withColumn("chi2_x1000", expr(mixChi2Sql(dec)))
      .select(col("month"), col("t").as("n_orders"), col("chi2_x1000"),
        expr(mixOverSql(dec)).as("over_segment"),
        when(col("chi2_x1000") >= 9488L, "shifted").otherwise("stable")
          .as("verdict"))
  }

  /** q245: Kruskal–Wallis day-of-week test per event type — does the
    * weekday MATTER for this feed's daily volume? The significance test
    * completing the seasonal family: q238 measures HOW MUCH of the
    * variance the dow-7 seasonal explains, this says whether the effect
    * clears chance at all (rank-based, so a single spike day cannot
    * fake a weekly pattern the way it can inflate q238's variance
    * ratio). Daily counts are the samples, the 7 weekdays the groups;
    * tie-corrected H ×1000 with the classic χ²(6) 5% bar (12.592).
    *
    * Exactness: q171's value-domain midrank discipline per type — per
    * (type, count-value): tie size and per-dow occupancy fold on the
    * calendar-bounded frame, doubled rank sums 2·R_g = Σ n_gv·(2·cum +
    * t + 1) stay exact integers, and H/tie-correction is ONE double
    * formula over six exact integer statistics. Degenerate types (all
    * days equal → zero tie-corrected variance, or a single day) emit
    * NULL h and verdict 'none'.
    *
    * Shape: one scan → (type, day) agg; every later frame is bounded by
    * |types| × the count-value domain. The (d+4) mod 7 weekday is the
    * engine-portable q112/q181 form.
    */
  def q245KruskalDow(s: SparkSession, dir: String): DataFrame =
    kruskalDowOf(Tables.events(s, dir))

  /** q245 on ANY (event_type, ts) frame — spec'd on planted
    * strong-weekly / flat / constant series beside the oracled corpus
    * run. */
  private[graft] def kruskalDowOf(ev: DataFrame): DataFrame =
    kruskalFromDaily(ev
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n")))

  /** q245 off an already-built (event_type, day, n) daily frame (epoch
    * day) — one definition serves the batch query and s30's maintained
    * table (the slopeFromDaily/gapsFromDaily pattern). */
  private[graft] def kruskalFromDaily(daily: DataFrame): DataFrame = {
    val cells = daily
      .select(col("event_type"), col("n"), expr("((day + 4) % 7)").as("dow"))
      .groupBy(col("event_type"), col("n"), col("dow"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // two consumers: the tie fold + the group fold
    val ties = cells.groupBy(col("event_type"), col("n"))
      .agg(sum(col("cnt")).as("t"))
      .withColumn("cum_before", coalesce(
        sum(col("t")).over(Window.partitionBy(col("event_type")).orderBy(col("n"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // the 7 groups pivot to FIXED columns so the Σ R_g²/n_g double sum is
    // one literal 7-term expression in one textual order on both engines
    // (the q120 fixed-order rule — a per-group divide inside a SUM() would
    // accumulate in engine-dependent order); rank sums fit BIGINT to
    // ~2e6 observed days per type (2·N²)
    val groups = cells.join(ties.select(col("event_type"), col("n"),
        col("t"), col("cum_before")), Seq("event_type", "n"))
      .groupBy(col("event_type"), col("dow"))
      .agg(sum(col("cnt")).as("n_g"),
        sum(expr("cnt * (2 * cum_before + t + 1)")).as("r2"))
    val pivotCols = (0 until 7).flatMap(d => Seq(
      coalesce(sum(when(col("dow") === d, col("n_g"))), lit(0L)).as(s"n_$d"),
      coalesce(sum(when(col("dow") === d, col("r2"))), lit(0L)).as(s"r2_$d")))
    val perTypeAggs =
      sum(col("n_g")).as("n_days") +: count(lit(1)).as("n_groups") +: pivotCols
    val perType = groups.groupBy(col("event_type"))
      .agg(perTypeAggs.head, perTypeAggs.tail: _*)
    val tieSum = ties.groupBy(col("event_type"))
      .agg(sum(expr("t * (t * t - 1)")).as("tsum"))
    perType.join(tieSum, Seq("event_type"))
      .withColumn("h_x1000", expr(
        s"""CASE WHEN n_days > 1
                  AND CAST(tsum AS DOUBLE) <
                      CAST(n_days AS DOUBLE) * n_days * n_days - n_days
                 THEN CAST(round(1000.0 *
                   ((12.0 / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) + 1.0))
                     * ($kwRankTermsSql)
                     - 3.0 * (CAST(n_days AS DOUBLE) + 1.0))
                    / (1.0 - CAST(tsum AS DOUBLE) /
                       (CAST(n_days AS DOUBLE) * n_days * n_days - n_days))))
                   AS BIGINT) END"""))
      .select(col("event_type"), col("n_days"), col("n_groups"),
        col("h_x1000"),
        when(col("h_x1000").isNotNull && col("h_x1000") >= expr(kwCritSql),
          "weekly").otherwise("none").as("dow_effect"))
  }

  /** The Σ R_g²/n_g term as one literal 7-summand expression over the
    * pivoted (n_d, r2_d) columns — one text on both engines. */
  private val kwRankTermsSql: String = (0 until 7).map(d =>
    s"""CASE WHEN n_$d > 0 THEN CAST(r2_$d AS DOUBLE) * CAST(r2_$d AS DOUBLE)
          / (4.0 * CAST(n_$d AS DOUBLE)) ELSE 0.0 END""").mkString(" + ")

  /** q258: WEEKDAY-PROFILE table per event type — the detail behind
    * q245's verdict: q245 says whether the weekday matters at all, this
    * says WHICH weekday drives it. Per (type, dow 0=Sunday): days
    * observed, event mass, mean daily count, share of the type's mass,
    * and the deviation from a flat 1/7 week in bp (q218's exact
    * floor-div rendering — `n·7·10000 DIV total − 10000`, exact for any
    * divisor, the q239 truncation trap avoided). Unobserved weekdays row
    * with zeros and a NULL mean (the 7-cell grid left-join; q231's
    * lesson).
    *
    * Shape: everything after ONE calendar-bounded daily agg (the
    * q231/q235/q237/q245 argument); the grid and the per-type totals run
    * on the |types|×7 frame.
    */
  def q258DowProfile(s: SparkSession, dir: String): DataFrame =
    dowProfileFromDaily(Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n")))

  /** q258 off an already-built (event_type, day, n) daily frame — one
    * definition serves the batch query and s28's maintained table. */
  private[graft] def dowProfileFromDaily(daily: DataFrame): DataFrame = {
    val cells = daily
      .select(col("event_type"), col("n"), expr("((day + 4) % 7)").as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("n_events"))
    val types = cells.select(col("event_type")).distinct()
    val grid = types.crossJoin(
      cells.sparkSession.range(7).select(col("id").as("dow")))
    grid.join(cells, Seq("event_type", "dow"), "left")
      .na.fill(0L, Seq("n_days", "n_events"))
      .withColumn("tt", sum(col("n_events")).over(
        Window.partitionBy(col("event_type"))))
      .select(col("event_type"), col("dow"), col("n_days"), col("n_events"),
        expr("CASE WHEN n_days > 0 THEN n_events DIV n_days END")
          .as("mean_daily"),
        expr("(n_events * 10000) DIV tt").as("share_bp"),
        expr("(n_events * 7 * 10000) DIV tt - 10000").as("dev_bp"))
  }

  /** q270: ARRIVAL-DISPERSION index — the Poisson overdispersion test on
    * hourly arrivals per event type: D = var/mean of per-hour counts over
    * the full calendar span (zero hours included — they cost nothing to
    * include because only the hour COUNT enters, the sums are over active
    * hours). A memoryless feed has D ≈ 1; campaign bursts, bot cadence
    * (q165's per-user view, here the feed-level one) and ingest stalls all
    * push D ≫ 1, and a monitor alerting on q95's z-scores should know
    * whether the feed is Poisson-calm or structurally bursty BEFORE
    * trusting a threshold. Published as integer dispersion_x100 =
    * 100·(H·Σc² − (Σc)²) DIV (H·Σc) — exact on both engines (the variance
    * numerator is Cauchy–Schwarz-non-negative, so truncation = floor) —
    * with `overdispersed` at D > 2× Poisson.
    *
    * Scale shape: one map-side-combined (type, hour) fold (|types|×|hours|
    * rows out of the scan), a |types|-bounded second fold, and a broadcast
    * 1-row span frame — never an event-scale shuffle or window.
    */
  def q270ArrivalDispersion(s: SparkSession, dir: String): DataFrame =
    dispersionFromHourly(Tables.events(s, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c")))

  /** q270 off an already-built (event_type, h, c) hourly frame — one
    * definition serves the batch query and s33's maintained table. The
    * calendar span derives from the hour domain itself (min/max present
    * hour ≡ the truncated raw-event extremes), so the maintained table is
    * self-contained state. */
  private[graft] def dispersionFromHourly(hourly: DataFrame): DataFrame = {
    val span = hourly.agg(
      expr("(unix_timestamp(max(h)) - unix_timestamp(min(h))) DIV 3600 + 1")
        .as("n_hours"))
    hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("active_hours"), sum(col("c")).as("n_events"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("s2"))
      .crossJoin(broadcast(span))
      .select(col("event_type"), col("n_hours"), col("active_hours"),
        col("n_events"),
        expr("""CAST((CAST(n_hours AS DECIMAL(38,0)) * s2
                      - CAST(n_events AS DECIMAL(38,0)) * n_events) * 100
                     DIV (CAST(n_hours AS DECIMAL(38,0)) * greatest(n_events, 1))
                     AS BIGINT)""").as("dispersion_x100"))
      .withColumn("overdispersed", col("dispersion_x100") > 200)
  }

  /** q283: value CONCENTRATION — the heavy-tail audit per event type: how
    * much of the value mass sits in the top 1% and top 10% of events by
    * value. Revenue/value pipelines behave completely differently when
    * 80% of mass is 1% of events (fraud screens, sampling plans, q105's
    * Gini is the single-number cousin — this is the actionable two-point
    * read). Exact integers end to end: cents quantization, k = ceil(n·p)
    * by integer arithmetic, and the top-k mass via the value-domain
    * cumulative trick — each distinct value contributes
    * cents·clamp(k − (cum − cnt), 0, cnt), which is precisely the
    * partial take at the k boundary (ties split deterministically by
    * value, never by row order).
    *
    * Scale shape: one map-side-combined (type, cents) fold — the frame is
    * value-domain bounded — then |types|-partition windows and one
    * |types| fold; never an event-scale window.
    */
  def q283ValueConcentration(s: SparkSession, dir: String): DataFrame =
    concentrationOf(Tables.events(s, dir)
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .groupBy(col("event_type"), col("cents")).agg(count(lit(1)).as("cnt")),
      "event_type")
      .withColumnRenamed("n_units", "n_events")

  /** The top-1%/top-10% mass-share fold on ANY (grp, cents, cnt)
    * value-domain frame — ONE definition serving q283 (event values) and
    * q294 (customer revenue). */
  private[graft] def concentrationOf(byVal: DataFrame, grp: String): DataFrame = {
    val wCum = Window.partitionBy(col(grp)).orderBy(col("cents").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(grp))
    byVal
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("tot", sum(expr("cents * cnt")).over(wAll))
      .groupBy(col(grp))
      .agg(max(col("n")).as("n_units"), max(col("tot")).as("total_cents"),
        sum(expr("""cents * greatest(CAST(0 AS BIGINT),
                    least(cnt, (n + 99) DIV 100 - (cum - cnt)))""")).as("s1"),
        sum(expr("""cents * greatest(CAST(0 AS BIGINT),
                    least(cnt, (n * 10 + 99) DIV 100 - (cum - cnt)))""")).as("s10"))
      .select(col(grp), col("n_units"), col("total_cents"),
        expr("s1 * 10000 DIV greatest(total_cents, 1)").as("top1_share_bp"),
        expr("s10 * 10000 DIV greatest(total_cents, 1)").as("top10_share_bp"))
  }

  /** q294: customer-REVENUE concentration per nation — q283's two-point
    * heavy-tail read on the customer axis: per nation, customers with
    * orders, lifetime revenue cents, and the revenue share of the top 1%
    * and top 10% of customers. The whale-dependence table an account
    * strategy (and a churn-risk model) is actually built on; exact via
    * the SAME [[concentrationOf]] partial-take kernel.
    *
    * Scale shape: one orders fold to (customer, cents), a broadcast dim
    * join for the nation, then value-domain windows bounded by
    * |customers| — dim scale, never fact scale.
    */
  def q294CustomerConcentration(s: SparkSession, dir: String): DataFrame = {
    val custRev = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
    concentrationOf(
        custRev.groupBy(col("c_nationkey"), col("cents")).agg(count(lit(1)).as("cnt")),
        "c_nationkey")
      .withColumnRenamed("n_units", "n_customers")
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n_customers"), col("total_cents"),
        col("top1_share_bp"), col("top10_share_bp"))
  }

  /** q274: per-source doc-LENGTH KS drift — q91's two-sample
    * Kolmogorov–Smirnov discipline pointed at feed health: each source's
    * word-count distribution against the REST of the corpus, D in integer
    * bp via the same cross-multiplied ECDF trick (c_src·(T−t_src) −
    * (c_rest)·t_src over t_src·(T−t_src) — no double enters the
    * statistic; the products are DECIMAL(38,0)/HUGEINT-widened, since at
    * ~1e9 docs they reach ~1e22, past BIGINT — q244's widening rule),
    * with the 5% critical value 1.358·√((n+m)/nm) published
    * beside it (ONE scalar double from exact integers, q95's rule) and a
    * `drifted` verdict. A feed whose length distribution walks away from
    * the corpus — truncated scrapes, concatenated pages, a changed
    * extractor — trips this before any content-level audit notices.
    *
    * Scale shape: one scan folds to the (source, len) value-domain frame
    * (|sources|×|distinct lengths| — corpus-size-independent), the ECDF
    * grid is sources × lengths (bounded), the corpus cumulative is one
    * |lengths|-row window, and the final fold is |sources| rows. The
    * single-partition window over the length domain is a bounded-frame
    * window, not an event-scale one.
    */
  def q274SourceLengthKs(s: SparkSession, dir: String): DataFrame = {
    val lens = Tables.documents(s, dir)
      .select(col("source"),
        size(graft.functions.Tokens(col("text"))).cast("long").as("len"))
    val byCell = lens.groupBy(col("source"), col("len")).agg(count(lit(1)).as("n"))
    val grid = byCell.select(col("source")).distinct()
      .crossJoin(byCell.select(col("len")).distinct())
    val wCum = Window.partitionBy(col("source")).orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
    val allCum = byCell.groupBy(col("len")).agg(sum(col("n")).as("na"))
      .withColumn("c_all", sum(col("na")).over(
        Window.orderBy(col("len"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("len"), col("c_all"))
    val tot = lens.agg(count(lit(1)).as("t"))
    grid.join(byCell, Seq("source", "len"), "left").na.fill(0L, Seq("n"))
      .withColumn("c_src", sum(col("n")).over(wCum))
      .withColumn("t_src", sum(col("n")).over(wAll))
      .join(broadcast(allCum), Seq("len"))
      .crossJoin(broadcast(tot))
      .groupBy(col("source"))
      .agg(max(col("t_src")).as("n_docs"),
        max(col("t") - col("t_src")).as("n_rest"),
        // the cross-multiplied ECDF terms are widened to DECIMAL(38,0)
        // (DuckDB: HUGEINT) before the ×10000: at ~1e9 docs the product
        // c_src·(t−t_src)·10000 reaches ~1e22, past BIGINT — the q244
        // widening rule. DIV brings the ≤10000-bp quotient back to BIGINT.
        max(expr("""CASE WHEN t_src = 0 OR t_src = t THEN NULL
                    ELSE abs(CAST(c_src AS DECIMAL(19,0)) * (t - t_src)
                             - (c_all - CAST(c_src AS DECIMAL(19,0))) * t_src)
                         * 10000 DIV (CAST(t_src AS DECIMAL(19,0)) * (t - t_src)) END"""))
          .as("ks_bp"))
      .withColumn("crit_bp",
        expr("""CASE WHEN n_rest = 0 THEN NULL
                ELSE CAST(floor(13580 * sqrt((n_docs + n_rest)
                     / (CAST(n_docs AS DOUBLE) * n_rest))) AS BIGINT) END"""))
      .withColumn("drifted", col("ks_bp") > col("crit_bp"))
  }

  /** χ² 5% critical value ×1000 selected by dof = n_groups − 1 — one
    * literal CASE text on both engines. A type observed on fewer than 7
    * distinct weekdays has fewer degrees of freedom; the fixed χ²(6) bar
    * would be over-conservative for sparse feeds (n_groups = 1 makes H
    * identically 0, so the ELSE arm is unreachable in anger). */
  private val kwCritSql: String =
    """CASE n_groups WHEN 2 THEN 3841 WHEN 3 THEN 5991 WHEN 4 THEN 7815
         WHEN 5 THEN 9488 WHEN 6 THEN 11070 ELSE 12592 END"""

  /** q237: calendar-GAP audit per event type — the feed-outage table the
    * gap-honest estimators (q95/q177/q182/q234's RANGE frames) assume
    * someone is actually reading: per type, observed days vs calendar
    * span, missing-day count, the LONGEST outage and coverage in bp. A
    * feed at 9xxx-bp coverage with a 1-day longest gap hiccuped; one at
    * the same coverage with a 30-day gap was DOWN — q231/q235 read
    * differently across that distinction, and backfill tickets are cut
    * from this table, not from the estimators that silently skip gaps.
    *
    * Exactness: pure integer day arithmetic off the epoch-day frame;
    * coverage an all-positive DIV (span ≥ n_days ≥ 1); a single-day type
    * has no lag row — max ignores the NULL gap and coalesces to 0, span
    * 1, coverage 10000 (q231's one-day-feed lesson: it rows, honestly).
    *
    * Shape: one scan → (type, day) agg; the lag window and the fold run
    * on the calendar-bounded frame.
    */
  def q237CalendarGaps(s: SparkSession, dir: String): DataFrame =
    calendarGapsOf(Tables.events(s, dir))

  /** q237 on ANY (event_type, ts) frame — spec'd on planted outage /
    * hiccup / single-day series beside the oracled corpus run. */
  private[graft] def calendarGapsOf(ev: DataFrame): DataFrame =
    gapsFromDaily(ev
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n")))

  /** The gap audit off an already-built (event_type, day, n) daily frame
    * (epoch day) — one definition serves q237 and s28's maintained
    * table.
    */
  private[graft] def gapsFromDaily(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("gap", col("day") - lag(col("day"), 1).over(w) - lit(1L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        min(col("day")).as("first_day"), max(col("day")).as("last_day"),
        coalesce(max(col("gap")), lit(0L)).as("longest_gap"),
        sum(col("n")).as("n_events"))
      .withColumn("span_days", col("last_day") - col("first_day") + lit(1L))
      .withColumn("n_missing", col("span_days") - col("n_days"))
      .select(col("event_type"), col("n_days"), col("first_day"),
        col("last_day"), col("span_days"), col("n_missing"),
        col("longest_gap"),
        expr("(n_days * 10000) DIV span_days").as("coverage_bp"),
        col("n_events"))
  }

  /** q173: Benford first-digit audit on lineitem prices — the classic
    * "were these amounts fabricated" forensic screen (synthetic uniform
    * prices deliberately FAIL it, which the audit must report, not hide).
    *
    * The leading significant digit comes from the decimal rendering of
    * the exact cents integer — no log10-of-value binning, so the digit
    * can never waver across engines. Expected shares are Benford's
    * log10(1 + 1/d), rounded to basis points per digit (the q142 rule:
    * a last-ulp log divergence cannot move a rounded term unless it
    * lands within an ulp of a .5 boundary).
    *
    * Shape: one scan → 9-cell digit agg; the digit frame is
    * localCheckpointed for its two consumers (total + grid join), and
    * the 1..9 grid densify guarantees both engines report absent digits
    * as zero rows rather than dropping them.
    */
  def q173Benford(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.lineitem(s, dir)
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .filter(col("cents") > 0)
      .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT)").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val tot = d.agg(sum(col("n")).as("n_total"))
    s.range(1, 10).select(col("id").as("digit"))
      .join(d, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n").as("n_items"),
        expr("CAST(round(10000.0 * CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)) AS BIGINT)")
          .as("share_bp"),
        expr("CAST(round(10000.0 * log10(1.0 + 1.0 / CAST(digit AS DOUBLE))) AS BIGINT)")
          .as("benford_bp"))
      .withColumn("dev_bp", col("share_bp") - col("benford_bp"))
  }

  /** q184: anomaly attribution — the question that follows every q95
    * alarm: WHICH segment drove today's excess? Per (day, event_type):
    * the trailing-7-day baseline (q95's RANGE frame — gap-honest),
    * excess over baseline in micro-events, and the segment's share of
    * the day's total POSITIVE excess in basis points (negative-excess
    * segments attribute zero — a sagging segment doesn't dilute the
    * spiking one's share; the sign convention the on-call actually
    * wants). Segments with < 3 baseline days emit NULL baseline/excess
    * and attribute nothing — an honest "too new to judge", not a zero.
    *
    * Exactness: baseline_micro is ONE round(double/double) over integer
    * window sums; excess and the share's floor division are pure
    * integers (nonnegative — truncate ≡ floor). The share cross-multiply
    * runs in DECIMAL(38,0) (HUGEINT in the oracle): pos_excess is
    * micro-scaled, so at ~1e9+ events per type-day the BIGINT product
    * pos_excess·10000 would exceed 2⁶³ — q170/q171's widening rule. The
    * quotient is ≤ 10000, so the BIGINT result cast is always exact.
    *
    * Shape: one scan → (type, day) agg; the per-type RANGE window and
    * the per-day share window both run on the calendar×types-bounded
    * frame.
    */
  def q184AnomalyAttribution(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
    val wBase = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-7, -1)
    val wDay = Window.partitionBy(col("day"))
    daily
      .withColumn("b_sum", sum(col("n")).over(wBase))
      .withColumn("b_cnt", count(col("n")).over(wBase))
      .withColumn("baseline_micro", expr(
        """CASE WHEN b_cnt >= 3
                THEN CAST(round(1000000.0 * CAST(b_sum AS DOUBLE) /
                     CAST(b_cnt AS DOUBLE)) AS BIGINT) END"""))
      .withColumn("excess_micro", expr("n * 1000000 - baseline_micro"))
      .withColumn("pos_excess", expr("greatest(coalesce(excess_micro, 0), 0)"))
      .withColumn("day_pos_total", sum(col("pos_excess")).over(wDay))
      .select(col("day"), col("event_type"), col("n").as("n_events"),
        col("baseline_micro"), col("excess_micro"),
        expr("""CASE WHEN excess_micro IS NOT NULL AND day_pos_total > 0
                     THEN CAST(CAST(pos_excess AS DECIMAL(38,0)) * 10000
                               DIV day_pos_total AS BIGINT) END""")
          .as("share_bp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q184_anomaly_attribution" -> (q184AnomalyAttribution _),
    "q142_psi_drift"  -> (q142PsiDrift _),
    "q171_rank_test"  -> (q171RankTest _),
    "q172_cusum"      -> (q172Cusum _),
    "q231_trend_test" -> (q231TrendTest _),
    "q234_acf"        -> (q234Acf _),
    "q235_theil_sen"  -> (q235TheilSen _),
    "q301_changepoint" -> (q301Changepoint _),
    "q307_segment_mix_drift" -> (q307SegmentMixDrift _),
    "q237_calendar_gaps" -> (q237CalendarGaps _),
    "q245_kruskal_dow"   -> (q245KruskalDow _),
    "q258_dow_profile"   -> (q258DowProfile _),
    "q270_arrival_dispersion" -> (q270ArrivalDispersion _),
    "q274_source_length_ks" -> (q274SourceLengthKs _),
    "q283_value_concentration" -> (q283ValueConcentration _),
    "q294_customer_concentration" -> (q294CustomerConcentration _),
    "q173_benford"    -> (q173Benford _),
    "q104_ab_test"    -> (q104AbTest _),
    "q105_gini"       -> (q105Gini _),
    "q99_cov_matrix"  -> (q99CovMatrix _),
    "q87_correlation" -> (q87Correlation _),
    "q89_chisq"       -> (q89ChiSquare _),
    "q91_ks_drift"    -> (q91KsDrift _),
    "q95_volume_anomaly" -> (q95VolumeAnomaly _))

  /** q99's oracle, assembled from the SAME [[covNames]]/[[covPairs]]/
    * formula builders as the Spark plan — only the BIGINT casts (DuckDB
    * sums bigint into int128 where Spark widens decimal) are oracle-local. */
  private val covOracleSql: String = {
    val defs = Seq(
      "CAST(l_quantity AS BIGINT) AS quantity",
      "CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents",
      "CAST(round(l_discount * 100) AS BIGINT) AS discount_pct",
      "CAST(round(l_tax * 100) AS BIGINT) AS tax_pct")
    val sums = Seq("count(*) AS n") ++
      covNames.map(n => s"sum($n) AS s_$n") ++
      (for { i <- covNames.indices; j <- i until covNames.length } yield
        s"sum(${covNames(i)} * ${covNames(j)}) AS p_${covNames(i)}_${covNames(j)}")
    val rows = covPairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
             ${covFormula(a, b)} AS cov,
             ${corrFormula(a, b)} AS pearson_r
         FROM a"""
    }
    s"""WITH s AS (SELECT ${defs.mkString(", ")} FROM lineitem),
        a AS (SELECT ${sums.mkString(", ")} FROM s)
        ${rows.mkString("\n UNION ALL \n")}"""
  }

  val oracles: Map[String, String] = Map(
    "q294_customer_concentration" ->
      """WITH cr AS (SELECT o_custkey,
                            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                              AS BIGINT) AS cents
                     FROM orders GROUP BY 1),
          j AS (SELECT c.c_nationkey, cr.cents FROM cr
                JOIN customer c ON o_custkey = c_custkey),
          bc AS (SELECT c_nationkey, cents, count(*) AS cnt FROM j GROUP BY 1, 2),
          c AS (SELECT c_nationkey, cents, cnt,
                       sum(cnt) OVER (PARTITION BY c_nationkey ORDER BY cents DESC
                                      ROWS UNBOUNDED PRECEDING) AS cum,
                       sum(cnt) OVER (PARTITION BY c_nationkey) AS n,
                       sum(cents * cnt) OVER (PARTITION BY c_nationkey) AS tot
                FROM bc),
          a AS (SELECT c_nationkey,
                       CAST(max(n) AS BIGINT) AS n_customers,
                       CAST(max(tot) AS BIGINT) AS total_cents,
                       CAST(sum(cents * greatest(0, least(cnt,
                            (n + 99) // 100 - (cum - cnt)))) AS BIGINT) AS s1,
                       CAST(sum(cents * greatest(0, least(cnt,
                            (n * 10 + 99) // 100 - (cum - cnt)))) AS BIGINT) AS s10
                FROM c GROUP BY 1)
          SELECT n_name, n_customers, total_cents,
                 s1 * 10000 // greatest(total_cents, 1) AS top1_share_bp,
                 s10 * 10000 // greatest(total_cents, 1) AS top10_share_bp
          FROM a JOIN nation ON c_nationkey = n_nationkey""",
    "q283_value_concentration" ->
      """WITH v AS (SELECT event_type,
                           CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events),
          bc AS (SELECT event_type, cents, count(*) AS cnt FROM v GROUP BY 1, 2),
          c AS (SELECT event_type, cents, cnt,
                       sum(cnt) OVER (PARTITION BY event_type ORDER BY cents DESC
                                      ROWS UNBOUNDED PRECEDING) AS cum,
                       sum(cnt) OVER (PARTITION BY event_type) AS n,
                       sum(cents * cnt) OVER (PARTITION BY event_type) AS tot
                FROM bc),
          a AS (SELECT event_type,
                       CAST(max(n) AS BIGINT) AS n_events,
                       CAST(max(tot) AS BIGINT) AS total_cents,
                       CAST(sum(cents * greatest(0, least(cnt,
                            (n + 99) // 100 - (cum - cnt)))) AS BIGINT) AS s1,
                       CAST(sum(cents * greatest(0, least(cnt,
                            (n * 10 + 99) // 100 - (cum - cnt)))) AS BIGINT) AS s10
                FROM c GROUP BY 1)
          SELECT event_type, n_events, total_cents,
                 s1 * 10000 // greatest(total_cents, 1) AS top1_share_bp,
                 s10 * 10000 // greatest(total_cents, 1) AS top10_share_bp
          FROM a""",
    "q274_source_length_ks" ->
      """WITH l AS (SELECT source,
                           CAST(len(list_filter(string_split(text, ' '),
                                                x -> x <> '')) AS BIGINT) AS len
                    FROM documents),
          bc AS (SELECT source, len, count(*) AS n FROM l GROUP BY 1, 2),
          grid AS (SELECT source, len
                   FROM (SELECT DISTINCT source FROM bc)
                   CROSS JOIN (SELECT DISTINCT len FROM bc)),
          cells AS (SELECT g.source, g.len, COALESCE(bc.n, 0) AS n
                    FROM grid g LEFT JOIN bc
                      ON g.source = bc.source AND g.len = bc.len),
          cum AS (SELECT source, len, n,
                         sum(n) OVER (PARTITION BY source ORDER BY len
                                      ROWS UNBOUNDED PRECEDING) AS c_src,
                         sum(n) OVER (PARTITION BY source) AS t_src
                  FROM cells),
          acc AS (SELECT len,
                         sum(sum(n)) OVER (ORDER BY len
                                           ROWS UNBOUNDED PRECEDING) AS c_all
                  FROM bc GROUP BY len),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM l),
          agg AS (SELECT source,
                         CAST(max(t_src) AS BIGINT) AS n_docs,
                         CAST(max(t - t_src) AS BIGINT) AS n_rest,
                         CAST(max(CASE WHEN t_src = 0 OR t_src = t THEN NULL
                                  ELSE abs(CAST(c_src AS HUGEINT) * (t - t_src)
                                           - (c_all - CAST(c_src AS HUGEINT)) * t_src)
                                       * 10000 // (CAST(t_src AS HUGEINT) * (t - t_src)) END)
                           AS BIGINT) AS ks_bp
                  FROM cum JOIN acc USING (len) CROSS JOIN tot
                  GROUP BY source)
          SELECT source, n_docs, n_rest, ks_bp,
                 CASE WHEN n_rest = 0 THEN NULL
                      ELSE CAST(floor(13580 * sqrt((n_docs + n_rest)
                           / (CAST(n_docs AS DOUBLE) * n_rest))) AS BIGINT)
                 END AS crit_bp,
                 ks_bp > (CASE WHEN n_rest = 0 THEN NULL
                          ELSE CAST(floor(13580 * sqrt((n_docs + n_rest)
                               / (CAST(n_docs AS DOUBLE) * n_rest))) AS BIGINT)
                          END) AS drifted
          FROM agg""",
    "q270_arrival_dispersion" ->
      """WITH e AS (SELECT event_type, date_trunc('hour', ts) AS h FROM events),
          span AS (SELECT date_diff('hour', min(h), max(h)) + 1 AS n_hours FROM e),
          hc AS (SELECT event_type, h, count(*) AS c FROM e GROUP BY 1, 2),
          a AS (SELECT event_type, count(*) AS active_hours,
                       CAST(sum(c) AS BIGINT) AS n_events,
                       sum(CAST(c AS HUGEINT) * c) AS s2
                FROM hc GROUP BY 1),
          d AS (SELECT event_type, n_hours, active_hours, n_events,
                       CAST((CAST(n_hours AS HUGEINT) * s2
                             - CAST(n_events AS HUGEINT) * n_events) * 100
                            // (CAST(n_hours AS HUGEINT) * greatest(n_events, 1))
                            AS BIGINT) AS dispersion_x100
                FROM a CROSS JOIN span)
          SELECT event_type, n_hours, active_hours, n_events, dispersion_x100,
                 dispersion_x100 > 200 AS overdispersed
          FROM d""",
    "q184_anomaly_attribution" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         b AS (
           SELECT *,
                  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
                    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS b_sum,
                  CAST(count(n) OVER (PARTITION BY event_type ORDER BY day
                    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS b_cnt
           FROM daily),
         e AS (
           SELECT *,
                  CASE WHEN b_cnt >= 3
                       THEN CAST(round(1000000.0 * CAST(b_sum AS DOUBLE) /
                            CAST(b_cnt AS DOUBLE)) AS BIGINT) END AS baseline_micro
           FROM b),
         x AS (
           SELECT *, n * 1000000 - baseline_micro AS excess_micro,
                  greatest(coalesce(n * 1000000 - baseline_micro, 0), 0) AS pos_excess
           FROM e),
         d AS (
           SELECT *, CAST(sum(pos_excess) OVER (PARTITION BY day) AS BIGINT)
                       AS day_pos_total
           FROM x)
         SELECT day, event_type, n AS n_events, baseline_micro, excess_micro,
                CASE WHEN excess_micro IS NOT NULL AND day_pos_total > 0
                     THEN CAST(CAST(pos_excess AS HUGEINT) * 10000
                               // day_pos_total AS BIGINT) END AS share_bp
         FROM d""",
    "q171_rank_test" -> mwuOracleFrom(
      s"""SELECT CAST(round(value * 100) AS BIGINT) AS cents,
                 CASE WHEN event_type = '$RankArmA' THEN 1 ELSE 0 END AS is_a
          FROM events WHERE event_type IN ('$RankArmA', '$RankArmB')"""),
    "q231_trend_test" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         pairs AS (
           SELECT a.event_type,
                  CAST(sum(CAST(sign(b.n - a.n) AS BIGINT)) AS BIGINT) AS s
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.day < b.day
           GROUP BY 1),
         tg AS (SELECT event_type, n, CAST(count(*) AS BIGINT) AS t
                FROM daily GROUP BY 1, 2),
         ties AS (
           SELECT event_type, CAST(sum(t) AS BIGINT) AS n_days,
                  CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
           FROM tg GROUP BY 1),
         j AS (
           SELECT t.event_type, t.n_days, COALESCE(p.s, 0) AS s,
                  t.n_days * (t.n_days - 1) * (2 * t.n_days + 5) - t.tie18
                    AS var18
           FROM ties t LEFT JOIN pairs p USING (event_type)),
         z AS (
           SELECT event_type, n_days, s, var18,
                  CASE WHEN s = 0 OR var18 <= 0 THEN CAST(0 AS BIGINT)
                       ELSE CAST(round((s - CAST(sign(s) AS BIGINT))
                            / sqrt(CAST(var18 AS DOUBLE) / 18.0) * 1000)
                          AS BIGINT) END AS z_x1000
           FROM j)
         SELECT event_type, n_days, s, var18, z_x1000,
                CASE WHEN z_x1000 >= 1960 THEN 'increasing'
                     WHEN z_x1000 <= -1960 THEN 'decreasing'
                     ELSE 'none' END AS trend
         FROM z""",
    "q307_segment_mix_drift" -> {
      val segCols = MixSegments.map(s0 =>
        s"CAST(sum(CASE WHEN c_mktsegment = '$s0' THEN n ELSE 0 END) AS BIGINT) AS o_$s0")
        .mkString(",\n                  ")
      val totCols = MixSegments.map(s0 => s"CAST(sum(o_$s0) AS BIGINT) AS c_$s0")
        .mkString(", ")
      s"""WITH cells AS (
           SELECT strftime(o_orderdate, '%Y-%m') AS month, c_mktsegment,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         wide AS (
           SELECT month,
                  $segCols
           FROM cells GROUP BY 1),
         w2 AS (SELECT *, ${MixSegments.map(s0 => s"o_$s0").mkString(" + ")} AS t
                FROM wide),
         tot AS (SELECT CAST(sum(t) AS BIGINT) AS nn, $totCols FROM w2),
         z AS (SELECT month, t, ${mixChi2Sql("HUGEINT")} AS chi2_x1000,
                      ${mixOverSql("HUGEINT")} AS over_segment
               FROM w2 CROSS JOIN tot)
         SELECT month, t AS n_orders, chi2_x1000, over_segment,
                CASE WHEN chi2_x1000 >= 9488 THEN 'shifted'
                     ELSE 'stable' END AS verdict
         FROM z"""
    },
    "q301_changepoint" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         w AS (
           SELECT event_type, day, n,
                  CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                    AS BIGINT) AS i,
                  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day)
                    AS BIGINT) AS s_l,
                  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
                  CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS s,
                  CAST(sum(CAST(n AS HUGEINT) * n) OVER (PARTITION BY event_type)
                    AS HUGEINT) AS q,
                  lead(day) OVER (PARTITION BY event_type ORDER BY day) AS split_day
           FROM daily),
         splits AS (
           SELECT event_type, n_days, s, q, split_day,
                  i AS n_l, n_days - i AS n_r, s_l, s - s_l AS s_r,
                  CAST(n_days - i AS HUGEINT) * s_l
                    - CAST(i AS HUGEINT) * (s - s_l) AS a
           FROM w WHERE i < n_days),
         sc AS (
           SELECT *, a * a AS a2,
                  CAST(a * a AS DOUBLE)
                    / CAST(CAST(n_l AS HUGEINT) * n_r AS DOUBLE) AS score
           FROM splits),
         best AS (
           SELECT *, row_number() OVER (PARTITION BY event_type
                       ORDER BY score DESC, split_day ASC) AS rk
           FROM sc),
         b AS (
           SELECT event_type, split_day, n_l AS left_days,
                  CAST(round(100.0 * CAST(s_l AS DOUBLE) / CAST(n_l AS DOUBLE))
                    AS BIGINT) AS left_mean_x100,
                  CAST(round(100.0 * CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                    AS BIGINT) AS right_mean_x100,
                  CASE WHEN CAST(n_days AS HUGEINT) * q
                            - CAST(s AS HUGEINT) * s > 0 THEN
                    CAST(round(10000.0 * CAST(a2 AS DOUBLE) /
                      CAST(CAST(n_l AS HUGEINT) * n_r *
                        (CAST(n_days AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
                        AS DOUBLE)) AS BIGINT)
                  END AS r2_bp
           FROM best WHERE rk = 1),
         spine AS (SELECT DISTINCT event_type, n_days FROM w)
         SELECT t.event_type, t.n_days, b.split_day, b.left_days,
                b.left_mean_x100, b.right_mean_x100, b.r2_bp,
                CASE WHEN COALESCE(b.r2_bp, 0) >= 2500 AND t.n_days >= 8
                     THEN 'shift' ELSE 'none' END AS verdict
         FROM spine t LEFT JOIN b USING (event_type)""",
    "q234_acf" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
         tot AS (
           SELECT CAST(count(*) AS BIGINT) AS d, CAST(sum(n) AS BIGINT) AS t
           FROM daily),
         dev AS (
           SELECT day, CAST(d AS HUGEINT) * n - t AS dev
           FROM daily CROSS JOIN tot),
         den AS (SELECT sum(dev * dev) AS den FROM dev),
         lags AS (SELECT unnest(generate_series(1, 14)) AS lag),
         pairs AS (
           SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
                  sum(a.dev * b.dev) AS num
           FROM dev a CROSS JOIN lags JOIN dev b ON b.day = a.day + lag
           GROUP BY 1)
         SELECT l.lag, coalesce(p.n_pairs, 0) AS n_pairs,
                CASE WHEN coalesce(p.n_pairs, 0) > 0 AND den > 0
                     THEN CAST(round(10000.0 * CAST(num AS DOUBLE) /
                          CAST(den AS DOUBLE)) AS BIGINT) END AS acf_bp
         FROM lags l LEFT JOIN pairs p USING (lag) CROSS JOIN den""",
    "q258_dow_profile" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         cells AS (
           SELECT event_type, (day + 4) % 7 AS dow,
                  CAST(count(*) AS BIGINT) AS n_days,
                  CAST(sum(n) AS BIGINT) AS n_events
           FROM daily GROUP BY 1, 2),
         grid AS (SELECT t.event_type, d.dow
                  FROM (SELECT DISTINCT event_type FROM cells) t
                  CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS dow) d),
         g AS (SELECT grid.event_type, grid.dow,
                      COALESCE(c.n_days, 0) AS n_days,
                      COALESCE(c.n_events, 0) AS n_events
               FROM grid LEFT JOIN cells c
                 ON grid.event_type = c.event_type AND grid.dow = c.dow),
         w AS (SELECT *, CAST(sum(n_events) OVER (PARTITION BY event_type)
                   AS BIGINT) AS tt
               FROM g)
         SELECT event_type, dow, n_days, n_events,
                CASE WHEN n_days > 0 THEN n_events // n_days END AS mean_daily,
                (n_events * 10000) // tt AS share_bp,
                (n_events * 7 * 10000) // tt - 10000 AS dev_bp
         FROM w""",
    "q245_kruskal_dow" -> {
      val pivots = (0 until 7).map(d =>
        s"""coalesce(CAST(sum(CASE WHEN dow = $d THEN n_g END) AS BIGINT), 0) AS n_$d,
            coalesce(CAST(sum(CASE WHEN dow = $d THEN r2 END) AS BIGINT), 0) AS r2_$d""")
        .mkString(",\n                  ")
      s"""WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         cells AS (
           SELECT event_type, n, (day + 4) % 7 AS dow,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM daily GROUP BY 1, 2, 3),
         ties AS (
           SELECT event_type, n, t,
                  coalesce(sum(t) OVER (PARTITION BY event_type ORDER BY n
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS cum_before
           FROM (SELECT event_type, n, CAST(sum(cnt) AS BIGINT) AS t
                 FROM cells GROUP BY 1, 2)),
         g AS (
           SELECT c.event_type, c.dow, CAST(sum(cnt) AS BIGINT) AS n_g,
                  CAST(sum(cnt * (2 * cum_before + t + 1)) AS BIGINT) AS r2
           FROM cells c JOIN ties ti USING (event_type, n)
           GROUP BY 1, 2),
         p AS (
           SELECT event_type, CAST(sum(n_g) AS BIGINT) AS n_days,
                  CAST(count(*) AS BIGINT) AS n_groups,
                  $pivots
           FROM g GROUP BY 1),
         ts2 AS (SELECT event_type, CAST(sum(t * (t * t - 1)) AS BIGINT) AS tsum
                 FROM ties GROUP BY 1),
         h AS (
           SELECT p.event_type, n_days, n_groups,
                  CASE WHEN n_days > 1
                        AND CAST(tsum AS DOUBLE) <
                            CAST(n_days AS DOUBLE) * n_days * n_days - n_days
                       THEN CAST(round(1000.0 *
                         ((12.0 / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) + 1.0))
                           * ($kwRankTermsSql)
                           - 3.0 * (CAST(n_days AS DOUBLE) + 1.0))
                          / (1.0 - CAST(tsum AS DOUBLE) /
                             (CAST(n_days AS DOUBLE) * n_days * n_days - n_days))))
                         AS BIGINT) END AS h_x1000
           FROM p JOIN ts2 ON p.event_type = ts2.event_type)
         SELECT event_type, n_days, n_groups, h_x1000,
                CASE WHEN h_x1000 IS NOT NULL AND h_x1000 >= ($kwCritSql)
                     THEN 'weekly' ELSE 'none' END AS dow_effect
         FROM h""" },
    "q237_calendar_gaps" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         g AS (
           SELECT *, day - lag(day) OVER (PARTITION BY event_type
                       ORDER BY day) - 1 AS gap
           FROM daily),
         a AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                  min(day) AS first_day, max(day) AS last_day,
                  CAST(coalesce(max(gap), 0) AS BIGINT) AS longest_gap,
                  CAST(sum(n) AS BIGINT) AS n_events
           FROM g GROUP BY 1)
         SELECT event_type, n_days, first_day, last_day,
                last_day - first_day + 1 AS span_days,
                last_day - first_day + 1 - n_days AS n_missing,
                longest_gap,
                (n_days * 10000) // (last_day - first_day + 1) AS coverage_bp,
                n_events
         FROM a""",
    "q235_theil_sen" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         med AS (
           SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_pairs,
                  CAST(round(quantile_cont(
                    CAST(b.n - a.n AS DOUBLE) / CAST(b.day - a.day AS DOUBLE),
                    0.5) * 1000) AS BIGINT) AS slope_x1000
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.day < b.day
           GROUP BY 1),
         sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
                FROM daily GROUP BY 1)
         SELECT s.event_type, s.n_days, coalesce(m.n_pairs, 0) AS n_pairs,
                m.slope_x1000
         FROM sz s LEFT JOIN med m USING (event_type)""",
    "q172_cusum" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
         tot AS (
           SELECT CAST(count(*) AS BIGINT) AS n_days, CAST(sum(n) AS BIGINT) AS n_total
           FROM daily),
         wc AS (
           SELECT day, n,
                  CAST(sum(n_days * n - n_total) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum
           FROM daily CROSS JOIN tot),
         mx AS (SELECT max(abs(cusum)) AS max_abs FROM wc)
         SELECT strftime(day, '%Y-%m-%d') AS day, n AS n_events,
                cusum AS cusum_scaled, abs(cusum) = max_abs AS is_changepoint
         FROM wc CROSS JOIN mx""",
    "q173_benford" ->
      """WITH c AS (
           SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem WHERE round(l_extendedprice * 100) > 0),
         d AS (
           SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                  CAST(count(*) AS BIGINT) AS n
           FROM c GROUP BY 1),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM d),
         g AS (
           SELECT grid.digit, coalesce(d.n, 0) AS n
           FROM (SELECT unnest(range(1, 10)) AS digit) grid
           LEFT JOIN d ON d.digit = grid.digit),
         r AS (
           SELECT digit, n AS n_items,
                  CAST(round(10000.0 * CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)) AS BIGINT) AS share_bp,
                  CAST(round(10000.0 * log10(1.0 + 1.0 / CAST(digit AS DOUBLE))) AS BIGINT) AS benford_bp
           FROM g CROSS JOIN tot)
         SELECT digit, n_items, share_bp, benford_bp,
                share_bp - benford_bp AS dev_bp
         FROM r""",
    "q142_psi_drift" ->
      """WITH e AS (
           SELECT event_type,
                  least(greatest(CAST(round(value * 100) AS BIGINT) // 5000, 0), 4) AS bin,
                  ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow7
           FROM events),
         g AS (
           SELECT event_type, bin,
                  CAST(sum(CASE WHEN dow7 IN (0, 6) THEN 0 ELSE 1 END) AS BIGINT) AS n_wd,
                  CAST(sum(CASE WHEN dow7 IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT) AS n_we
           FROM e GROUP BY 1, 2),
         cells AS (
           SELECT t.event_type, b.bin,
                  coalesce(g.n_wd, 0) AS n_wd, coalesce(g.n_we, 0) AS n_we
           FROM (SELECT DISTINCT event_type FROM e) t
           CROSS JOIN (SELECT unnest(range(0, 5)) AS bin) b
           LEFT JOIN g ON g.event_type = t.event_type AND g.bin = b.bin),
         w AS (
           SELECT event_type, n_wd, n_we,
                  CAST(sum(n_wd) OVER (PARTITION BY event_type) AS BIGINT) AS t_wd,
                  CAST(sum(n_we) OVER (PARTITION BY event_type) AS BIGINT) AS t_we
           FROM cells),
         p AS (
           SELECT event_type, t_wd, t_we,
                  CAST(n_wd + 1 AS DOUBLE) / CAST(t_wd + 5 AS DOUBLE) AS p,
                  CAST(n_we + 1 AS DOUBLE) / CAST(t_we + 5 AS DOUBLE) AS q
           FROM w)
         SELECT event_type,
                CAST(max(t_wd) AS BIGINT) AS n_weekday,
                CAST(max(t_we) AS BIGINT) AS n_weekend,
                CAST(sum(CAST(round((p - q) * ln(p / q) * 10000) AS BIGINT))
                  AS BIGINT) AS psi_dbp
         FROM p GROUP BY event_type""",
    "q104_ab_test" ->
      s"""WITH f AS (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM events),
         u AS (
           SELECT user_id,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS converted,
                  ${TextAnalysis.duckCoin("user_id")} AS coin
           FROM f WHERE rn = 1),
         a AS (
           SELECT CAST(sum(CASE WHEN coin < 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                  CAST(sum(CASE WHEN coin < 128 THEN converted ELSE 0 END) AS BIGINT) AS c_a,
                  CAST(sum(CASE WHEN coin >= 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                  CAST(sum(CASE WHEN coin >= 128 THEN converted ELSE 0 END) AS BIGINT) AS c_b
           FROM u)
         SELECT n_a, c_a, n_b, c_b,
                CAST(c_a * 10000 // nullif(n_a, 0) AS BIGINT) AS conv_a_bp,
                CAST(c_b * 10000 // nullif(n_b, 0) AS BIGINT) AS conv_b_bp,
                $abZFormula AS z
         FROM a""",
    "q105_gini" ->
      """WITH pc AS (
           SELECT o_custkey,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                    AS cents
           FROM orders GROUP BY o_custkey),
         r AS (
           SELECT cents,
                  row_number() OVER (ORDER BY cents, o_custkey) AS rnk
           FROM pc),
         a AS (
           SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS t,
                  sum(rnk * cents) AS s
           FROM r)
         SELECT n AS n_customers, t AS total_cents,
                round(2.0 * CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
                      - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
         FROM a""",
    "q99_cov_matrix" -> covOracleSql,
    "q95_volume_anomaly" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  count(*) AS n
           FROM events GROUP BY 1, 2),
         win AS (
           SELECT event_type, day, n,
                  CAST(count(n) OVER w AS BIGINT) AS cnt,
                  CAST(sum(n) OVER w AS BIGINT) AS s,
                  CAST(sum(n * n) OVER w AS BIGINT) AS s2
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)),
         zs AS (
           SELECT event_type, day, n, cnt,
                  CASE WHEN cnt < 3 OR cnt * s2 - s * s <= 0 THEN NULL
                  ELSE round(CAST(n * cnt - s AS DOUBLE) /
                             sqrt(CAST(cnt * s2 - s * s AS DOUBLE)), 4) END AS z
           FROM win)
         SELECT event_type, day, n, cnt AS n_baseline_days, z,
                CASE WHEN z IS NOT NULL AND abs(z) > 2.0 THEN 1 ELSE 0 END
                  AS is_anomaly
         FROM zs""",
    "q87_correlation" ->
      """WITH s AS (
           SELECT l_returnflag,
                  CAST(l_quantity AS BIGINT) AS x,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS y
           FROM lineitem),
         agg AS (
           SELECT l_returnflag, count(*) AS n_items,
                  sum(x) AS sx, sum(y) AS sy,
                  sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
           FROM s GROUP BY l_returnflag)
         SELECT l_returnflag, n_items,
                round(CAST(n_items * sxy - sx * sy AS DOUBLE) /
                      sqrt(CAST(n_items * sxx - sx * sx AS DOUBLE) *
                           CAST(n_items * syy - sy * sy AS DOUBLE)), 6)
                  AS pearson_r,
                round(CAST(n_items * sxy - sx * sy AS DOUBLE) /
                      CAST(n_items * sxx - sx * sx AS DOUBLE), 6)
                  AS slope_cents_per_unit
         FROM agg""",
    "q89_chisq" ->
      """WITH cells AS (
           SELECT event_type,
                  CAST(round(value * 100) AS BIGINT) // 10000 AS band,
                  count(*) AS n_obs
           FROM events GROUP BY 1, 2),
         t AS (
           SELECT event_type, band, n_obs,
                  CAST(sum(n_obs) OVER (PARTITION BY event_type) AS BIGINT) AS row_n,
                  CAST(sum(n_obs) OVER (PARTITION BY band) AS BIGINT) AS col_n,
                  CAST(sum(n_obs) OVER () AS BIGINT) AS total_n
           FROM cells),
         terms AS (
           SELECT event_type, band, n_obs,
                  CAST(row_n * col_n AS DOUBLE) / CAST(total_n AS DOUBLE) AS expected
           FROM t),
         m AS (
           SELECT event_type, band, n_obs, round(expected, 4) AS expected_r,
                  CAST(round((CAST(n_obs AS DOUBLE) - expected) *
                             (CAST(n_obs AS DOUBLE) - expected) / expected * 1000000)
                    AS BIGINT) AS term_micro
           FROM terms)
         SELECT event_type, band, n_obs, expected_r, term_micro,
                CAST(sum(term_micro) OVER () AS BIGINT) AS chi2_micro_total
         FROM m""",
    "q91_ks_drift" ->
      """WITH e AS (
           SELECT event_type,
                  CAST(round(value * 100) AS BIGINT) AS cents,
                  ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow7
           FROM events),
         g AS (
           SELECT event_type, cents,
                  CAST(sum(CASE WHEN dow7 IN (0, 6) THEN 0 ELSE 1 END) AS BIGINT) AS n_wd,
                  CAST(sum(CASE WHEN dow7 IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT) AS n_we
           FROM e GROUP BY 1, 2),
         c AS (
           SELECT event_type,
                  CAST(sum(n_wd) OVER w AS BIGINT) AS c1,
                  CAST(sum(n_we) OVER w AS BIGINT) AS c2,
                  CAST(sum(n_wd) OVER (PARTITION BY event_type) AS BIGINT) AS t1,
                  CAST(sum(n_we) OVER (PARTITION BY event_type) AS BIGINT) AS t2
           FROM g
           WINDOW w AS (PARTITION BY event_type ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT event_type,
                max(t1) AS n_weekday, max(t2) AS n_weekend,
                max(CASE WHEN t1 = 0 OR t2 = 0 THEN NULL
                    ELSE abs(c1 * t2 - c2 * t1) * 10000 // (t1 * t2) END) AS ks_bp
         FROM c GROUP BY event_type""")
}
