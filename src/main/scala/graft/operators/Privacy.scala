package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** P-block: anonymization operators — the "anonymize sensitive fields"
  * stage a published municipal trip dataset requires (SURVEY §1).
  *
  * All three primitives are narrow or single-shuffle:
  *  - pseudonymization and coarsening are pure projections (fused into the
  *    scan by Catalyst — zero extra cost at any scale);
  *  - small-cell suppression is one aggregation followed by a re-aggregation
  *    of the suppressed cells, both map-side combining.
  */
object Privacy {

  /** Salt for deterministic ID pseudonymization. In production this is a
    * per-release secret (rotating it unlinks releases); here a constant so
    * the DuckDB oracle can mirror the hash.
    */
  private val Salt = "graft-salt-v1:"

  private val SuppressK = 20

  /** q51: row-level anonymization of the events table —
    * salted-SHA256 pseudonymous user ids (stable within a release, not
    * linkable back without the salt), timestamps coarsened to the hour,
    * and values generalized to bands of 10. A pure projection.
    */
  def q51Anonymize(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        sha2(concat(lit(Salt), col("user_id").cast("string")), 256).as("user_pseudo"),
        date_trunc("hour", col("ts")).as("ts_hour"),
        col("event_type"),
        (floor(col("value") / 10.0) * 10.0).as("value_band"))

  /** q52: small-cell suppression (k-anonymity for published aggregates):
    * per (event_type, day) cells with fewer than k=20 contributing rows are
    * not published individually — they collapse into one residual row per
    * event_type (day = NULL), so every published cell is k-anonymous while
    * totals still reconcile.
    */
  def q52KanonSuppress(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(
        col("event_type"),
        when(col("n") >= SuppressK, date_format(col("day"), "yyyy-MM-dd")).as("day_pub"),
        col("n"), col("v"))
      .groupBy(col("event_type"), col("day_pub"))
      .agg(
        sum(col("n")).as("n_events"),
        round(sum(col("v").cast("decimal(8,2)")), 2).cast("double").as("total_value"))

  /** l-diversity thresholds: a publishable cell needs ≥ K rows AND ≥ L
    * distinct sensitive values (Machanavajjhala et al.). K is its own
    * knob, not q52's SuppressK — the audit is meant to flag cells the
    * pure size gate would have passed. */
  private[graft] val DiversityK = 10
  private[graft] val DiversityL = 4

  /** q160: l-diversity audit — the attack q52's k-anonymity alone misses:
    * a cell can hold ≥ k individuals who all share ONE sensitive value,
    * so membership discloses it. Same quasi-identifier cells as q52
    * (event_type × day); the sensitive attribute is the 50-unit value
    * band (q142's banding, integer-exact); `publish` requires BOTH
    * n ≥ k and ≥ L distinct bands. The distinct-agg plans TWO exchanges
    * (partial agg by (cell, band) — ≤ cells×bands rows — then the cell
    * rollup), both map-side combined and cell-bounded, neither at event
    * scale (plan-pinned); pure report, suppression stays q52's job.
    */
  def q160LDiversity(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(expr("CAST(round(value * 100) AS BIGINT) DIV 5000"))
          .as("n_sens_bands"))
      .select(
        col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_events"), col("n_sens_bands"),
        (col("n_events") >= DiversityK && col("n_sens_bands") >= DiversityL)
          .as("publish"))


  /** q170: t-closeness audit — the third rung of the publication-privacy
    * ladder (q52 k-anonymity → q160 l-diversity → this). l-diversity still
    * leaks when a cell's sensitive values are *distinct but skewed* (all
    * high-value bands ⇒ membership reveals "a big spender"); t-closeness
    * bounds the distance between each cell's sensitive distribution and
    * the global one. Population unit here is the RECORD (event counts),
    * matching q52/q160's convention — the distribution being audited is
    * the distribution of published values; individual-level cell gating
    * is q186's job (which counts distinct users). Sensitive attribute =
    * q160's 50-unit value band (ordered, B = 5), so EMD has the closed
    * ordered form
    * (1/(B−1))·Σ_{b<B−1} |Σ_{i≤b}(p_i − q_i)|.
    *
    * Exactness: with p_i = c_i/n (cell) and q_i = g_i/N (global), every
    * cumulative term is scaled by n·N into the integer
    * cum_b = Σ_{i≤b}(c_i·N − g_i·n) — DECIMAL(38,0) products, exact at
    * any scale — and the publish flag is the cross-multiplied comparison
    * Σ|cum_b| ≤ t·(B−1)·n·N, which at t = 1/4, B−1 = 4 collapses to the
    * pure-integer Σ|cum_b| ≤ n·N (t chosen so no double ever decides the
    * gate). Only the REPORTED emd_bp rounds a double built from identical
    * integer operands on both engines.
    *
    * Shape: one scan → (cell, band) agg (partial-combined, ≤ cells×5
    * rows, localCheckpointed for its four consumers so the event scan
    * runs exactly once); the global distribution re-aggregates THAT
    * frame and broadcasts 5 rows + 1 total row back; the grid densify,
    * 5-row-deep cumsum window and final cell rollup all run on the
    * cells×5 frame — nothing after the first exchange is event-scale.
    */
  def q170TCloseness(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cellBand = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"),
        expr("least(greatest(CAST(round(value * 100) AS BIGINT) DIV 5000, 0), 4)").as("band"))
      .agg(count(lit(1)).as("cnt"))
      // cells×5-bounded; localCheckpoint so its FOUR consumers (grid,
      // global bands, total, main join) share one event scan — without it
      // each branch re-derives the aggregate from parquet (plan-audited)
      .localCheckpoint()
    // global band mass + corpus total, derived from the cell frame (no
    // second scan); 5 + 1 rows, broadcast back
    val glob = cellBand.groupBy(col("band")).agg(sum(col("cnt")).as("g"))
    val total = glob.agg(sum(col("g")).as("n_total"))
    // densify to the full cell × band-0..4 grid: EMD must see empty bands,
    // and both engines must see the SAME cell set
    val grid = cellBand.select(col("event_type"), col("day")).distinct()
      .select(col("event_type"), col("day"),
        explode(expr("sequence(CAST(0 AS BIGINT), CAST(4 AS BIGINT))")).as("band"))
    val wCell = Window.partitionBy(col("event_type"), col("day"))
    val wCum = wCell.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(cellBand, Seq("event_type", "day", "band"), "left")
      .join(broadcast(glob), Seq("band"), "left")
      // fill AFTER both joins — it is the join misses (cell or corpus
      // band with zero events) that produce the nulls; a pre-join fill on
      // glob was dead code and left g NULL for a corpus-empty band
      .na.fill(0L, Seq("cnt", "g"))
      .crossJoin(broadcast(total))
      .withColumn("n_cell", sum(col("cnt")).over(wCell))
      .withColumn("cum", sum(
        expr("CAST(cnt AS DECIMAL(38,0)) * n_total - CAST(g AS DECIMAL(38,0)) * n_cell"))
        .over(wCum))
      .groupBy(col("event_type"), col("day"))
      .agg(
        max(col("n_cell")).as("n_events"),
        // only the first B−1 cumulative terms enter the EMD (the last is 0
        // by construction, but band 4's term is EXCLUDED by definition)
        sum(when(col("band") < 4, abs(col("cum"))).otherwise(lit(0)))
          .as("sum_abs"),
        max(col("n_total")).as("n_total"))
      .select(
        col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_events"),
        expr("""CAST(round(10000.0 * CAST(sum_abs AS DOUBLE) /
                    (CAST(n_events AS DOUBLE) * CAST(n_total AS DOUBLE) * 4.0))
                  AS BIGINT)""").as("emd_bp"),
        // the gate itself: exact integers — Σ|cum| ≤ t·(B−1)·n·N collapses
        // to the pure Σ|cum| ≤ n·N at t = 1/4, B−1 = 4
        expr("""sum_abs <= CAST(n_events AS DECIMAL(38,0)) *
                           CAST(n_total AS DECIMAL(38,0))""").as("t_close"))
  }

  /** q186: k-anonymity by GENERALIZATION — the constructive half q52's
    * suppression leaves out: a sub-k (event_type, day) cell isn't
    * dropped, it's COARSENED up a fixed hierarchy (day → ISO-agnostic
    * epoch week → per-type total) until its population reaches k, so the
    * published table keeps every row's mass at the finest granularity
    * that is safe to show. Levels nest exactly (days nest in epoch
    * weeks; weeks nest in the per-type total — deliberately NOT
    * calendar months, which epoch weeks straddle), so each row of input
    * lands in exactly ONE published cell and totals reconcile. The
    * terminal level carries `publishable = n_users ≥ k` honestly — a
    * type so thin that even its total is sub-k is flagged, not silently
    * shown.
    *
    * Anonymity unit: the INDIVIDUAL, not the record — the gate counts
    * DISTINCT users per cell (a cell holding k events all from one user
    * identifies that user exactly; q52's record-level convention is the
    * weaker guarantee this deliberately upgrades). The cascade therefore
    * carries a (cell, user) grain frame: distinct-user counts do NOT sum
    * across days (one user active twice in a week is one individual), so
    * each failing level re-collapses users at the coarser key before
    * counting.
    *
    * Shape: one event-scale aggregate to the (type, day, user) grain,
    * then day totals; the cascade re-aggregates only the FAILING cells'
    * user rows (cell-bounded frames, localCheckpointed once each for
    * their pass/fail double-read; the failing-key join sides are
    * cell-bounded and broadcast). Exact integer counts/cents throughout.
    */
  def q186KanonGeneralize(s: SparkSession, dir: String): DataFrame = {
    val k = SuppressK
    // (type, day, user) grain: one row per individual per cell — the
    // frame every level's distinct-user count collapses from
    val ud = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d"),
        col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .localCheckpoint() // day rollup + week cascade both read it
    val day = ud.groupBy(col("event_type"), col("d"))
      .agg(sum(col("n")).as("n"), count(lit(1)).as("n_users"),
        sum(col("cents")).as("cents"))
      .localCheckpoint() // pass + fail both read it
    val dayPass = day.filter(col("n_users") >= k)
      .select(col("event_type"), lit("day").as("granularity"),
        expr("date_format(date_add(DATE'1970-01-01', CAST(d AS INT)), 'yyyy-MM-dd')")
          .as("period"),
        col("n").as("n_events"), col("n_users"), col("cents").as("value_cents"),
        lit(true).as("publishable"))
    // failing days' user rows, re-collapsed per user at the week key
    val uw = ud
      .join(broadcast(day.filter(col("n_users") < k)
        .select(col("event_type"), col("d"))), Seq("event_type", "d"))
      .groupBy(col("event_type"), expr("d DIV 7").as("w"), col("user_id"))
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
      .localCheckpoint() // week rollup + terminal cascade both read it
    val week = uw.groupBy(col("event_type"), col("w"))
      .agg(sum(col("n")).as("n"), count(lit(1)).as("n_users"),
        sum(col("cents")).as("cents"))
      .localCheckpoint()
    val weekPass = week.filter(col("n_users") >= k)
      .select(col("event_type"), lit("week").as("granularity"),
        concat(lit("W"), col("w").cast("string")).as("period"),
        col("n").as("n_events"), col("n_users"), col("cents").as("value_cents"),
        lit(true).as("publishable"))
    val rest = uw
      .join(broadcast(week.filter(col("n_users") < k)
        .select(col("event_type"), col("w"))), Seq("event_type", "w"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), count(lit(1)).as("n_users"),
        sum(col("cents")).as("cents"))
      .select(col("event_type"), lit("all").as("granularity"),
        lit("*").as("period"),
        col("n").as("n_events"), col("n_users"), col("cents").as("value_cents"),
        (col("n_users") >= k).as("publishable"))
    dayPass.unionByName(weekPass).unionByName(rest)
  }

  /** PII patterns shared by the Spark plan and the DuckDB oracle — kept to
    * syntax both Java regex and RE2 interpret identically (no lookaround,
    * ASCII \d classes, explicit alternation).
    */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhoneRe = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
  private[graft] val SsnRe   = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  /** Free-text PII scrub: emails → <EMAIL>, phone numbers → <PHONE>,
    * SSN-shaped ids → <ID>, applied in that order (email first so the
    * digit patterns never fire inside an address). A pure projection —
    * three codegen'd regexp passes per document, no shuffle at any scale.
    */
  private[graft] def redactText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        SsnRe, "<ID>"),
      PhoneRe, "<PHONE>")

  /** q57: PII detection + redaction over `documents.text` — the corpus
    * scrubbing stage of an LLM-training-data pipeline: per-document counts
    * of each PII class plus the redacted text itself. The synthetic corpus
    * is PII-free (counts 0, text unchanged — the oracle still gates the
    * full redacted output byte-for-byte); PrivacySpec injects synthetic
    * emails/phones/SSNs and asserts the actual rewrites.
    */
  def q57PiiRedact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        regexp_count(col("text"), lit(EmailRe)).as("n_emails"),
        regexp_count(col("text"), lit(PhoneRe)).as("n_phones"),
        regexp_count(col("text"), lit(SsnRe)).as("n_ids"),
        redactText(col("text")).as("redacted_text"))

  /** Engine-portable uniform draw in [0, 2³²): the first 8 hex digits of
    * md5(key), accumulated digit-by-digit with instr over the hex
    * alphabet — q68's two-digit coin widened to 32 bits. ONE formula
    * string feeds both the Spark plan and the DuckDB oracle (the q99
    * shared-builder rule), so the draw cannot drift between engines.
    */
  private def u32Sql(keyExpr: String): String =
    (1 to 8).map { i =>
      val p = 1L << (4 * (8 - i))
      s"CAST(instr('0123456789abcdef', substring(md5($keyExpr), $i, 1)) - 1 AS BIGINT) * $p"
    }.mkString("(", " + ", ")")

  /** u = (u32 + 0.5)/2³² ∈ (0,1) — computed ONCE per row into a named
    * column/CTE (the 8-term md5 chain would otherwise be re-evaluated per
    * reference: three times inside the Laplace CASE).
    */
  private[graft] def dpUniformSql(keyExpr: String): String =
    s"(CAST(${u32Sql(keyExpr)} AS DOUBLE) + 0.5) / 4294967296.0"

  /** Seeded Laplace(scale=1/ε) noise via inverse-CDF over a bound uniform
    * column `u`. ln() gets the q142 treatment — the final noise is rounded
    * to an INTEGER count perturbation, so a last-ulp ln() divergence flips
    * nothing unless it lands within one ulp of a .5 boundary.
    */
  private[graft] def dpNoiseFromU(u: String, epsilon: Double): String =
    s"""CAST(round(CASE WHEN $u < 0.5
                        THEN ln(2.0 * $u) / $epsilon
                        ELSE -ln(2.0 * (1.0 - $u)) / $epsilon END)
            AS BIGINT)"""

  /** q262's swept ε values — code-owned; the oracle inlines the same
    * literals. */
  private[graft] val DpEpsSweep = Seq(0.1, 0.5, 1.0, 2.0, 10.0)

  /** q262: DP ε-UTILITY sweep — the privacy-budget knob table beside
    * q260's k curve: per ε ∈ {0.1 … 10}, what q148's mechanism costs in
    * accuracy on THIS cell table — noisy-vs-true absolute error (sum,
    * max, and as bp of the true mass) plus how many cells the 0-clamp
    * zeroed. ε is a budget someone must pick; this prices each candidate
    * on the actual release, not on textbook asymptotics. The per-cell
    * uniform draw is SHARED across the sweep (one seeded u per cell, the
    * q148 machinery), so the curve isolates the ε scaling rather than
    * re-rolling noise per point.
    *
    * Exactness: the noise is the exact q148 expression per ε (integer
    * count perturbation); errors are integer; one all-positive DIV.
    *
    * Shape: ONE cells aggregate (checkpointed), 5 projections over the
    * |cells| frame, a 5-row answer.
    */
  def q262DpEpsilonSweep(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(s, dir)
      .groupBy(col("o_orderstatus").as("status"),
        expr("CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT)").as("yr"))
      .agg(count(lit(1)).as("n"))
      .withColumn("u", expr(dpUniformSql(dpCellKey)))
      .localCheckpoint() // one seeded cell table feeds every sweep point
    DpEpsSweep.map { eps =>
      cells
        .select(col("n"), expr(
          s"greatest(CAST(0 AS BIGINT), n + ${dpNoiseFromU("u", eps)})")
          .as("noisy"))
        .agg(count(lit(1)).as("n_cells"),
          sum(col("n")).as("n_true"),
          sum(expr("abs(noisy - n)")).as("abs_err_sum"),
          max(expr("abs(noisy - n)")).as("max_abs_err"),
          sum(when(col("noisy") === 0L && col("n") > 0L, 1L).otherwise(0L))
            .as("n_cells_zeroed"))
        .select(lit(eps).as("epsilon"), col("n_cells"), col("n_true"),
          col("abs_err_sum"), col("max_abs_err"), col("n_cells_zeroed"),
          expr("(abs_err_sum * 10000) DIV n_true").as("err_bp"))
    }.reduce(_ unionByName _)
  }

  /** q148: ε-differentially-private published counts — the publication
    * layer's strongest guarantee, beyond q52's k-anonymity: per-cell
    * Laplace(1/ε) noise on (status, order-year) order counts, clamped at
    * 0. The noise is SEEDED (md5 of the cell key) so releases are
    * reproducible and the oracle can mirror them — a production release
    * would draw real randomness and keep ε-accounting across releases;
    * the mechanism, sensitivity-1 count shape, clamping and scale are
    * exactly what it would run. One aggregation; noise is a projection
    * over the |cells|-row result.
    */
  def q148DpCounts(s: SparkSession, dir: String): DataFrame = {
    val eps = 1.0
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus").as("status"),
        expr("CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT)").as("yr"))
      .agg(count(lit(1)).as("n"))
      .withColumn("u", expr(dpUniformSql(dpCellKey)))
      .select(col("status"), col("yr"),
        expr(s"greatest(CAST(0 AS BIGINT), n + ${dpNoiseFromU("u", eps)})")
          .as("n_noisy"),
        lit(eps).as("epsilon"))
  }

  /** The DP cell key expression, shared verbatim with the oracle. */
  private val dpCellKey = "concat(status, '|', CAST(yr AS STRING))"

  /** Clamp ceiling for DP released MEANS (cents), applied to each USER's
    * total per-cell contribution. The analyst-declared bound IS the
    * sensitivity: one individual — however many events they emit — moves
    * the clamped sum by at most this, so the Laplace scale follows from
    * it; contributions are truncated BEFORE the cell aggregation (the
    * clamp is part of the mechanism, not cosmetics; without it a single
    * outlier user would need unbounded noise).
    */
  private val DpClampCents = 50000L

  private def dpMeanKey(suffix: String): String =
    s"concat(event_type, '|', CAST(mo AS STRING), '$suffix')"

  /** q185: ε-DP released MEANS — q148's mechanism extended from counts to
    * a bounded numeric: per (event_type, month), the mean PER-USER
    * contribution is released as noisy-sum / noisy-count with the budget
    * split ε/2 + ε/2 (sequential composition over the two queries).
    *
    * Adjacency unit: USER-level (add/remove one individual), not
    * record-level — each user's total contribution to a cell is bounded
    * BEFORE aggregation: per-event cents floor at 0, the user's cell sum
    * caps at [[DpClampCents]], and the count counts USERS, not events.
    * One individual therefore moves the sum by ≤ DpClampCents and the
    * count by ≤ 1 regardless of how many events they emit — the released
    * ε genuinely covers multi-event individuals (a record-level variant
    * would silently degrade to m·ε for a user with m events). Both draws
    * are SEEDED from the cell key with distinct suffixes (two independent
    * uniforms per cell — reusing one draw would correlate numerator and
    * denominator noise), reproducible and oracle-mirrored exactly like
    * q148; the released mean floors a nonnegative integer division.
    * Two map-side-combining aggregations (events → user-cell → cell);
    * the noise is a |cells|-row projection.
    */
  def q185DpMeans(s: SparkSession, dir: String): DataFrame = {
    val eps = 1.0
    Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("CAST(month(CAST(ts AS DATE)) AS BIGINT)").as("mo"),
        col("user_id"))
      .agg(sum(expr("greatest(CAST(round(value * 100) AS BIGINT), 0)"))
        .as("u_cents"))
      .groupBy(col("event_type"), col("mo"))
      .agg(count(lit(1)).as("n"),
        sum(expr(s"least(u_cents, $DpClampCents)")).as("s_cents"))
      .withColumn("us", expr(dpUniformSql(dpMeanKey("|s"))))
      .withColumn("uc", expr(dpUniformSql(dpMeanKey("|c"))))
      .select(col("event_type"), col("mo"),
        expr(s"greatest(CAST(0 AS BIGINT), n + ${dpNoiseFromU("uc", eps / 2.0)})")
          .as("n_noisy"),
        expr(s"greatest(CAST(0 AS BIGINT), s_cents + ${dpNoiseFromU("us", eps / (2.0 * DpClampCents))})")
          .as("sum_noisy_cents"))
      .withColumn("mean_cents", expr("sum_noisy_cents DIV greatest(n_noisy, 1)"))
      .withColumn("epsilon", lit(eps))
  }

  /** q241: RE-IDENTIFICATION risk profile — the exposure census run
    * BEFORE choosing q52's k / q186's generalization ladder: customers
    * grouped into equivalence classes by the quasi-identifier tuple
    * (nation, market segment, 100-unit balance band) and the class-size
    * distribution reported as the k-bucket table {1, 2, 3, 4, 5, 6+}:
    * n_classes, n_rows and row-share bp per bucket. Bucket 1 IS the
    * directly re-identifiable population (a unique QI tuple — the
    * Sweeney linkage attack needs nothing else); the share mass below
    * the intended k is exactly what suppression/generalization will have
    * to move, priced before any rewrite.
    *
    * Exactness: the balance band is floor(double/100) — one IEEE op,
    * identical on both engines (q51's banding rule); everything after is
    * pure integer counts, shares all-positive DIVs, the 1..6 grid
    * left-joined so empty buckets row with zeros (the q216 lesson).
    *
    * Shape: one scan → QI-cell agg (map-side combined, bounded by the QI
    * domain |nations|×|segments|×|bands|) → ≤ 6-row bucket fold; the
    * total rides as a broadcast 1-row agg.
    */
  def q241ReidRisk(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.customer(s, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(floor(c_acctbal / 100.0) AS BIGINT)").as("bal_band"))
      .agg(count(lit(1)).as("k"))
      .withColumn("k_bucket", expr("least(k, CAST(6 AS BIGINT))"))
      .groupBy(col("k_bucket"))
      .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_rows"))
      .localCheckpoint() // two consumers: the grid join + the total
    val tot = cells.agg(sum(col("n_rows")).as("n_total"))
    s.range(1, 7).select(col("id").as("k_bucket"))
      .join(cells, Seq("k_bucket"), "left")
      .na.fill(0L, Seq("n_classes", "n_rows"))
      .crossJoin(broadcast(tot))
      .select(col("k_bucket"), col("n_classes"), col("n_rows"),
        expr("(n_rows * 10000) DIV n_total").as("share_bp"))
  }

  /** q287's swept quasi-identifier sets — code-owned like q260's k list;
    * the oracle is GENERATED from the same list. The full trio is q241's
    * QI set and is flagged as the production row. */
  private[graft] val QiSets: Seq[(String, Seq[String], Boolean)] = Seq(
    ("segment", Seq("c_mktsegment"), false),
    ("nation", Seq("c_nationkey"), false),
    ("nation+segment", Seq("c_nationkey", "c_mktsegment"), false),
    ("nation+segment+bal", Seq("c_nationkey", "c_mktsegment", "bal_band"), true))

  /** q287: QI-SET risk sweep — the "which columns can we publish"
    * decision table: per candidate quasi-identifier set (nested coarse →
    * fine, ending at q241's production trio), the equivalence-class
    * census a release review actually reads — class count, worst-case
    * min k, singleton classes (unique individuals), and the share of
    * rows living in classes under k = 10. q241 censuses ONE set's k
    * distribution; this prices the publication axis itself — each added
    * column multiplies the class count and collapses k, and the row
    * where min_k hits 1 is where the release stops. Shares q241's
    * bal-band discretization literally.
    *
    * Scale shape: one projected dim scan checkpointed, then one
    * map-side-combined fold per set over it (|sets| tiny); each fold is
    * bounded by its QI domain.
    */
  def q287QiRiskSweep(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(floor(c_acctbal / 100.0) AS BIGINT)").as("bal_band"))
      .localCheckpoint()
    QiSets.map { case (name, qiCols, prod) =>
      base.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("k"))
        .agg(count(lit(1)).as("n_classes"), min(col("k")).as("min_k"),
          sum(when(col("k") === 1, 1L).otherwise(0L)).as("n_singletons"),
          sum(when(col("k") < 10, col("k")).otherwise(0L)).as("under10"),
          sum(col("k")).as("n_rows"))
        .select(lit(name).as("qi_set"), lit(prod).as("is_production"),
          col("n_classes"), col("min_k"), col("n_singletons"),
          expr("under10 * 10000 DIV n_rows").as("rows_under_10_bp"))
    }.reduce(_ unionByName _)
  }

  /** q260's swept k values — code-owned like q147's rule table; the
    * oracle inlines the same literals. */
  private[graft] val KanonKs = Seq(2L, 5L, 10L, 20L, 50L)

  /** q260: k-anonymity SUPPRESSION curve — the knob table read before
    * fixing q52's k (q210's role on the privacy axis): per k ∈
    * {2, 5, 10, 20, 50}, how many (event_type, day) cells fall under the
    * bar, how many events their suppression hides, and the hidden share
    * in bp. Privacy k is a trade against publication completeness; this
    * is the table where the trade is priced BEFORE a k is committed
    * (read with q241's k-census: q241 says how exposed the corpus is,
    * this says what each k costs to publish).
    *
    * Exactness: pure integer counts off ONE cells aggregate; the sweep
    * explodes the 5-literal k array per cell (bounded fan-out), never
    * re-scanning events; all-positive DIV.
    */
  def q260KanonKCurve(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .select(col("n"), explode(array(KanonKs.map(lit(_)): _*)).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_cells"),
        sum(when(col("n") < col("k"), 1L).otherwise(0L))
          .as("n_suppressed_cells"),
        sum(col("n")).as("n_events"),
        sum(when(col("n") < col("k"), col("n")).otherwise(lit(0L)))
          .as("events_suppressed"))
      .select(col("k"), col("n_cells"), col("n_suppressed_cells"),
        (col("n_cells") - col("n_suppressed_cells")).as("n_published_cells"),
        col("events_suppressed"),
        expr("(events_suppressed * 10000) DIV n_events").as("suppressed_bp"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q287_qi_risk_sweep" -> (q287QiRiskSweep _),
    "q260_kanon_k_curve" -> (q260KanonKCurve _),
    "q241_reid_risk" -> (q241ReidRisk _),
    "q148_dp_counts" -> (q148DpCounts _),
    "q262_dp_epsilon_sweep" -> (q262DpEpsilonSweep _),
    "q51_anonymize"      -> (q51Anonymize _),
    "q52_kanon_suppress" -> (q52KanonSuppress _),
    "q160_l_diversity"   -> (q160LDiversity _),
    "q170_t_closeness"   -> (q170TCloseness _),
    "q185_dp_means"      -> (q185DpMeans _),
    "q186_kanon_generalize" -> (q186KanonGeneralize _),
    "q57_pii_redact"     -> (q57PiiRedact _))

  val oracles: Map[String, String] = Map(
    "q287_qi_risk_sweep" -> {
      // one aggregate per QI set, generated from the SAME QiSets list
      val rows = QiSets.map { case (name, qiCols, prod) =>
        s"""SELECT '$name' AS qi_set, $prod AS is_production,
              count(*) AS n_classes,
              CAST(min(k) AS BIGINT) AS min_k,
              CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
              CAST(sum(CASE WHEN k < 10 THEN k ELSE 0 END) AS BIGINT) * 10000
                // CAST(sum(k) AS BIGINT) AS rows_under_10_bp
           FROM (SELECT count(*) AS k FROM c GROUP BY ${qiCols.mkString(", ")})"""
      }.mkString("\nUNION ALL\n")
      s"""WITH c AS (SELECT c_nationkey, c_mktsegment,
                            CAST(floor(c_acctbal / 100.0) AS BIGINT) AS bal_band
                     FROM customer)
          $rows"""
    },
    "q260_kanon_k_curve" -> {
      val ks = KanonKs.mkString(", ")
      s"""WITH cells AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          ks AS (SELECT CAST(unnest([$ks]) AS BIGINT) AS k),
          j AS (SELECT k, n FROM cells CROSS JOIN ks)
          SELECT k, CAST(count(*) AS BIGINT) AS n_cells,
                 CAST(sum(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_suppressed_cells,
                 CAST(count(*) - sum(CASE WHEN n < k THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_published_cells,
                 CAST(sum(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT)
                   AS events_suppressed,
                 (CAST(sum(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT)
                   * 10000) // CAST(sum(n) AS BIGINT) AS suppressed_bp
          FROM j GROUP BY 1""" },
    "q241_reid_risk" ->
      """WITH cells AS (
           SELECT c_nationkey, c_mktsegment,
                  CAST(floor(c_acctbal / 100.0) AS BIGINT) AS bal_band,
                  CAST(count(*) AS BIGINT) AS k
           FROM customer GROUP BY 1, 2, 3),
         b AS (
           SELECT least(k, 6) AS k_bucket,
                  CAST(count(*) AS BIGINT) AS n_classes,
                  CAST(sum(k) AS BIGINT) AS n_rows
           FROM cells GROUP BY 1),
         tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM b),
         grid AS (SELECT unnest(generate_series(1, 6)) AS k_bucket)
         SELECT g.k_bucket, coalesce(b.n_classes, 0) AS n_classes,
                coalesce(b.n_rows, 0) AS n_rows,
                (coalesce(b.n_rows, 0) * 10000) // n_total AS share_bp
         FROM grid g LEFT JOIN b USING (k_bucket) CROSS JOIN tot""",
    "q262_dp_epsilon_sweep" -> {
      val per = DpEpsSweep.zipWithIndex.map { case (eps, i) =>
        (s"""e$i AS (SELECT n, greatest(CAST(0 AS BIGINT),
                       n + ${dpNoiseFromU("u", eps)}) AS noisy
                   FROM seeded)""",
          s"""SELECT $eps AS epsilon, CAST(count(*) AS BIGINT) AS n_cells,
                 CAST(sum(n) AS BIGINT) AS n_true,
                 CAST(sum(abs(noisy - n)) AS BIGINT) AS abs_err_sum,
                 CAST(max(abs(noisy - n)) AS BIGINT) AS max_abs_err,
                 CAST(sum(CASE WHEN noisy = 0 AND n > 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_cells_zeroed,
                 (CAST(sum(abs(noisy - n)) AS BIGINT) * 10000)
                   // CAST(sum(n) AS BIGINT) AS err_bp
          FROM e$i""")
      }
      s"""WITH cells AS (
            SELECT o_orderstatus AS status,
                   CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY 1, 2),
          seeded AS (SELECT status, yr, n, ${dpUniformSql(dpCellKey)} AS u
                     FROM cells),
          ${per.map(_._1).mkString(",\n          ")}
          ${per.map(_._2).mkString("\nUNION ALL\n")}"""
    },
    "q148_dp_counts" ->
      s"""WITH cells AS (
           SELECT o_orderstatus AS status,
                  CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders GROUP BY 1, 2),
         seeded AS (
           SELECT status, yr, n, ${dpUniformSql(dpCellKey)} AS u FROM cells)
         SELECT status, yr,
                greatest(CAST(0 AS BIGINT), n + ${dpNoiseFromU("u", 1.0)}) AS n_noisy,
                1.0 AS epsilon
         FROM seeded""",
    "q51_anonymize" ->
      s"""SELECT event_id,
                 sha256('$Salt' || CAST(user_id AS VARCHAR)) AS user_pseudo,
                 date_trunc('hour', ts) AS ts_hour,
                 event_type,
                 floor(value / 10.0) * 10.0 AS value_band
          FROM events""",
    "q186_kanon_generalize" ->
      s"""WITH ud AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS d, user_id,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
            FROM events GROUP BY 1, 2, 3),
          day AS (
            SELECT event_type, d,
                   CAST(sum(n) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(cents) AS BIGINT) AS cents
            FROM ud GROUP BY 1, 2),
          day_pass AS (
            SELECT event_type, 'day' AS granularity,
                   strftime(DATE '1970-01-01' + CAST(d AS INTEGER), '%Y-%m-%d') AS period,
                   n AS n_events, n_users, cents AS value_cents, true AS publishable
            FROM day WHERE n_users >= $SuppressK),
          uw AS (
            SELECT ud.event_type, ud.d // 7 AS w, ud.user_id,
                   CAST(sum(ud.n) AS BIGINT) AS n,
                   CAST(sum(ud.cents) AS BIGINT) AS cents
            FROM ud JOIN day ON day.event_type = ud.event_type AND day.d = ud.d
            WHERE day.n_users < $SuppressK GROUP BY 1, 2, 3),
          wk AS (
            SELECT event_type, w,
                   CAST(sum(n) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(cents) AS BIGINT) AS cents
            FROM uw GROUP BY 1, 2),
          wk_pass AS (
            SELECT event_type, 'week' AS granularity,
                   'W' || CAST(w AS VARCHAR) AS period,
                   n AS n_events, n_users, cents AS value_cents, true AS publishable
            FROM wk WHERE n_users >= $SuppressK),
          ru AS (
            SELECT uw.event_type, uw.user_id,
                   CAST(sum(uw.n) AS BIGINT) AS n,
                   CAST(sum(uw.cents) AS BIGINT) AS cents
            FROM uw JOIN wk ON wk.event_type = uw.event_type AND wk.w = uw.w
            WHERE wk.n_users < $SuppressK GROUP BY 1, 2),
          rest AS (
            SELECT event_type, 'all' AS granularity, '*' AS period,
                   CAST(sum(n) AS BIGINT) AS n_events,
                   CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(cents) AS BIGINT) AS value_cents,
                   count(*) >= $SuppressK AS publishable
            FROM ru GROUP BY 1)
          SELECT * FROM day_pass
          UNION ALL SELECT * FROM wk_pass
          UNION ALL SELECT * FROM rest""",
    "q185_dp_means" ->
      s"""WITH uc AS (
            SELECT event_type, CAST(month(CAST(ts AS DATE)) AS BIGINT) AS mo,
                   user_id,
                   CAST(sum(greatest(CAST(round(value * 100) AS BIGINT), 0))
                        AS BIGINT) AS u_cents
            FROM events GROUP BY 1, 2, 3),
          cells AS (
            SELECT event_type, mo,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(least(u_cents, $DpClampCents)) AS BIGINT) AS s_cents
            FROM uc GROUP BY 1, 2),
          seeded AS (
            SELECT *, ${dpUniformSql(dpMeanKey("|s"))} AS us,
                      ${dpUniformSql(dpMeanKey("|c"))} AS uc
            FROM cells),
          noised AS (
            SELECT event_type, mo,
                   greatest(CAST(0 AS BIGINT), n + ${dpNoiseFromU("uc", 0.5)}) AS n_noisy,
                   greatest(CAST(0 AS BIGINT), s_cents + ${dpNoiseFromU("us", 1.0 / (2.0 * DpClampCents))}) AS sum_noisy_cents
            FROM seeded)
          SELECT event_type, mo, n_noisy, sum_noisy_cents,
                 sum_noisy_cents // greatest(n_noisy, 1) AS mean_cents,
                 1.0 AS epsilon
          FROM noised""",
    "q170_t_closeness" ->
      // oracle-local HUGEINT where Spark widens to DECIMAL(38,0) — the
      // usual int128-vs-decimal split; every compared value is an exact
      // integer on both engines
      """WITH cb AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  least(greatest(CAST(round(value * 100) AS BIGINT) // 5000, 0), 4) AS band,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2, 3),
         gb AS (SELECT band, CAST(sum(cnt) AS BIGINT) AS g FROM cb GROUP BY 1),
         tot AS (SELECT CAST(sum(g) AS BIGINT) AS n_total FROM gb),
         grid AS (
           SELECT c.event_type, c.day, b.band
           FROM (SELECT DISTINCT event_type, day FROM cb) c
           CROSS JOIN (SELECT unnest(range(0, 5)) AS band) b),
         j AS (
           SELECT grid.event_type, grid.day, grid.band,
                  coalesce(cb.cnt, 0) AS cnt, coalesce(gl.g, 0) AS g, t.n_total
           FROM grid
           LEFT JOIN cb ON cb.event_type = grid.event_type
                       AND cb.day = grid.day AND cb.band = grid.band
           LEFT JOIN gb gl ON gl.band = grid.band
           CROSS JOIN tot t),
         w1 AS (
           SELECT *, CAST(sum(cnt) OVER (PARTITION BY event_type, day) AS BIGINT) AS n_cell
           FROM j),
         w2 AS (
           SELECT *, sum(CAST(cnt AS HUGEINT) * n_total - CAST(g AS HUGEINT) * n_cell)
                       OVER (PARTITION BY event_type, day ORDER BY band
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM w1),
         cells AS (
           SELECT event_type, day,
                  max(n_cell) AS n_events,
                  sum(CASE WHEN band < 4 THEN abs(cum) ELSE 0 END) AS sum_abs,
                  max(n_total) AS n_total
           FROM w2 GROUP BY 1, 2)
         SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_events,
                CAST(round(10000.0 * CAST(sum_abs AS DOUBLE) /
                      (CAST(n_events AS DOUBLE) * CAST(n_total AS DOUBLE) * 4.0))
                  AS BIGINT) AS emd_bp,
                sum_abs <= CAST(n_events AS HUGEINT) * CAST(n_total AS HUGEINT) AS t_close
         FROM cells""",
    "q160_l_diversity" ->
      s"""WITH g AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT CAST(round(value * 100) AS BIGINT) // 5000)
                        AS BIGINT) AS n_sens_bands
            FROM events GROUP BY 1, 2)
          SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
                 n_events, n_sens_bands,
                 n_events >= $DiversityK AND n_sens_bands >= $DiversityL AS publish
          FROM g""",
    "q52_kanon_suppress" ->
      s"""WITH g AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   count(*) AS n, sum(value) AS v
            FROM events GROUP BY 1, 2)
          SELECT event_type,
                 CASE WHEN n >= $SuppressK THEN strftime(day, '%Y-%m-%d') END AS day_pub,
                 CAST(sum(n) AS BIGINT) AS n_events,
                 CAST(round(sum(CAST(v AS DECIMAL(8,2))), 2) AS DOUBLE) AS total_value
          FROM g GROUP BY 1, 2""",
    "q57_pii_redact" ->
      s"""SELECT doc_id,
                 len(regexp_extract_all(text, '$EmailRe')) AS n_emails,
                 len(regexp_extract_all(text, '$PhoneRe')) AS n_phones,
                 len(regexp_extract_all(text, '$SsnRe')) AS n_ids,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
                     '$SsnRe', '<ID>', 'g'),
                   '$PhoneRe', '<PHONE>', 'g') AS redacted_text
          FROM documents""")
}
