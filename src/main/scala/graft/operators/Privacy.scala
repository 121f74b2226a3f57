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
        round(sum(col("v")), 2).as("total_value"))

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q148_dp_counts" -> (q148DpCounts _),
    "q51_anonymize"      -> (q51Anonymize _),
    "q52_kanon_suppress" -> (q52KanonSuppress _),
    "q160_l_diversity"   -> (q160LDiversity _),
    "q57_pii_redact"     -> (q57PiiRedact _))

  val oracles: Map[String, String] = Map(
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
                 round(sum(v), 2) AS total_value
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
