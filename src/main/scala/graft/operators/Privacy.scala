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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_anonymize"      -> (q51Anonymize _),
    "q52_kanon_suppress" -> (q52KanonSuppress _),
    "q57_pii_redact"     -> (q57PiiRedact _))

  val oracles: Map[String, String] = Map(
    "q51_anonymize" ->
      s"""SELECT event_id,
                 sha256('$Salt' || CAST(user_id AS VARCHAR)) AS user_pseudo,
                 date_trunc('hour', ts) AS ts_hour,
                 event_type,
                 floor(value / 10.0) * 10.0 AS value_band
          FROM events""",
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
