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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_anonymize"      -> (q51Anonymize _),
    "q52_kanon_suppress" -> (q52KanonSuppress _))

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
          FROM g GROUP BY 1, 2""")
}
