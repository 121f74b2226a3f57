package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Q-block: data-quality validation — the audit report a pipeline's clean
  * step publishes alongside the data (row counts, null counts, domain
  * violations, referential orphans). Everything is a single-pass aggregate
  * (conditional sums over one scan) plus one anti-join probe, so the audit
  * costs one read of the audited table at any scale.
  */
object Quality {

  /** q55: QA report over lineitem — one row of audit counters:
    * row count, key/date nulls, domain violations (negative/zero quantity,
    * discount outside [0, 0.5], tax outside [0, 0.2], non-positive price),
    * and orphaned orderkeys (no parent order — referential integrity via a
    * left-anti count folded into the same output row).
    */
  def q55QaReport(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val violation = (c: org.apache.spark.sql.Column) =>
      sum(when(c, 1L).otherwise(0L))
    val base = li.agg(
      count(lit(1)).as("n_rows"),
      violation(col("l_orderkey").isNull).as("n_null_orderkey"),
      violation(col("l_shipdate").isNull).as("n_null_shipdate"),
      violation(col("l_quantity") <= 0).as("n_bad_quantity"),
      violation(col("l_discount") < 0 || col("l_discount") > 0.5).as("n_bad_discount"),
      violation(col("l_tax") < 0 || col("l_tax") > 0.2).as("n_bad_tax"),
      violation(col("l_extendedprice") <= 0).as("n_bad_price"))
    val orphans = li
      .join(Tables.orders(s, dir).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_lineitems"))
    base.crossJoin(orphans)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_qa_report" -> (q55QaReport _))

  val oracles: Map[String, String] = Map(
    "q55_qa_report" ->
      """WITH base AS (
           SELECT count(*) AS n_rows,
                  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_orderkey,
                  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_shipdate,
                  CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_quantity,
                  CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_discount,
                  CAST(sum(CASE WHEN l_tax < 0 OR l_tax > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_tax,
                  CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_price
           FROM lineitem),
         orph AS (
           -- NOT EXISTS (not NOT IN): matches left_anti's null semantics —
           -- a NULL l_orderkey counts as an orphan, and a NULL o_orderkey
           -- can't empty the result the way NOT IN would
           SELECT count(*) AS n_orphan_lineitems
           FROM lineitem l
           WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
         SELECT * FROM base CROSS JOIN orph""")
}
