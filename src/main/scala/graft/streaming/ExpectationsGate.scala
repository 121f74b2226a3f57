package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Quality

/** s15: streaming data-contract gate — q147's declarative expectations run
  * per micro-batch BEFORE the batch may publish: a batch in which every
  * rule passes lands in the published table; a batch violating any rule is
  * diverted whole to a quarantine area with its per-rule audit report, so
  * bad upstream data can never poison the serving copy and the quarantined
  * original is preserved byte-for-byte for replay after the upstream fix.
  *
  * Both destinations use the atomic generation commit (RollupSink's
  * rename idiom, third use): data + batch id become visible in one rename
  * and replays of a committed id are no-ops — so the gate is idempotent
  * under foreachBatch's at-least-once delivery. Per batch the audit is
  * ONE partial-aggregated pass over the (micro-batch-sized) frame; the
  * gate's decision reads |rules| rows.
  */
object ExpectationsGate {

  /** Events-shaped default contract (the lineitem rules are q147's). */
  val eventRules: Seq[(String, String)] = Seq(
    "value_nonneg"  -> "value >= 0",
    "type_domain"   -> "event_type IN ('click', 'view', 'purchase', 'signup', 'error')",
    "ts_present"    -> "ts IS NOT NULL",
    "user_present"  -> "user_id IS NOT NULL")

  /** Atomically publish `df` as `<root>/gen=<batchId>` ([[AtomicGen]]);
    * no-op if that generation already committed (replay). */
  private def commitGen(s: SparkSession, root: String, batchId: Long, df: DataFrame): Unit = {
    AtomicGen.publish(s, root, batchId) { staged =>
      df.write.mode("overwrite").parquet(staged)
    }: Unit
  }

  /** Gate one batch: audit, then publish or quarantine atomically. The
    * audit report always commits beside the data (the publication trail an
    * operator reads first when the quarantine fills up). Returns pass.
    */
  private[graft] def gateBatch(s: SparkSession, batch: DataFrame, batchId: Long,
      publishDir: String, quarantineDir: String,
      rules: Seq[(String, String)]): Boolean = {
    // Idempotence is a PER-DECISION property here, not per-root: a replayed
    // batch id could reach the OTHER gate decision (rule list edited across
    // a restart, upstream re-read differing) and commit under both roots.
    // So the replay guard checks both destinations up front — whichever
    // decision committed first is THE decision for this batch id.
    if (AtomicGen.committed(s, publishDir, batchId)) return true
    if (AtomicGen.committed(s, quarantineDir, batchId)) return false
    // one aggregate pass; the decision frame is |rules| rows
    val report = Quality.expectationsReport(batch, rules)
      .withColumn("batch_id", lit(batchId))
    val reportRows = report.collect()
    val pass = reportRows.forall(_.getAs[Boolean]("pass"))
    val dataRoot = if (pass) publishDir else quarantineDir
    commitGen(s, dataRoot, batchId, batch)
    commitGen(s, s"$dataRoot/_audit", batchId,
      s.createDataFrame(s.sparkContext.parallelize(reportRows.toSeq, 1), report.schema))
    pass
  }

  /** The streaming entry: every micro-batch passes the contract or is
    * quarantined whole. foreachBatch because the sink is a transactional
    * per-batch publish decision, not a row append. `checkpointDir` is
    * REQUIRED (the CrawlIngest/CommitLogSink contract): without a durable
    * checkpoint a restarted query resets batch ids to 0 and the
    * committed-generation replay guard would silently swallow the new
    * run's data under the reused ids.
    */
  def gatedStream(s: SparkSession, stream: DataFrame, publishDir: String,
      quarantineDir: String, checkpointDir: String,
      rules: Seq[(String, String)] = eventRules): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        gateBatch(s, batch.toDF(), batchId, publishDir, quarantineDir, rules): Unit
      }
      .start()
}
