package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.TextAnalysis

/** s16: the streaming corpus FRONT DOOR — q152's markup triage per
  * micro-batch. Unlike s15's whole-batch verdict, the lane decision is
  * PER ROW, so one batch legitimately splits across BOTH destinations:
  * `clean`/`not_markup` rows publish with their extracted `clean_text`;
  * `quarantine_*` rows land with their ORIGINAL text + lane, preserved
  * for replay after an extractor fix.
  *
  * Idempotence under at-least-once foreachBatch: both roots commit under
  * the same batch id via [[AtomicGen]], and EVERY batch writes a
  * generation to BOTH roots (possibly empty), so a replay after a crash
  * between the two commits completes exactly the missing half and
  * re-replays are full no-ops. The dual-root divergence hazard s15 must
  * guard against (a replayed batch reaching the OTHER decision) cannot
  * arise here: the split is a pure stateless projection of each row
  * ([[TextAnalysis.markupExtract]]), so a replayed batch re-derives the
  * identical split — per-root committed checks are therefore safe.
  */
object FrontDoorGate {

  /** Triage one batch: route rows, then commit each lane atomically under
    * its root. The routed frame is localCheckpointed so both lane writes
    * share one extraction pass over the (micro-batch-sized) frame.
    * Precondition: `doc_id` is unique within a batch (the documents-table
    * contract) — the quarantine lane re-joins the original text by id,
    * and a duplicated id would multiply those rows.
    */
  private[graft] def triageBatch(s: SparkSession, batch: DataFrame, batchId: Long,
      publishDir: String, quarantineDir: String): Unit = {
    val routed = TextAnalysis.markupExtract(batch).localCheckpoint()
    AtomicGen.publish(s, publishDir, batchId) { staged =>
      routed.filter(not(col("lane").startsWith("quarantine")))
        .select(col("doc_id"), col("lane"), col("clean_text"))
        .write.mode("overwrite").parquet(staged)
    }: Unit
    AtomicGen.publish(s, quarantineDir, batchId) { staged =>
      routed.filter(col("lane").startsWith("quarantine"))
        .select(col("doc_id"), col("lane"))
        .join(batch.select(col("doc_id"), col("text")), Seq("doc_id"))
        .write.mode("overwrite").parquet(staged)
    }: Unit
  }

  /** The streaming entry: every micro-batch of (doc_id, text) documents
    * is routed row-by-row into the published extraction or the quarantine.
    * foreachBatch because the sink is a transactional dual-root publish,
    * not a row append. `checkpointDir` is REQUIRED (the
    * CrawlIngest/CommitLogSink contract): without a durable checkpoint a
    * restarted query resets batch ids to 0 and AtomicGen's
    * committed-generation replay guard would silently swallow the new
    * run's data under the reused ids.
    */
  def triagedStream(s: SparkSession, stream: DataFrame, publishDir: String,
      quarantineDir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        triageBatch(s, batch.toDF(), batchId, publishDir, quarantineDir)
      }
      .start()
}
