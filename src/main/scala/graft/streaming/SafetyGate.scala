package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Safety

/** s20: the streaming content-safety gate — q190's rule lanes applied at
  * ingest, per micro-batch, so unsafe content never reaches the published
  * corpus in the first place (the batch query is the audit over data
  * already at rest; this is the front door). s16's dual-root idiom
  * verbatim:
  *
  *  - `clean` rows publish with their text (they continue down the
  *    pipeline);
  *  - `blocked` and `review` rows land in the quarantine root with lane,
  *    reasons and score — preserved, attributable, replayable after a
  *    lexicon fix, never silently dropped.
  *
  * Idempotence under at-least-once foreachBatch: both roots commit under
  * the same batch id via [[AtomicGen]], every batch writes a generation
  * to BOTH roots (possibly empty), and the lane decision is a pure
  * stateless projection ([[Safety.route]]) — a replayed batch re-derives
  * the identical split, so per-root committed checks are safe and a
  * crash between the two commits heals on replay (s16's argument,
  * unchanged).
  */
object SafetyGate {

  /** Gate one batch: route rows, then commit each destination atomically
    * under its root. The routed frame is localCheckpointed so both lane
    * writes share one scoring pass over the (micro-batch-sized) frame.
    */
  private[graft] def gateBatch(s: SparkSession, batch: DataFrame, batchId: Long,
      publishDir: String, quarantineDir: String): Unit = {
    val routed = Safety.route(batch)
      .select(col("doc_id"), col("text"), col("lane"), col("reasons"), col("score_bp"))
      .localCheckpoint()
    AtomicGen.publish(s, publishDir, batchId) { staged =>
      routed.filter(col("lane") === "clean")
        .select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(staged)
    }: Unit
    AtomicGen.publish(s, quarantineDir, batchId) { staged =>
      routed.filter(col("lane") =!= "clean")
        .select(col("doc_id"), col("text"), col("lane"), col("reasons"), col("score_bp"))
        .write.mode("overwrite").parquet(staged)
    }: Unit
  }

  /** The streaming entry: every micro-batch of (doc_id, text) documents
    * is routed row-by-row into the published corpus or the reasons-tagged
    * quarantine. foreachBatch because the sink is a transactional
    * dual-root publish, not a row append. `checkpointDir` is REQUIRED
    * (the CrawlIngest/CommitLogSink contract): without a durable
    * checkpoint a restarted query resets batch ids to 0 and AtomicGen's
    * committed-generation replay guard would silently swallow the new
    * run's data under the reused ids.
    */
  def gatedStream(s: SparkSession, stream: DataFrame, publishDir: String,
      quarantineDir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        gateBatch(s, batch.toDF(), batchId, publishDir, quarantineDir)
      }
      .start()
}
