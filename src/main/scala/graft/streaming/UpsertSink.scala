package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, row_number}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.CommitLog

/** s23: streaming keyed UPSERT into a [[graft.CommitLog]] table — the
  * CDC-apply loop s22's append sink cannot express: a change feed whose
  * rows are "latest state of key k", applied so the table always holds
  * exactly one row per key. Every micro-batch becomes ONE `merge`
  * version, DELTA-SIZED by the commit log's two-stage file pruning
  * (stats range, then the exact file probe) — a steady trickle of
  * updates rewrites only the files that actually hold updated keys,
  * never the table (the reason [[graft.CommitLog.merge]] exists: q109's
  * semantics as a standing stream instead of a batch rebuild).
  *
  * Exactly-once: the merge carries the commit log's txn token
  * (`upsert-batch-<id>`), so a replayed batch no-ops BEFORE any data
  * write — same contract and same caveats as s22 ([[CommitLogSink]]):
  * `checkpointDir` is required because the token scheme is only
  * exactly-once while batch ids are durable, and one stream per table
  * root (token collision otherwise).
  *
  * Within-batch key collisions: a CDC feed can carry several versions of
  * one key in one micro-batch. `latestBy` names the version column
  * (e.g. an update timestamp) and the sink folds to the latest row per
  * key BEFORE merging — a deterministic fold only when (keyCol,
  * latestBy) pairs are unique within a batch, which is the change-feed
  * ordering contract itself (two updates of one key at the same version
  * have no defined winner anywhere). Without `latestBy`, duplicate keys
  * in a batch land as duplicate rows (merge's documented behavior) —
  * right for feeds already folded upstream, wrong for raw CDC.
  */
object UpsertSink {

  private[graft] def txnToken(batchId: Long): String = s"upsert-batch-$batchId"

  def upsertStream(stream: DataFrame, root: String, keyCol: String,
      checkpointDir: String, latestBy: Option[String] = None,
      statsFor: Option[Seq[String]] = None): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        val folded = latestBy match {
          case Some(ver) =>
            // latest row per key; the window partitions on the key, so the
            // shuffle is batch-sized (micro-batch, not table)
            val w = Window.partitionBy(col(keyCol)).orderBy(col(ver).desc)
            b.withColumn("__rn", row_number().over(w))
              .filter(col("__rn") === 1).drop("__rn")
          case None => b
        }
        CommitLog.merge(folded, root, keyCol, statsFor,
          txnId = Some(txnToken(batchId))): Unit
      }
      .start()
}
