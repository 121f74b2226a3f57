package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.CommitLog

/** s22: streaming append into a [[graft.CommitLog]] table — the
  * transaction-log sink that closes the loop the per-directory AtomicGen
  * sinks open: instead of one `gen=<id>` directory per batch (readers
  * must list and union generations), every micro-batch becomes ONE
  * table VERSION, so downstream readers get snapshot isolation, time
  * travel across batch boundaries, and compaction that doesn't disturb
  * a running reader — while exactly-once comes from the commit log's
  * txn token (`stream-batch-<id>`), not from directory existence: a
  * replayed batch's token is already committed and the append no-ops,
  * including its data write (the pre-check short-circuits before any
  * parquet lands).
  *
  * `checkpointDir` is REQUIRED (like every sibling sink): the token
  * scheme is only exactly-once while batch ids are durable. Without a
  * checkpoint a restarted query would reset to batchId 0 and the
  * already-committed token would silently swallow NEW data — the
  * token design converts id reuse into data loss, so id durability is
  * part of the sink's contract, not an option. One stream per table
  * root for the same reason (two queries would collide on tokens).
  */
object CommitLogSink {

  private[graft] def txnToken(batchId: Long): String = s"stream-batch-$batchId"

  /** `statsFor` embeds per-file min/max skipping stats into every
    * batch's commit (the one table shape the skipping feature targets —
    * a streamed table without stats would be permanently unskippable,
    * since the superset rule keeps stats-less files forever). */
  def appendStream(stream: DataFrame, root: String, checkpointDir: String,
      statsFor: Seq[String] = Seq.empty): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        CommitLog.append(batch.toDF(), root, txnId = Some(txnToken(batchId)),
          statsFor = statsFor): Unit
      }
      .start()
}
