package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.CommitLog

/** s24: streaming keyed RETRACTION into a [[graft.CommitLog]] table — the
  * right-to-be-forgotten loop as a standing stream, completing the
  * mutation trio (s22 append, s23 upsert, here delete): each micro-batch
  * carries the KEYS to forget (a deletion-request feed), and the sink
  * applies them as one DELTA-SIZED `CommitLog.delete` version — only
  * files whose commit-embedded stats admit a batch key are rewritten,
  * and [[graft.CommitLog.changesSince]] consumers see nothing (survivor
  * rewrites are dataChange=false), which is exactly right: a retraction
  * has no new rows to feed downstream; retraction PROPAGATION is the
  * q98 snapshot-diff / vacuum pairing, not the CDC feed.
  *
  * The batch's key column is collected to the driver — a deletion feed
  * is a trickle of subject ids by nature (the GDPR shape), and
  * [[graft.CommitLog.delete]]'s key set is driver-held by contract.
  * `maxKeysPerBatch` (default 100k) fails LOUDLY if a "deletion feed"
  * turns out to be corpus-sized — that workload is a `merge`/anti-join
  * rewrite, not a keyed delete, and silently collecting it would be the
  * driver-OOM the repo's no-collect rule exists to prevent.
  *
  * Exactly-once: `delete-batch-<id>` txn token, same contract and
  * caveats as s22/s23 (durable batch ids via the REQUIRED checkpoint,
  * one stream per table root). Completed deletion still requires a
  * `vacuum` after retention — the sink removes keys from every LIVE
  * version; time travel serves pre-delete versions until then (the
  * documented delete+vacuum GDPR proof).
  */
object RetractionSink {

  private[graft] def txnToken(batchId: Long): String = s"delete-batch-$batchId"

  def retractStream(stream: DataFrame, root: String, keyCol: String,
      checkpointDir: String, statsFor: Option[Seq[String]] = None,
      maxKeysPerBatch: Int = 100000): StreamingQuery = {
    // the key DOMAIN is fixed by the feed's schema at stream build, the
    // r19 string-key lift: a string feed retracts via deleteStrings
    // (keyImage-bloom-admitted rewrites), everything else via the long
    // path — same driver-held contract, caps and tokens either way
    val stringKey = stream.schema(keyCol).dataType ==
      org.apache.spark.sql.types.StringType
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // null-filter BEFORE the cast, then verify the cast lost nothing:
        // a non-numeric key that casts to null would otherwise be silently
        // dropped — a MISSED deletion, the worst failure mode this sink
        // can have (review finding: loud, never silent)
        val keyExpr =
          if (stringKey) col(keyCol).as("k") else col(keyCol).cast("long").as("k")
        val rows = batch.toDF()
          .filter(col(keyCol).isNotNull) // null "keys" name nothing to forget
          .select(keyExpr)
          .distinct()
          .limit(maxKeysPerBatch + 1)
          .collect()
        require(rows.forall(!_.isNullAt(0)),
          s"retraction batch $batchId has keys in '$keyCol' that do not cast to " +
            "long — refusing to silently skip a deletion request")
        require(rows.length <= maxKeysPerBatch,
          s"retraction batch $batchId carries more than $maxKeysPerBatch keys — " +
            "that is a corpus-scale rewrite, not a deletion feed; use CommitLog.merge " +
            "or raise maxKeysPerBatch deliberately")
        if (rows.nonEmpty) {
          if (stringKey)
            CommitLog.deleteStrings(batch.sparkSession, root, keyCol,
              rows.map(_.getString(0)).toSeq, statsFor,
              txnId = Some(txnToken(batchId))): Unit
          else
            CommitLog.delete(batch.sparkSession, root, keyCol,
              rows.map(_.getLong(0)).toSeq,
              statsFor, txnId = Some(txnToken(batchId))): Unit
        }
      }
      .start()
  }
}
