package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** s30: streaming AUDIENCE-OVERLAP monitor — the online form of q253's
  * user-set Jaccard/overlap matrix: each event micro-batch folds to its
  * DISTINCT (event_type, user_id) membership fragment, merged into the
  * maintained membership SET (set union — associative and idempotent,
  * s29's monoid argument verbatim on the (type, user) axis), and the
  * matrix is derived from the MAINTAINED set by the very same
  * [[graft.operators.Events.overlapFromUserSets]] the batch query calls —
  * an audience shift (a feature's users starting to cover another's)
  * shows up one micro-batch after those users land, without an event
  * rescan.
  *
  * State is the |types|×|users| membership table (bounded by distinct
  * users × the handful of types — q253's scale argument: the per-user
  * fan-out in the derived matrix is |types|², never event-scale),
  * delta-shaped: a batch's NEW (type, user) cells are exactly the
  * fragment rows absent from the table, so `publishDelta` carries only
  * genuinely new membership and per-batch cost is O(fragment). Replayed
  * batches cost nothing (batch-id guard, s25's architecture); late
  * events for an already-seen (type, user) dedupe to nothing —
  * idempotence makes lateness free.
  */
object OverlapMonitor {

  /** One micro-batch's distinct (event_type, user_id) fragment merged
    * into the maintained set: replay-guarded; returns only the NEW cells
    * (the set-union delta), or None when the batch id was already
    * applied.
    */
  private[graft] def membershipBatch(
      current: Option[(DataFrame, Long)],
      frag: DataFrame,
      batchId: Long): Option[DataFrame] = current match {
    case Some((_, lastApplied)) if batchId <= lastApplied => None
    case Some((table, _)) =>
      Some(frag.join(table, Seq("event_type", "user_id"), "left_anti"))
    case None => Some(frag)
  }

  /** q253's matrix derived from maintained membership — the batch kernel
    * serves the stream unchanged (one definition, zero drift).
    */
  def overlap(membership: DataFrame): DataFrame =
    graft.operators.Events.overlapFromUserSets(membership)

  /** The stream: events in, NEW membership cells out via
    * `publishDelta(delta, batchId)` (append-only — set union only ever
    * adds).
    */
  def overlapStream(
      events: DataFrame,
      store: () => Option[(DataFrame, Long)])(
      publishDelta: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val frag = batch.select(col("event_type"), col("user_id")).distinct()
        membershipBatch(store(), frag, batchId)
          .foreach(delta => publishDelta(delta, batchId))
      }
}
