package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** s29: streaming ACTIVITY monitor — the online form of q243's user
  * return curve: each event micro-batch folds to its DISTINCT
  * (user_id, epoch-day) activity fragment, which is merged into the
  * maintained activity SET (set union — associative AND idempotent, so
  * the maintained table ≡ the batch rebuild under any batch cadence and
  * even under replay; the batch-id guard is still kept so a replayed
  * batch costs nothing, s25's architecture), and the return curve is
  * derived from the MAINTAINED set by the very same
  * [[graft.operators.Events.returnCurveFromActivity]] the batch query
  * calls — churn shows up one micro-batch after the day's users land,
  * without an event rescan.
  *
  * State is the |users|×|days| activity table (q137/q243's argument:
  * the persisted activity table, not events), delta-shaped: a batch's
  * NEW (user, day) cells are exactly the fragment rows absent from the
  * table, so `publishDelta` carries only genuinely new activity and
  * per-batch cost is O(fragment). Late events for an already-published
  * (user, day) dedupe to nothing — idempotence makes lateness free.
  */
object ActivityMonitor {

  /** One micro-batch's distinct (user_id, day) fragment merged into the
    * maintained set: replay-guarded; returns only the NEW cells (the
    * set-union delta), or None when the batch id was already applied.
    */
  private[graft] def activityBatch(
      current: Option[(DataFrame, Long)],
      frag: DataFrame,
      batchId: Long): Option[DataFrame] = current match {
    case Some((_, lastApplied)) if batchId <= lastApplied => None
    case Some((table, _)) =>
      Some(frag.join(table, Seq("user_id", "day"), "left_anti"))
    case None => Some(frag)
  }

  /** q243's curve derived from maintained activity — the batch kernel
    * serves the stream unchanged (one definition, zero drift).
    */
  def returnCurve(activity: DataFrame): DataFrame =
    graft.operators.Events.returnCurveFromActivity(activity)

  /** q305's weekly growth accounting from the SAME maintained activity
    * set (r16) — the second estimator served by one table (s28's
    * pattern): the weekly fold is `day div 7` over the maintained
    * (user, day) cells, the census the SAME
    * [[graft.operators.Analytics.growthFromWeeks]] the batch query
    * calls. A late day landing in an already-closed week re-derives the
    * census from corrected history — the reason the ACTIVITY SET, not
    * the verdict table, is the state. */
  def growth(activity: DataFrame): DataFrame =
    graft.operators.Analytics.growthFromWeeks(
      activity.select(col("user_id"), expr("day div 7").as("week")).distinct())

  /** The stream: events in, NEW activity cells out via
    * `publishDelta(delta, batchId)` (append-only — cells are never
    * updated, set union only ever adds).
    */
  def activityStream(
      events: DataFrame,
      store: () => Option[(DataFrame, Long)])(
      publishDelta: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val frag = batch
          .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
        activityBatch(store(), frag, batchId)
          .foreach(delta => publishDelta(delta, batchId))
      }
}
