package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** s28: streaming TREND monitor — the online form of q231 (Mann–Kendall
  * drift verdict) and q235 (Theil–Sen slope): each event micro-batch
  * becomes an (event_type, epoch-day, n) count fragment MERGED into the
  * maintained daily-volume table (a pure additive monoid, so maintained ≡
  * rebuilt after any batch cadence), and both estimators are derived from
  * the MAINTAINED counts by the very same [[graft.operators.Stats]]
  * kernels the batch queries use — a feed that starts drifting verdicts
  * one micro-batch after the day's counts land, without an event rescan.
  *
  * The maintained table is CALENDAR-bounded (|types| × days), so deriving
  * the estimators per trigger costs days²-per-type integer work — q231's
  * scale argument — never O(event history). State architecture is s25's
  * (which is s10's): NO in-flight streaming state — the published count
  * table plus its last-applied batch id ARE the state; `publishDelta`
  * receives only the TOUCHED (event_type, day) cells, so per-batch cost
  * is O(fragment). At-least-once replay guard as s25: counts are additive
  * and would double-count on replay — the batch-id check skips already-
  * applied batches (spec-proven).
  *
  * A LATE event for an already-published day is handled by the same
  * merge: its fragment touches that day's cell and the maintained count
  * grows — both estimators re-derive from corrected history (this is the
  * point of keeping the DAILY table, not the verdicts, as state).
  */
object TrendMonitor {

  /** One micro-batch's (event_type, day, n) fragment merged into the
    * maintained table: replay-guarded, delta-shaped (only cells the
    * fragment touches are read, merged, and returned).
    */
  private[graft] def dailyCountsBatch(
      current: Option[(DataFrame, Long)],
      frag: DataFrame,
      batchId: Long): Option[DataFrame] = current match {
    case Some((_, lastApplied)) if batchId <= lastApplied => None
    case Some((table, _)) =>
      val touched = frag.select(col("event_type"), col("day")).distinct()
      val affected = table.join(touched, Seq("event_type", "day"), "left_semi")
      Some(mergeCounts(affected, frag))
    case None => Some(frag)
  }

  /** Additive monoid merge of (event_type, day, n) fragments. */
  private[graft] def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("event_type"), col("day"))
      .agg(sum(col("n")).as("n"))

  /** q231's verdict table derived from maintained counts — the batch
    * kernel serves the stream unchanged (one definition, zero drift).
    */
  def trend(daily: DataFrame): DataFrame =
    graft.operators.Stats.trendFromDaily(daily)

  /** q235's slope table from the same maintained counts. */
  def slope(daily: DataFrame): DataFrame =
    graft.operators.Stats.slopeFromDaily(daily)

  /** q237's calendar-gap audit from the same maintained counts — the
    * online outage table: a feed that stops arriving grows its trailing
    * gap one micro-batch after the next feed's day lands. */
  def gaps(daily: DataFrame): DataFrame =
    graft.operators.Stats.gapsFromDaily(daily)

  /** q245's Kruskal–Wallis weekday verdict from the same maintained
    * counts (r15) — the fourth estimator served by ONE maintained table:
    * whether the weekday matters re-tests itself as corrected history
    * lands, off the shared batch kernel. */
  def dow(daily: DataFrame): DataFrame =
    graft.operators.Stats.kruskalFromDaily(daily)

  /** q301's changepoint localization from the same maintained counts
    * (r16) — the FIFTH estimator off one table: the day the regime
    * changed re-localizes itself as late-day corrections land (a late
    * fragment moves a cell; the split argmax re-derives from corrected
    * history — the reason the DAILY table, not the verdict, is the
    * state). */
  def changepoint(daily: DataFrame): DataFrame =
    graft.operators.Stats.changepointFromDaily(daily)

  /** The stream: events in, touched daily-count cells out via
    * `publishDelta(delta, batchId)`.
    */
  def trendMonitorStream(
      events: DataFrame,
      store: () => Option[(DataFrame, Long)])(
      publishDelta: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val frag = batch.groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("n"))
        dailyCountsBatch(store(), frag, batchId)
          .foreach(delta => publishDelta(delta, batchId))
      }
}
