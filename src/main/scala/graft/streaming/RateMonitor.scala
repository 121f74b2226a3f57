package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** s33: streaming ARRIVAL-RATE monitor — the online form of q270: each
  * event micro-batch becomes an (event_type, hour, c) count fragment
  * MERGED into the maintained hourly-volume table (pure additive monoid,
  * maintained ≡ rebuilt after any batch cadence), and the Poisson
  * overdispersion verdict derives from the MAINTAINED counts by the SAME
  * [[graft.operators.Stats.dispersionFromHourly]] kernel the batch query
  * uses — a feed that turns bursty (campaign blast, bot cadence, ingest
  * stall-and-flush) flips `overdispersed` one micro-batch after the
  * hour's counts land, without an event rescan.
  *
  * s28's architecture at hour granularity: the maintained table is
  * CALENDAR-bounded (|types| × hours), NO in-flight streaming state, the
  * published table + last-applied batch id ARE the state, deltas carry
  * only touched cells, at-least-once replay is id-guarded (additive
  * counters double-count otherwise). A LATE event touches its hour's
  * cell and the verdict re-derives from corrected history — the reason
  * the HOURLY table, not the verdict, is the state.
  */
object RateMonitor {

  /** One micro-batch's (event_type, h, c) fragment merged into the
    * maintained table: replay-guarded, delta-shaped. */
  private[graft] def hourlyCountsBatch(
      current: Option[(DataFrame, Long)],
      frag: DataFrame,
      batchId: Long): Option[DataFrame] = current match {
    case Some((_, lastApplied)) if batchId <= lastApplied => None
    case Some((table, _)) =>
      val touched = frag.select(col("event_type"), col("h")).distinct()
      val affected = table.join(touched, Seq("event_type", "h"), "left_semi")
      Some(mergeCounts(affected, frag))
    case None => Some(frag)
  }

  /** Additive monoid merge of (event_type, h, c) fragments. */
  private[graft] def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("event_type"), col("h"))
      .agg(sum(col("c")).as("c"))

  /** One batch's hourly fragment — q270's truncation, folded. */
  private[graft] def fragmentOf(batch: DataFrame): DataFrame =
    batch.select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))

  /** q270's dispersion table derived from maintained counts — the batch
    * kernel serves the stream unchanged (one definition, zero drift). */
  def dispersion(hourly: DataFrame): DataFrame =
    graft.operators.Stats.dispersionFromHourly(hourly)

  /** The stream: events in, touched hourly cells out via
    * `publishDelta(delta, batchId)`. */
  def rateMonitorStream(
      events: DataFrame,
      store: () => Option[(DataFrame, Long)])(
      publishDelta: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        hourlyCountsBatch(store(), fragmentOf(batch), batchId)
          .foreach(delta => publishDelta(delta, batchId))
      }
}
