package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** G-block: Structured Streaming transforms over the events stream.
  *
  * Each transform takes a `Dataset[Event]` that may be bounded (batch) or
  * unbounded (readStream) — the same plan serves both, which is how the
  * incremental path of the pipeline stays semantically identical to the
  * batch path it mirrors (q20/q21).
  */
object EventStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(sessNo: Long, lastUs: Long, count: Long)
  case class SessionOut(user_id: Long, sess_no: Long, n_events: Long)

  private val GapUs = 1800L * 1000000L // 30-minute inactivity gap (µs)

  /** full-µs timestamp: getTime carries ms, getNanos the sub-second rest. */
  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** s01: tumbling hourly aggregation with a 1-hour watermark — the
    * streaming form of q21. Late events beyond the watermark are dropped;
    * state is bounded by (windows in flight × event types).
    */
  def hourlyCounts(events: Dataset[Event]): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  /** s02: stateful gap sessionization via flatMapGroupsWithState — the
    * streaming form of q20. Emits a session when a gap closes it; the
    * still-open session (one per user) lives in [[SessionState]]. State per
    * key is O(1): just the running session number and last-seen timestamp.
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          // state carries the open session's running count so sessions
          // spanning micro-batches report the full n_events on close
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          for (e <- sorted) {
            val us = micros(e.ts)
            if (st.lastUs == Long.MinValue) {
              st = SessionState(1L, us, 1L)
            } else if (us - st.lastUs > GapUs) {
              closed += SessionOut(uid, st.sessNo, st.count)
              st = SessionState(st.sessNo + 1, us, 1L)
            } else {
              st = SessionState(st.sessNo, us, st.count + 1L)
            }
          }
          // the still-open session per user stays in state, unemitted
          // (append semantics); it closes when a later batch opens a gap
          state.update(st)
          closed.iterator
      }
  }

  case class Scd2State(lastType: String, fromMs: Long, version: Int)
  case class Scd2Row(user_id: Long, event_type: String, version: Int,
                     valid_from_ms: Long, valid_to_ms: Long)

  /** s07: streaming SCD2 — the online form of
    * [[graft.operators.Analytics.scd2Build]]: per-user state carries only
    * the OPEN interval (type, start, version); a state-changing event
    * closes it and emits the finished type-2 row (append semantics — the
    * open interval is unemittable until it closes, exactly like s02's open
    * session). Emitted rows match the batch build's `is_current = 0` rows
    * whatever the micro-batch boundaries, so the streaming dimension feed
    * and the nightly rebuild agree by construction. State per user is
    * O(1); no watermark needed since one interval per key is retained.
    */
  def scd2Stream(events: Dataset[Event]): Dataset[Scd2Row] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[Scd2State]) =>
          val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val closed = scala.collection.mutable.ArrayBuffer.empty[Scd2Row]
          var st = state.getOption.orNull
          for (e <- sorted) {
            val ms = micros(e.ts) / 1000L
            if (st == null) st = Scd2State(e.event_type, ms, 1)
            else if (st.lastType != e.event_type) {
              closed += Scd2Row(uid, st.lastType, st.version, st.fromMs, ms)
              st = Scd2State(e.event_type, ms, st.version + 1)
            }
          }
          if (st != null) state.update(st)
          closed.iterator
      }
  }

  case class StayState(zoneX: Long, zoneY: Long, enterUs: Long, lastUs: Long, count: Long)
  case class StayPoint(user_id: Long, zone_x: Long, zone_y: Long,
                       enter_us: Long, exit_us: Long, n_events: Long, dwell_min: Long)

  /** s17: streaming stay-point detection — the online form of q159's
    * spatial gaps-and-islands: per-user state carries only the OPEN
    * same-zone run (zone, enter/last µs, count); a zone change closes it
    * and emits the stay point iff it clears the ≥ 3-event / ≥ 10-minute
    * bar (sub-bar runs are discarded on close, exactly like the batch
    * filter). Append semantics — the open run is unemittable until a
    * later event leaves its zone, s02's open-session rule. State per
    * user is O(1); emitted rows equal q159's whatever the micro-batch
    * boundaries (spec closes the tail runs with a far-future flush event
    * and proves set equality with the batch plan). Zone assignment is
    * [[graft.operators.Geo.zoneOfScalar]] — the Column form's bit-exact
    * scalar twin, maintained beside it.
    */
  def stayPoints(events: Dataset[Event]): Dataset[StayPoint] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[StayState]) =>
          val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val closed = scala.collection.mutable.ArrayBuffer.empty[StayPoint]
          var st = state.getOption.orNull
          for (e <- sorted) {
            val us = micros(e.ts)
            val (zx, zy) = graft.operators.Geo.zoneOfScalar(uid, e.value)
            if (st == null) st = StayState(zx, zy, us, us, 1L)
            else if (zx == st.zoneX && zy == st.zoneY)
              st = st.copy(lastUs = us, count = st.count + 1L)
            else {
              val dwell = (st.lastUs - st.enterUs) / 60000000L
              if (st.count >= 3L && dwell >= 10L)
                closed += StayPoint(uid, st.zoneX, st.zoneY,
                  st.enterUs, st.lastUs, st.count, dwell)
              st = StayState(zx, zy, us, us, 1L)
            }
          }
          if (st != null) state.update(st)
          closed.iterator
      }
  }

  /** s18: TIMER-closed sessionization — the capability gap s02 cannot
    * close: a user who simply STOPS never sends the event that would
    * open a gap, so their final session sits in state forever. Built on
    * Spark 4's `transformWithState` arbitrary-state API: per-key
    * ValueState plus an EVENT-TIME timer re-armed at `last + gap` on
    * every batch; when the watermark passes it, [[SessionTimerProcessor
    * .handleExpiredTimer]] emits the session with NO further input for
    * that key. Gap-closed sessions emit exactly like s02 (same
    * SessionState fields, same ordering); after a timer close the state
    * keeps the session NUMBER as a sentinel (lastUs = MinValue) so a
    * returning user continues q20's numbering instead of restarting at 1.
    *
    * Runtime contract: requires the RocksDB state store provider (the
    * transformWithState operator rejects the HDFS-backed default) and an
    * event-time watermark on the input — both asserted by the spec,
    * which proves full q20 parity INCLUDING each user's tail session.
    */
  def sessionizeTimerClosed(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  /** s03: streaming exact dedup by event_id with a watermark bound on how
    * long duplicate keys are remembered — state is GC'd past the watermark.
    */
  def dedupStream(events: Dataset[Event]): Dataset[Event] =
    // WithinWatermark variant: dedup state for an event_id is dropped once
    // the watermark passes it — plain dropDuplicates on a non-time key
    // would retain every id forever and OOM on an unbounded stream
    events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark("event_id")

  /** s04: streaming incremental near-dup filter — the streaming form of
    * [[graft.operators.Dedup.dedupeIncremental]] via `foreachBatch`, the
    * canonical way to reuse batch logic per micro-batch: each arriving
    * batch of documents is band-signed (the q49 xxhash64 minhash pipeline)
    * and anti-joined against the persisted signature table of the
    * published corpus; only survivors reach `onBatch` (in production, the
    * publish sink). The signature pipeline is a multi-stage aggregation —
    * exactly the shape foreachBatch exists for, since a pure streaming
    * plan can't chain stateful aggregations in append mode. Per-batch
    * state is just that batch's signatures; nothing accumulates between
    * batches (the published table grows only via the batch publish step).
    */
  def dedupDocStream(
      docs: DataFrame, publishedSigs: DataFrame)(
      onBatch: DataFrame => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(graft.operators.Dedup.dedupeIncremental(batch, publishedSigs))
      }

  /** s06: watermarked stream-stream join — purchases matched to the same
    * user's clicks within the preceding hour, with BOTH sides streaming
    * (the online form of the q24 attribution, restricted to a bounded
    * lookback as streaming requires). The time-bound join condition plus
    * per-side watermarks let Spark garbage-collect buffered rows: a click
    * older than (purchase watermark − 1 h) can never match again, so
    * state is bounded by one hour of traffic per side regardless of how
    * long the streams run — the difference between a stream-stream join
    * that survives a year of uptime and one that OOMs.
    */
  def attributeStream(purchases: DataFrame, views: DataFrame): DataFrame =
    attributionJoin(purchases, views, "inner")

  /** The ONE attribution join definition behind s06 (inner) and s12
    * (leftOuter) — projections, watermarks and the time-bound condition
    * must stay identical or inner and outer attribution silently diverge
    * (the sessionWindowAgg sharing rule applied to the join pair).
    */
  private def attributionJoin(purchases: DataFrame, views: DataFrame,
      joinType: String): DataFrame = {
    val p = purchases
      .select(col("event_id").as("p_event_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val v = views
      .select(col("event_id").as("v_event_id"), col("user_id").as("v_user_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    p.join(v,
      col("user_id") === col("v_user_id") &&
        col("v_ts") < col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("interval 1 hour"),
      joinType)
      .select(col("p_event_id"), col("user_id"), col("v_event_id"), col("p_ts"), col("v_ts"))
  }

  /** s11: sessionization via the BUILT-IN session_window operator under a
    * watermark — [[graft.operators.Events.sessionWindowAgg]] (q108's exact
    * aggregation) applied to a stream unchanged. Append mode: a session row
    * emits once the watermark passes its close (last event + gap), i.e.
    * once no late event can extend it; sessions still inside the watermark
    * horizon stay buffered in state. This is the engine-managed-state
    * counterpart of s02's hand-rolled flatMapGroupsWithState sessionizer.
    */
  def sessionWindowStream(events: Dataset[Event]): DataFrame =
    graft.operators.Events.sessionWindowAgg(
      events.toDF().withWatermark("ts", "1 hour"))

  /** s13: SLIDING-window aggregation under a watermark —
    * [[graft.operators.Events.slidingWindowAgg]] (q136's exact
    * aggregation) applied to a stream unchanged. Each event updates its 4
    * overlapping hour windows (the same single Expand as batch, partial-
    * agg'd in state); a window's row finalizes once the watermark passes
    * its END, and state is bounded by (windows inside the watermark
    * horizon × event types) — the overlap factor multiplies state keys by
    * windowDuration/slide, not by events.
    */
  def slidingCounts(events: Dataset[Event]): DataFrame =
    graft.operators.Events.slidingWindowAgg(
      events.toDF().withWatermark("ts", "1 hour"))

  /** s12: watermarked LEFT OUTER stream-stream join — s06's attribution
    * with null-completion: a purchase with NO qualifying prior click still
    * emits (null click columns) once the click-side watermark passes its
    * join window, so the sink converges to the batch left join. The outer
    * semantics are exactly why both watermarks AND the time-bound join
    * condition are mandatory here: the engine can only declare "no match
    * will ever arrive" when the click watermark clears p_ts (the upper
    * bound of a matching v_ts), and that same bound is what lets it drop
    * buffered state instead of holding both streams forever.
    */
  def attributeStreamOuter(purchases: DataFrame, views: DataFrame): DataFrame =
    attributionJoin(purchases, views, "leftOuter")

  /** Encoder-friendly projection of a [[graft.functions.SpaceSavingSketch]]:
    * parallel arrays survive the state store's row encoding where a
    * mutable.HashMap would not. */
  case class HHState(k: Int, items: Array[String], counts: Array[Long],
                     errors: Array[Long])
  case class HHOut(event_type: String, item: String, est_count: Long,
                   est_error: Long)

  /** s08: streaming heavy hitters — the online form of q84: one bounded
    * SpaceSaving sketch per stream key (here: heavy-hitter USERS per event
    * type), updated per micro-batch and re-emitted in Update mode, so the
    * sink always holds the current top-k estimate. State per key is O(k)
    * counters FOREVER — the entire point of the sketch: a year of stream
    * uptime costs the same state as the first minute, where a naive
    * groupBy-count stream would accrete one row per distinct user. The
    * sketch guarantees survive incremental updating because batch-merge and
    * sequential add share the same eviction rule (any item with true
    * frequency > n/k so far is present; est ≥ true ≥ est − err).
    */
  def heavyHittersStream(events: Dataset[Event], k: Int): Dataset[HHOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[Event], state: GroupState[HHState]) =>
          val sketch = state.getOption match {
            case Some(st) =>
              graft.functions.SpaceSavingSketch.restore(
                st.k, st.items, st.counts, st.errors)
            case None => new graft.functions.SpaceSavingSketch(k)
          }
          it.foreach(e => sketch.add(e.user_id.toString))
          val sorted = sketch.sorted
          state.update(HHState(sketch.k,
            sorted.map(_._1).toArray, sorted.map(_._2).toArray,
            sorted.map(_._3).toArray))
          sorted.iterator.map { case (item, c, err) => HHOut(tpe, item, c, err) }
      }
  }

  /** Per-key drift state: trailing day→count map, pruned to 15 calendar
    * days — the 8-day late-data horizon plus the 7 baseline days a
    * re-emitted day's z-score references. */
  case class DriftState(days: Map[Long, Long])
  case class DriftOut(event_type: String, day: Long, n: Long,
                      n_baseline_days: Long, z: Option[Double])

  /** s09: streaming volume-anomaly monitor — the online form of
    * [[graft.operators.Stats.q95VolumeAnomaly]]: per event type the state
    * holds only the 16 days within 15 of the stream head (bounded forever,
    * like s08's sketch), and every micro-batch re-emits the z-score of each
    * day it touched, computed AFTER folding the whole batch into state — so
    * a day's final emission uses its complete 7-day baseline exactly as the
    * batch RANGE frame does. Update mode: the sink's latest row per
    * (type, day) converges to the batch q95 value once that day's data has
    * fully arrived. 16 days retained, not 8: a late event for day d
    * re-emits d from state, and a CORRECT re-emission needs d's own count
    * plus baselines back to d−7 — retaining head−15..head (16 day slots)
    * covers any late day within 8 days of the stream head; later stragglers
    * than that would restart their day's count, the documented horizon of
    * this monitor.
    */
  def driftStream(events: Dataset[Event]): Dataset[DriftOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[Event], state: GroupState[DriftState]) =>
          var days = state.getOption.map(_.days).getOrElse(Map.empty[Long, Long])
          val touched = scala.collection.mutable.Set.empty[Long]
          for (e <- it) {
            val d = micros(e.ts) / 86400000000L
            days = days.updated(d, days.getOrElse(d, 0L) + 1L)
            touched += d
          }
          // persist days within 15 of the head — 16 day slots (8-day
          // late-data horizon + 7 baseline days + the head day itself) —
          // but EMIT from the pre-prune map: a
          // single batch may span more than that, and its older days find
          // their baselines inside the batch itself
          val horizon = days.keys.max - 15
          state.update(DriftState(days.filter { case (d, _) => d >= horizon }))
          touched.toSeq.sorted.iterator.map { d =>
            val base = days.collect {
              case (bd, c) if bd >= d - 7 && bd <= d - 1 => c
            }.toSeq
            val (cnt, s1, s2) =
              (base.length.toLong, base.sum, base.map(c => c * c).sum)
            val x = days(d)
            val z =
              if (cnt < 3 || cnt * s2 - s1 * s1 <= 0) None
              else Some(BigDecimal((x * cnt - s1).toDouble /
                math.sqrt((cnt * s2 - s1 * s1).toDouble))
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
            DriftOut(tpe, d, x, cnt, z)
          }
      }
  }

  /** One micro-batch's rollup application: merge the fragment into ONLY
    * the (event_type, day) cells it touches — the untouched history is
    * never re-aggregated or rewritten (the caller publishes the returned
    * delta with dynamic partition overwrite, Pipeline.publishIncremental's
    * shape). Returns None when `batchId` was already applied: foreachBatch
    * is at-least-once, and replaying an additive-counter merge would
    * double-count — min/max/HLL are idempotent, sums are not.
    */
  private[graft] def rollupBatch(
      current: Option[(org.apache.spark.sql.DataFrame, Long)],
      frag: org.apache.spark.sql.DataFrame,
      batchId: Long): Option[org.apache.spark.sql.DataFrame] = current match {
    case Some((_, lastApplied)) if batchId <= lastApplied => None
    case Some((table, _)) =>
      val touched = frag.select(col("event_type"), col("day")).distinct()
      val affected = table.join(touched, Seq("event_type", "day"), "left_semi")
      Some(graft.operators.Quality.mergeRollups(affected, frag))
    case None => Some(frag)
  }

  /** s10: streaming rollup maintenance — the online form of
    * [[graft.operators.Quality.dailyRollup]]/`mergeRollups`: each
    * micro-batch becomes a rollup fragment and is MERGED into the
    * published table — counters add, bounds fold, HLL sketches union, so
    * the maintained table equals a full rebuild after any batch cadence
    * (RollupMaintenanceSpec's monoid guarantee, now driven from a
    * stream). foreachBatch for the same reason as s04: the merge is a
    * multi-stage aggregation over persisted state, which a pure streaming
    * plan can't express in append mode. No in-flight streaming state at
    * all — the published table (plus its last-applied batch id, for
    * at-least-once replay protection) IS the state, exactly like a
    * production incremental materialized view. `store` returns the
    * current table and last-applied batch id; `publishDelta` receives
    * ONLY the touched cells plus the batch id — per-batch cost is
    * O(fragment), not O(table age).
    *
    * SINK CONTRACT: `publishDelta` must commit the delta and the batch id
    * ATOMICALLY (write the batch id into the table's commit metadata, or
    * data + marker in one rename). If they commit separately, a crash
    * between the two leaves the data applied but the id unrecorded, and
    * the at-least-once replay re-merges the fragment — double-counting
    * every additive counter. The replay guard is only as strong as the
    * sink's atomicity. [[RollupSink]] implements the contract: the batch
    * id is the generation directory's NAME, so one staged-dir rename
    * commits rows and id together (RollupMaintenanceSpec kills the
    * publish between stage and commit and shows no double-count).
    */
  def rollupStream(
      events: Dataset[Event],
      store: () => Option[(org.apache.spark.sql.DataFrame, Long)])(
      publishDelta: (org.apache.spark.sql.DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Event] =
    events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Event], batchId: Long) =>
        rollupBatch(store(), graft.operators.Quality.dailyRollup(batch.toDF()), batchId)
          .foreach(delta => publishDelta(delta, batchId))
      }

  /** s05: stream-static enrichment join — each micro-batch of events is
    * joined against a static dimension frame (the published user → segment
    * mapping of an enrich-on-ingest pipeline). The join is STATELESS: the
    * static side is re-planned per micro-batch (so a dim refresh on disk is
    * picked up) and broadcast while it's dim-sized, and no streaming state
    * accumulates — the shape to prefer over a stream-stream join whenever
    * one side is slowly-changing reference data. Left join: an event whose
    * user is missing from the dim must flow through with a null segment,
    * not be dropped on the ingest path.
    */
  def enrich(events: Dataset[Event], userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left")
}

/** s18's stateful processor — see [[EventStream.sessionizeTimerClosed]].
  * One ValueState ("open") per user and AT MOST ONE live timer per key
  * (every batch deletes stale timers before re-arming at the new
  * `last + gap`), so timer state cannot accumulate. The expired-timer
  * path emits the open session and leaves a (sessNo, MinValue, 0)
  * sentinel so session numbering survives the close.
  */
class SessionTimerProcessor
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, EventStream.Event, EventStream.SessionOut] {
  import EventStream.{Event, SessionOut, SessionState}
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}

  private val GapUs = 1800L * 1000000L
  @transient private var open: ValueState[SessionState] = _

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[SessionState]("open",
      org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)

  override def handleInputRows(uid: Long, rows: Iterator[Event],
      tv: TimerValues): Iterator[SessionOut] = {
    val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    var st = if (open.exists()) open.get() else null
    for (e <- sorted) {
      val us = micros(e.ts)
      if (st == null) st = SessionState(1L, us, 1L)
      else if (st.lastUs == Long.MinValue) // timer closed the last one
        st = SessionState(st.sessNo + 1, us, 1L)
      else if (us - st.lastUs > GapUs) {
        closed += SessionOut(uid, st.sessNo, st.count)
        st = SessionState(st.sessNo + 1, us, 1L)
      } else st = SessionState(st.sessNo, us, st.count + 1L)
    }
    if (st != null && st.lastUs != Long.MinValue) {
      open.update(st)
      getHandle.listTimers().foreach(getHandle.deleteTimer _)
      getHandle.registerTimer(st.lastUs / 1000L + GapUs / 1000L + 1L)
    }
    closed.iterator
  }

  override def handleExpiredTimer(uid: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[SessionOut] = {
    if (open.exists()) {
      val st = open.get()
      if (st.lastUs != Long.MinValue) {
        // numbering sentinel: the user may come back
        open.update(SessionState(st.sessNo, Long.MinValue, 0L))
        return Iterator.single(SessionOut(uid, st.sessNo, st.count))
      }
    }
    Iterator.empty
  }
}
