package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** Incoming document for the s04 stream (top-level: local case classes
  * capture the suite instance and break encoder serialization).
  */
case class SDoc(doc_id: Long, text: String)

/** G-block: streaming transforms driven through MemoryStream, checked
  * against their batch twins on the same sf0.001 events.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def loadEvents(): Seq[Event] = {
    val s = spark
    import s.implicits._
    Tables.events(s, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
  }

  test("s01 streaming hourly counts match the batch aggregation") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ms = MemoryStream[Event]
    val q = EventStream.hourlyCounts(ms.toDS())
      .writeStream.format("memory").queryName("s01").outputMode("complete").start()
    try {
      ms.addData(loadEvents())
      q.processAllAvailable()
      val streamed = s.table("s01")
        .select(col("window.start").as("h"), col("event_type"), col("n"))
      val batch = Tables.events(s, sf)
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0)
    } finally q.stop()
  }

  test("s02 stateful sessionization matches batch q20 session structure") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ms = MemoryStream[Event]
    val q = EventStream.sessionize(ms.toDS())
      .writeStream.format("memory").queryName("s02").outputMode("append").start()
    try {
      ms.addData(loadEvents())
      q.processAllAvailable()
      val emitted = s.table("s02").count()
      val batchSessions = SparkEntry.queries("q20_sessionize")(s, sf).count()
      val nUsers = Tables.events(s, sf).select("user_id").distinct().count()
      // append mode: exactly one open (unemitted) session per user remains
      assert(emitted == batchSessions - nUsers,
        s"emitted=$emitted batch=$batchSessions users=$nUsers")
    } finally q.stop()
  }

  test("s02 sessions spanning micro-batches carry their full event count") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    def ev(id: Long, minute: Long) =
      Event(id, new java.sql.Timestamp(1700000000000L + minute * 60000L), 1L, "click", 1.0)
    val ms = MemoryStream[Event]
    val q = EventStream.sessionize(ms.toDS())
      .writeStream.format("memory").queryName("s02b").outputMode("append").start()
    try {
      // batch 1: three events 1 min apart — one open session, nothing emitted
      ms.addData(Seq(ev(1, 0), ev(2, 1), ev(3, 2)))
      q.processAllAvailable()
      assert(s.table("s02b").count() == 0)
      // batch 2: two more within the gap, then one 40 min later closing it
      ms.addData(Seq(ev(4, 3), ev(5, 4), ev(6, 45)))
      q.processAllAvailable()
      val rows = s.table("s02b").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Long]("n_events") == 5L,
        s"closed session lost cross-batch events: ${rows.head}")
    } finally q.stop()
  }

  test("s04 streaming incremental near-dup filter drops only published near-dups") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // published corpus + its persisted signature table
    val sigDir = java.nio.file.Files.createTempDirectory("graft-s04-sigs").toString
    val published = s.read.parquet("/root/testdata/sf0.01/documents.parquet")
    operators.Dedup.writeSignatureTable(published, sigDir)
    val sigs = s.read.parquet(sigDir)

    val reingested = published.limit(4)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
      .as[(Long, String)].collect().map { case (i, t) => SDoc(i, t) }
    val novel = Seq(
      SDoc(6000001L, "wholly new streaming document alpha beta gamma delta epsilon zeta"),
      SDoc(6000002L, "fresh arrival with unseen content eta theta iota kappa lambda mu"))

    val survivors = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val ms = MemoryStream[SDoc]
    val q = EventStream.dedupDocStream(ms.toDS().toDF(), sigs) { surv =>
      surv.select(col("doc_id")).collect().foreach(r => survivors.add(r.getLong(0)))
    }.start()
    try {
      ms.addData(reingested.toSeq ++ novel)
      q.processAllAvailable()
      assert(survivors == java.util.Set.of(6000001L, 6000002L),
        s"survivors=$survivors")
      // a second batch of only-novel docs passes through untouched
      ms.addData(Seq(SDoc(6000003L, "later batch document nu xi omicron pi rho sigma tau")))
      q.processAllAvailable()
      assert(survivors.contains(6000003L))
    } finally q.stop()
  }

  test("s05 stream-static enrichment joins every micro-batch against the static dim") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // user 3 is deliberately absent from the dim: left-join semantics must
    // pass its events through with a null segment, not drop them
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    def ev(id: Long, uid: Long) =
      Event(id, new java.sql.Timestamp(1700000000000L + id * 1000L), uid, "click", 1.0)
    val ms = MemoryStream[Event]
    val q = EventStream.enrich(ms.toDS(), dim)
      .writeStream.format("memory").queryName("s05").outputMode("append").start()
    try {
      ms.addData(Seq(ev(1, 1), ev(2, 2), ev(3, 3)))
      q.processAllAvailable()
      ms.addData(Seq(ev(4, 1))) // a second micro-batch joins too
      q.processAllAvailable()
      val rows = s.table("s05").select(col("event_id"), col("segment"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(rows == Map(1L -> Some("gold"), 2L -> Some("silver"),
        3L -> None, 4L -> Some("gold")))
    } finally q.stop()
  }

  test("s06 stream-stream join matches purchases to in-window clicks only") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val t0 = 1700000000000L
    def ev(id: Long, uid: Long, tpe: String, minute: Long) =
      Event(id, new java.sql.Timestamp(t0 + minute * 60000L), uid, tpe, 1.0)
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStream.attributeStream(purchases.toDS().toDF(), clicks.toDS().toDF())
      .writeStream.format("memory").queryName("s06").outputMode("append").start()
    try {
      // user 1: click 10 min before purchase (in window), click 90 min
      // before (outside the 1 h lookback), and a click AFTER the purchase
      // (must never match). user 2: purchase with no prior click.
      clicks.addData(Seq(ev(101, 1, "click", 0), ev(102, 1, "click", 80), ev(103, 1, "click", 95)))
      purchases.addData(Seq(ev(201, 1, "purchase", 90), ev(202, 2, "purchase", 90)))
      q.processAllAvailable()
      val got = s.table("s06")
        .select(col("p_event_id"), col("v_event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((201L, 102L)),
        s"expected only the in-window prior click to match, got $got")
    } finally q.stop()
  }

  test("s07 streaming SCD2 closed intervals match the batch build across micro-batch splits") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ms = MemoryStream[Event]
    val q = EventStream.scd2Stream(ms.toDS())
      .writeStream.format("memory").queryName("s07").outputMode("append").start()
    try {
      // deliver the real event log split in two by timestamp — intervals
      // spanning the boundary must close with the right version/from
      val ev = loadEvents().sortBy(e => (e.ts.getTime, e.event_id))
      val (first, second) = ev.splitAt(ev.size / 2)
      ms.addData(first); q.processAllAvailable()
      ms.addData(second); q.processAllAvailable()
      val streamed = s.table("s07")
      val batchClosed = graft.operators.Analytics
        .scd2Build(Tables.events(s, sf))
        .filter(col("is_current") === 0)
        .select(col("user_id"), col("event_type"), col("version"),
          col("valid_from_ms"), col("valid_to_ms"))
      assert(streamed.count() == batchClosed.count())
      assert(streamed.exceptAll(batchClosed).count() == 0,
        "streamed closed intervals differ from the batch rebuild")
    } finally q.stop()
  }

  test("s08 streaming heavy hitters are exact below capacity and bounded above it") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // distinct users per event type at sf0.001 is far below k=1024: no
    // eviction can occur, so the final emission must be EXACT per-user
    // counts — even with the events split across two micro-batches
    val events = loadEvents()
    val (b1, b2) = events.splitAt(events.length / 2)
    val ms = MemoryStream[Event]
    val q = EventStream.heavyHittersStream(ms.toDS(), 1024)
      .writeStream.format("memory").queryName("s08").outputMode("update").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      // the memory sink appends every trigger's emission; the latest
      // estimate per (type, user) is the max (counts never decrease)
      val fin = s.table("s08").groupBy(col("event_type"), col("item"))
        .agg(max(col("est_count")).as("est"), max(col("est_error")).as("err"))
      val exact = Tables.events(s, sf)
        .groupBy(col("event_type"), col("user_id").cast("string").as("item"))
        .agg(count(lit(1)).as("n"))
      val joined = fin.join(exact, Seq("event_type", "item"), "full").cache()
      assert(joined.filter(col("est").isNull || col("n").isNull).count() == 0,
        "sketch below capacity must hold exactly the true item set")
      assert(joined.filter(col("est") =!= col("n") || col("err") =!= 0).count() == 0,
        "below capacity every count is exact with zero error")
      joined.unpersist()
    } finally q.stop()

    // force eviction with k=2: SpaceSaving invariants must still hold —
    // est ≥ true and the dominant item is always present
    val ms2 = MemoryStream[Event]
    val q2 = EventStream.heavyHittersStream(ms2.toDS(), 2)
      .writeStream.format("memory").queryName("s08b").outputMode("update").start()
    try {
      val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      // user 1 dominates (12 of 20 events); users 2..9 are noise
      val evs = (1 to 12).map(i => Event(i.toLong, ts0, 1L, "x", 1.0)) ++
        (13 to 20).map(i => Event(i.toLong, ts0, (i % 8 + 2).toLong, "x", 1.0))
      ms2.addData(evs.take(10)); q2.processAllAvailable()
      ms2.addData(evs.drop(10)); q2.processAllAvailable()
      val last = s.table("s08b").groupBy(col("item"))
        .agg(max(col("est_count")).as("est")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(last.contains("1"), "dominant item (freq > n/k) must be present")
      assert(last("1") >= 12L, "SpaceSaving estimate must never undercount")
    } finally q2.stop()
  }

  test("s09 streaming drift monitor converges to the batch q95 z-scores") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // split at a day boundary, in event-time order: every day fully
    // arrives in one batch, so its final emission must equal batch q95
    val events = loadEvents().sortBy(e => (e.ts.getTime, e.event_id))
    val days = events.map(_.ts.getTime / 86400000L).distinct.sorted
    val cutDay = days(days.length / 2)
    val (b1, b2) = events.partition(_.ts.getTime / 86400000L < cutDay)
    val ms = MemoryStream[Event]
    val q = graft.streaming.EventStream.driftStream(ms.toDS())
      .writeStream.format("memory").queryName("s09").outputMode("update").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      // latest emission per (type, day): batch_id-free memory sink — take
      // the row with the max n (counts only grow as a day accumulates)
      val fin = s.table("s09")
        .groupBy(col("event_type"), col("day"))
        .agg(max(struct(col("n"), col("n_baseline_days"), col("z"))).as("r"))
        .select(col("event_type"), col("day"), col("r.n").as("n"),
          col("r.n_baseline_days").as("n_baseline_days"), col("r.z").as("z"))
      val batch = graft.operators.Stats.q95VolumeAnomaly(s, sf)
        .select(col("event_type"), col("day"), col("n"),
          col("n_baseline_days"), col("z"))
      assert(fin.count() == batch.count(), "every (type, day) cell emitted")
      assert(fin.exceptAll(batch).count() == 0 && batch.exceptAll(fin).count() == 0,
        "streaming emissions must converge to the batch z-scores")
    } finally q.stop()
  }

  test("s09 late data within the 8-day horizon re-emits its day with the full baseline") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // synthetic: day d carries d+3 events (variance > 0 in every baseline);
    // one day-9 event arrives late in its own micro-batch
    def ev(id: Long, day: Long) =
      Event(id, new java.sql.Timestamp(day * 86400000L + 1000L), 1L, "x", 1.0)
    var id = 0L
    val all = (0L to 11L).flatMap { d =>
      (1 to (d + 3).toInt).map { _ => id += 1; ev(id, d) }
    }
    val late = all.filter(_.ts.getTime / 86400000L == 9L).head
    val ms = MemoryStream[Event]
    val q = graft.streaming.EventStream.driftStream(ms.toDS())
      .writeStream.format("memory").queryName("s09late").outputMode("update").start()
    try {
      ms.addData(all.filterNot(_.event_id == late.event_id)); q.processAllAvailable()
      ms.addData(Seq(late)); q.processAllAvailable()
      val day9 = s.table("s09late").filter(col("day") === 9L)
        .select(col("n"), col("n_baseline_days"), col("z")).collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      // first emission under-counted (11 of 12), the late re-emission is complete
      assert(day9.exists(_._1 == 11L) && day9.exists(_._1 == 12L))
      val base = (2L to 8L).map(_ + 3L) // counts of days 2..8
      val (cnt, s1, s2) = (base.length.toLong, base.sum, base.map(c => c * c).sum)
      val want = BigDecimal((12L * cnt - s1).toDouble /
        math.sqrt((cnt * s2 - s1 * s1).toDouble))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val fin = day9.find(_._1 == 12L).get
      assert(fin._2 == cnt && fin._3.contains(want),
        s"late re-emission must use the complete 7-day baseline: $fin vs ($cnt, $want)")
    } finally q.stop()
  }

  test("s03 streaming dedup removes duplicate event_ids") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ms = MemoryStream[Event]
    val q = EventStream.dedupStream(ms.toDS())
      .writeStream.format("memory").queryName("s03").outputMode("append").start()
    try {
      val ev = loadEvents()
      ms.addData(ev ++ ev.take(100)) // re-deliver first 100 as duplicates
      q.processAllAvailable()
      assert(s.table("s03").count() == ev.size)
      assert(s.table("s03").select("event_id").distinct().count() == ev.size)
    } finally q.stop()
  }

  test("s11 streaming session_window emits exactly the batch q108 rows once the watermark closes them") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val t0 = 1700000000000L
    def ev(id: Long, uid: Long, minute: Long) =
      Event(id, new java.sql.Timestamp(t0 + minute * 60000L), uid, "click", 2.5)
    val batch1 = Seq(ev(1, 1, 0), ev(2, 1, 10), ev(3, 2, 5))
    val ms = MemoryStream[Event]
    val q = EventStream.sessionWindowStream(ms.toDS())
      .writeStream.format("memory").queryName("s11").outputMode("append").start()
    try {
      ms.addData(batch1)
      q.processAllAvailable()
      // both sessions close at minute 40/35; watermark is still at
      // minute 10 - 1h → nothing may emit yet
      assert(s.table("s11").count() == 0,
        "append mode must hold sessions until the watermark passes them")
      // minute 300 pushes the watermark to 240 min — past both closes
      ms.addData(Seq(ev(4, 1, 300)))
      q.processAllAvailable()
      val got = s.table("s11")
        .select("user_id", "sess_start", "sess_end", "n_events", "value_cents")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3), r.getLong(4))).toSet
      // the batch q108 aggregation over the SAME closed events — identical
      // expression, so the stream must reproduce it row for row
      val expect = graft.operators.Events.sessionWindowAgg(batch1.toDF())
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3), r.getLong(4))).toSet
      assert(got == expect, s"stream $got vs batch $expect")
      // the minute-300 session is still open (inside the watermark horizon)
      assert(!got.exists(_._2 == t0 + 300 * 60000L))
    } finally q.stop()
  }

  test("s13 streaming sliding windows converge to the batch q136 aggregation") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ms = MemoryStream[Event]
    val q = EventStream.slidingCounts(ms.toDS())
      .writeStream.format("memory").queryName("s13").outputMode("complete").start()
    try {
      // two micro-batches: overlapping windows must accumulate across them
      val all = loadEvents()
      val (b1, b2) = all.splitAt(all.length / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      val streamed = s.table("s13")
      val batch = graft.operators.Events.slidingWindowAgg(
        Tables.events(s, sf))
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0 &&
        batch.exceptAll(streamed).count() == 0,
        "stream (complete mode) must equal the batch sliding aggregation")
    } finally q.stop()
  }

  test("s12 outer stream-stream join null-completes unmatched purchases only after the watermark") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val t0 = 1700000000000L
    def ev(id: Long, uid: Long, tpe: String, minute: Long) =
      Event(id, new java.sql.Timestamp(t0 + minute * 60000L), uid, tpe, 1.0)
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStream.attributeStreamOuter(
      purchases.toDS().toDF(), clicks.toDS().toDF())
      .writeStream.format("memory").queryName("s12").outputMode("append").start()
    try {
      clicks.addData(Seq(ev(101, 1, "click", 80)))
      purchases.addData(Seq(ev(201, 1, "purchase", 90), ev(202, 2, "purchase", 90)))
      q.processAllAvailable()
      val inner = s.table("s12").select("p_event_id", "v_event_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      assert(inner == Map(201L -> Some(101L)),
        s"only the matched purchase may emit before the watermark: $inner")
      // advance BOTH watermarks far past p_ts = minute 90: outer-join
      // state eviction keys on the GLOBAL watermark (min across streams),
      // so a click-only advance would keep purchase 202 buffered forever
      clicks.addData(Seq(ev(102, 9, "click", 600)))
      purchases.addData(Seq(ev(203, 9, "purchase", 600)))
      q.processAllAvailable()
      clicks.addData(Seq(ev(103, 9, "click", 601))) // next batch applies it
      q.processAllAvailable()
      val rows = s.table("s12").select("p_event_id", "v_event_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      assert(rows == Map(201L -> Some(101L), 202L -> None),
        s"unmatched purchase must null-complete after the watermark: $rows")
    } finally q.stop()
  }

  test("s17 streaming stay points equal batch q159 across micro-batch splits") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ms = MemoryStream[Event]
    val q = EventStream.stayPoints(ms.toDS())
      .writeStream.format("memory").queryName("s17").outputMode("append").start()
    try {
      val evs = loadEvents().sortBy(e => (e.ts.getTime, e.event_id))
      val (a, b) = evs.splitAt(evs.length / 2) // split lands mid-run for many users
      ms.addData(a); q.processAllAvailable()
      ms.addData(b); q.processAllAvailable()
      // flush: one far-future event per user, value shifted ~200 zone
      // cells away — closes every open run; the flush runs themselves
      // (count 1) can never clear the bar, so they add no emissions
      val flushTs = new java.sql.Timestamp(evs.map(_.ts.getTime).max + 86400000L)
      ms.addData(evs.map(_.user_id).distinct.map(u =>
        Event(9000000L + u, flushTs, u, "flush", 1e6)))
      q.processAllAvailable()
      val got = s.table("s17").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toSet
      def us(t: java.sql.Timestamp) = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
      val want = graft.operators.Geo.q159StayPoints(s, sf).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          us(r.getTimestamp(3)), us(r.getTimestamp(4)),
          r.getLong(5), r.getLong(6))).toSet
      assert(got.nonEmpty && got == want,
        s"stream/batch stay-point divergence: ${(got diff want).take(3)} / ${(want diff got).take(3)}")
    } finally q.stop()
  }

  test("s18 timer-closed sessions reach FULL q20 parity - tail sessions emit with no further events") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = s0.sqlContext
    // transformWithState rejects the HDFS-backed default store
    s0.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = try {
      val ms = MemoryStream[Event]
      val query = EventStream.sessionizeTimerClosed(ms.toDS())
        .writeStream.format("memory").queryName("s18").outputMode("append").start()
      try {
        val evs = loadEvents()
        ms.addData(evs)
        query.processAllAvailable()
        val afterData = s0.table("s18").count()
        // the batch surface: EVERY session, including each user's last
        val batch = SparkEntry.queries("q20_sessionize")(s0, sf).collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_no"),
            r.getAs[Long]("n_events"))).toSet
        val nUsers = evs.map(_.user_id).distinct.size
        // the first batch's own watermark (max ts − 1 h) already fires
        // timers for users idle > gap + delay before the corpus end, so
        // MORE than the gap-closed sessions may emit — but users active
        // near the end must still be open
        assert(afterData >= batch.size - nUsers && afterData < batch.size,
          s"pre-tick emitted=$afterData batch=${batch.size} users=$nUsers")
        // two far-future ticks from a dummy user: the first advances the
        // watermark (committed at batch end), the second runs a batch
        // UNDER that watermark so every armed timer fires
        val far = evs.map(_.ts.getTime).max + 7200000L
        ms.addData(Seq(Event(9900001L, new java.sql.Timestamp(far), 999999L, "tick", 0.0)))
        query.processAllAvailable()
        ms.addData(Seq(Event(9900002L, new java.sql.Timestamp(far + 1000L), 999999L, "tick", 0.0)))
        query.processAllAvailable()
        val got = s0.table("s18").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .filter(_._1 != 999999L).toSet
        assert(got == batch,
          s"timer-closed surface != q20: missing=${(batch diff got).take(3)} extra=${(got diff batch).take(3)}")
      } finally query.stop()
    } finally s0.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("s25 streaming source-mix monitor converges to the batch q211 profile") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = s0.sqlContext
    val docs = Tables.documents(s0, sf).select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    // in-memory published table: (source, lang) -> cnt, plus last batch id
    val cells = scala.collection.mutable.Map.empty[(String, String), Long]
    var lastId = Option.empty[Long]
    def store(): Option[(org.apache.spark.sql.DataFrame, Long)] =
      lastId.map { id =>
        (cells.toSeq.map { case ((src, l), c) => (src, l, c) }
          .toDF("source", "lang", "cnt"), id)
      }
    def publishDelta(delta: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      // delta carries ONLY touched cells - overwrite exactly those
      delta.collect().foreach { r =>
        cells((r.getAs[String]("source"), r.getAs[String]("lang"))) =
          r.getAs[Long]("cnt")
      }
      lastId = Some(batchId)
    }
    val ms = MemoryStream[(String, String)]
    val q = graft.streaming.CurationMonitor.mixMonitorStream(
      ms.toDS().toDF("source", "lang"), store _)(publishDelta).start()
    try {
      val (b1, rest) = docs.splitAt(docs.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(b3); q.processAllAvailable()
    } finally q.stop()
    // maintained counts equal the batch rebuild ...
    val rebuild = Tables.documents(s0, sf).groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cells.toMap == rebuild, "maintained counts != batch rebuild")
    // ... and the profile over MAINTAINED counts equals the batch q211
    val got = graft.streaming.CurationMonitor.profile(store().get._1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSet
    val want = graft.operators.TextAnalysis.q211SourceLangMix(s0, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want, "streamed profile != batch q211")
    // at-least-once replay: an already-applied batch id must be skipped
    // (additive counters would double-count), a new id must apply
    val frag = Tables.documents(s0, sf).limit(10)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("cnt"))
    val last = lastId.get
    assert(graft.streaming.CurationMonitor.mixCountsBatch(store(), frag, last).isEmpty)
    assert(graft.streaming.CurationMonitor.mixCountsBatch(store(), frag, last + 1L).isDefined)
  }

  test("s26 streaming gate-attrition monitor converges to the batch q227 table") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = s0.sqlContext
    val docs = Tables.documents(s0, sf).select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val cells = scala.collection.mutable.Map.empty[(String, String), Long]
    var lastId = Option.empty[Long]
    def store(): Option[(org.apache.spark.sql.DataFrame, Long)] =
      lastId.map { id =>
        (cells.toSeq.map { case ((src, o), c) => (src, o, c) }
          .toDF("source", "outcome", "cnt"), id)
      }
    def publishDelta(delta: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      delta.collect().foreach { r =>
        cells((r.getAs[String]("source"), r.getAs[String]("outcome"))) =
          r.getAs[Long]("cnt")
      }
      lastId = Some(batchId)
    }
    val ms = MemoryStream[(Long, String, String)]
    val q = graft.streaming.AttritionMonitor.attritionMonitorStream(
      ms.toDS().toDF("doc_id", "source", "text"), store _)(publishDelta).start()
    try {
      val (b1, rest) = docs.splitAt(docs.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(b3); q.processAllAvailable()
    } finally q.stop()
    // the profile over MAINTAINED counts equals the batch q227 table
    // row-for-row (counts AND integer shares)
    val got = graft.streaming.AttritionMonitor.profile(store().get._1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = graft.operators.TextAnalysis
      .q227GateAttritionBySource(s0, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"streamed attrition != batch q227\n$got\n$want")
    // replay guard: applied id skips, fresh id applies
    val frag = graft.streaming.AttritionMonitor.fragmentOf(
      Tables.documents(s0, sf).limit(10).select("doc_id", "source", "text"))
    val last = lastId.get
    assert(graft.streaming.AttritionMonitor
      .attritionCountsBatch(store(), frag, last).isEmpty)
    assert(graft.streaming.AttritionMonitor
      .attritionCountsBatch(store(), frag, last + 1L).isDefined)
  }

  test("s27 streaming frozen-LM tier monitor converges to the batch q229 table; novel text lands in tail") {
    import graft.streaming.TierMonitor
    val s0 = spark
    import s0.implicits._
    implicit val sq = s0.sqlContext
    val frozen = TierMonitor.freeze(s0, sf)
    val docs = Tables.documents(s0, sf).select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val cells = scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    var lastId = Option.empty[Long]
    def store(): Option[(org.apache.spark.sql.DataFrame, Long)] =
      lastId.map { id =>
        (cells.toSeq.map { case ((src, t), (c, sn)) => (src, t, c, sn) }
          .toDF("source", "tier", "cnt", "sum_nll"), id)
      }
    def publishDelta(delta: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      delta.collect().foreach { r =>
        cells((r.getAs[String]("source"), r.getAs[String]("tier"))) =
          (r.getAs[Long]("cnt"), r.getAs[Long]("sum_nll"))
      }
      lastId = Some(batchId)
    }
    val ms = MemoryStream[(Long, String, String)]
    val q = TierMonitor.tierMonitorStream(
      ms.toDS().toDF("doc_id", "source", "text"), frozen, store _)(publishDelta)
      .start()
    try {
      val (b1, rest) = docs.splitAt(docs.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(b3); q.processAllAvailable()
    } finally q.stop()
    // streamed the reference corpus against its OWN frozen artifacts:
    // frozen scores ≡ q156 self-scores and frozen cutoffs ≡ q162's, so
    // the maintained profile equals the batch q229 table row-for-row
    // (counts, integer shares AND integer means)
    val got = TierMonitor.profile(store().get._1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val want = graft.operators.TextAnalysis.q229TierBySource(s0, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == want, s"streamed tiers != batch q229\n$got\n$want")
    // drift: a batch of wholly-unseen words exercises the smoothing path
    // (ln 1 − ln V per bigram — the most-surprising score) and must land
    // every such doc in `tail`
    val gibberish = (1 to 8).map(i =>
      (900000L + i, "src_drift",
        (1 to 20).map(j => s"zzqx${i}gib${j}word").mkString(" ")))
    val frag = TierMonitor.fragmentOf(
      gibberish.toDF("doc_id", "source", "text"), frozen).collect()
    assert(frag.map(_.getAs[String]("tier")).toSet == Set("tail"),
      frag.mkString("\n"))
    assert(frag.map(_.getAs[Long]("cnt")).sum == 8L)
    // replay guard: applied id skips, fresh id applies
    val f10 = TierMonitor.fragmentOf(
      Tables.documents(s0, sf).limit(10).select("doc_id", "source", "text"),
      frozen)
    val last = lastId.get
    assert(TierMonitor.tierCountsBatch(store(), f10, last).isEmpty)
    assert(TierMonitor.tierCountsBatch(store(), f10, last + 1L).isDefined)
    // durable serving: persist -> load round-trips the artifacts through
    // reliable storage and scores identically (the localCheckpoint form
    // is single-JVM; a serving cluster loads from here)
    val froot = java.nio.file.Files.createTempDirectory("graft-frozenlm").toString
    try {
      TierMonitor.persist(frozen, froot)
      val reloaded = TierMonitor.load(s0, froot)
      assert(reloaded.c1Cut == frozen.c1Cut && reloaded.c2Cut == frozen.c2Cut)
      val viaLoaded = TierMonitor.fragmentOf(
        Tables.documents(s0, sf).limit(50).select("doc_id", "source", "text"),
        reloaded).collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      val viaFrozen = TierMonitor.fragmentOf(
        Tables.documents(s0, sf).limit(50).select("doc_id", "source", "text"),
        frozen).collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      assert(viaLoaded == viaFrozen)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(froot))
    }
  }

  test("s28 streaming trend monitor converges to the batch q231/q235 tables; late days merge; replay skipped") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = s0.sqlContext
    val evs = Tables.events(s0, sf).select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1))).toSeq
    // in-memory published table: (event_type, day) -> n, plus last batch id
    val cells = scala.collection.mutable.Map.empty[(String, Long), Long]
    var lastId = Option.empty[Long]
    def store(): Option[(org.apache.spark.sql.DataFrame, Long)] =
      lastId.map { id =>
        (cells.toSeq.map { case ((et, d), n) => (et, d, n) }
          .toDF("event_type", "day", "n"), id)
      }
    def publishDelta(delta: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      delta.collect().foreach { r =>
        cells((r.getAs[String]("event_type"), r.getAs[Long]("day"))) =
          r.getAs[Long]("n")
      }
      lastId = Some(batchId)
    }
    val ms = MemoryStream[(String, java.sql.Timestamp)]
    val q = graft.streaming.TrendMonitor.trendMonitorStream(
      ms.toDS().toDF("event_type", "ts"), store _)(publishDelta).start()
    try {
      // batches split mid-day, so "late" cells for already-published days
      // arrive in later batches and must MERGE (not overwrite-to-less)
      val (b1, rest) = evs.splitAt(evs.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(b3); q.processAllAvailable()
    } finally q.stop()
    // maintained daily counts equal the batch rebuild
    val rebuild = Tables.events(s0, sf)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells.toMap == rebuild, "maintained counts != batch rebuild")
    // both estimators over MAINTAINED counts equal the batch queries
    val gotTrend = graft.streaming.TrendMonitor.trend(store().get._1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSet
    val wantTrend = graft.operators.Stats.q231TrendTest(s0, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSet
    assert(gotTrend == wantTrend, "streamed trend != batch q231")
    val gotSlope = graft.streaming.TrendMonitor.slope(store().get._1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.getAs[Any]("slope_x1000")).map(_.asInstanceOf[Long]))).toSet
    val wantSlope = graft.operators.Stats.q235TheilSen(s0, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.getAs[Any]("slope_x1000")).map(_.asInstanceOf[Long]))).toSet
    assert(gotSlope == wantSlope, "streamed slope != batch q235")
    val gotGaps = graft.streaming.TrendMonitor.gaps(store().get._1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(6),
        r.getLong(7))).toSet
    val wantGaps = graft.operators.Stats.q237CalendarGaps(s0, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(6),
        r.getLong(7))).toSet
    assert(gotGaps == wantGaps, "streamed gaps != batch q237")
    // at-least-once replay: an already-applied batch id must be skipped
    // (additive counters would double-count), a new id must apply
    val frag = Tables.events(s0, sf).limit(10)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
    val last = lastId.get
    assert(graft.streaming.TrendMonitor.dailyCountsBatch(store(), frag, last).isEmpty)
    assert(graft.streaming.TrendMonitor.dailyCountsBatch(store(), frag, last + 1L).isDefined)
  }

  test("s29 streaming activity monitor converges to the batch q243 curve; deltas are new cells only") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = s0.sqlContext
    val evs = Tables.events(s0, sf).select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    val cells = scala.collection.mutable.Set.empty[(Long, Long)]
    var lastId = Option.empty[Long]
    var published = 0L // every delta row must be NEW (set-union delta)
    def store(): Option[(org.apache.spark.sql.DataFrame, Long)] =
      lastId.map(id => (cells.toSeq.toDF("user_id", "day"), id))
    def publishDelta(delta: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      delta.collect().foreach { r =>
        val cell = (r.getAs[Long]("user_id"), r.getAs[Long]("day"))
        assert(!cells(cell), s"delta re-published existing cell $cell")
        cells += cell; published += 1
      }
      lastId = Some(batchId)
    }
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val q = graft.streaming.ActivityMonitor.activityStream(
      ms.toDS().toDF("user_id", "ts"), store _)(publishDelta).start()
    try {
      // mid-day/mid-user splits: later batches re-send already-published
      // (user, day) cells, which must dedupe to nothing
      val (b1, rest) = evs.splitAt(evs.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(b3); q.processAllAvailable()
    } finally q.stop()
    val rebuild = Tables.events(s0, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cells.toSet == rebuild, "maintained activity != batch rebuild")
    assert(published == rebuild.size.toLong, "deltas re-shipped known cells")
    val got = graft.streaming.ActivityMonitor.returnCurve(store().get._1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getAs[Any]("return_bp")).map(_.asInstanceOf[Long]))).toSet
    val want = graft.operators.Events.q243ReturnCurve(s0, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getAs[Any]("return_bp")).map(_.asInstanceOf[Long]))).toSet
    assert(got == want, "streamed return curve != batch q243")
    // r16: the SECOND estimator off the same maintained set — the weekly
    // growth accounting derives via the shared growthFromWeeks kernel and
    // must equal batch q305 row-for-row
    val gotGrowth = graft.streaming.ActivityMonitor.growth(store().get._1)
      .collect().map(_.toSeq).toSet
    val wantGrowth = graft.operators.Analytics.q305GrowthAccounting(s0, sf)
      .collect().map(_.toSeq).toSet
    assert(gotGrowth == wantGrowth, "streamed growth accounting != batch q305")
    // replay guard: an applied id skips; a new id with known cells
    // yields an EMPTY delta (idempotent union), not a duplicate
    val frag = Tables.events(s0, sf).limit(10)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val last = lastId.get
    assert(graft.streaming.ActivityMonitor.activityBatch(store(), frag, last).isEmpty)
    val redelta = graft.streaming.ActivityMonitor.activityBatch(store(), frag, last + 1L)
    assert(redelta.isDefined && redelta.get.count() == 0L)
  }

  test("s30 streaming overlap monitor converges to the batch q253 matrix; deltas are new cells only") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = s0.sqlContext
    val evs = Tables.events(s0, sf).select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val cells = scala.collection.mutable.Set.empty[(String, Long)]
    var lastId = Option.empty[Long]
    var published = 0L // every delta row must be NEW (set-union delta)
    def store(): Option[(org.apache.spark.sql.DataFrame, Long)] =
      lastId.map(id => (cells.toSeq.toDF("event_type", "user_id"), id))
    def publishDelta(delta: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      delta.collect().foreach { r =>
        val cell = (r.getAs[String]("event_type"), r.getAs[Long]("user_id"))
        assert(!cells(cell), s"delta re-published existing cell $cell")
        cells += cell; published += 1
      }
      lastId = Some(batchId)
    }
    val ms = MemoryStream[(String, Long)]
    val q = graft.streaming.OverlapMonitor.overlapStream(
      ms.toDS().toDF("event_type", "user_id"), store _)(publishDelta).start()
    try {
      // splits re-send already-seen (type, user) cells, which must
      // dedupe to nothing (idempotent set union)
      val (b1, rest) = evs.splitAt(evs.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(b3); q.processAllAvailable()
    } finally q.stop()
    val rebuild = evs.distinct.toSet
    assert(cells.toSet == rebuild, "maintained membership != batch rebuild")
    assert(published == rebuild.size.toLong, "deltas re-shipped known cells")
    val got = graft.streaming.OverlapMonitor.overlap(store().get._1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val want = graft.operators.Events.q253AudienceOverlap(s0, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == want, "streamed overlap matrix != batch q253")
    // replay guard: an applied id skips; a new id with known cells
    // yields an EMPTY delta (idempotent union), not a duplicate
    val frag = evs.take(10).distinct.toDF("event_type", "user_id")
    val last = lastId.get
    assert(graft.streaming.OverlapMonitor.membershipBatch(store(), frag, last).isEmpty)
    val redelta = graft.streaming.OverlapMonitor.membershipBatch(store(), frag, last + 1L)
    assert(redelta.isDefined && redelta.get.count() == 0L)
  }

  test("s32 streaming waterfall monitor converges to the batch q268 table") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = s0.sqlContext
    val corpus = Tables.documents(s0, sf).filter(col("doc_id") % 97 =!= 0)
      .select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1) // ordered arrival: first-wins ≡ the batch min-id pick
    val benchDocs = Tables.documents(s0, sf).filter(col("doc_id") % 97 === 0)
      .select("doc_id", "text")
    val counters = scala.collection.mutable.Map.empty[String, Seq[Long]]
    val seen = scala.collection.mutable.Set.empty[String]
    var lastId = Option.empty[Long]
    val cols = Seq("n0", "t0", "n1", "t1", "n2", "t2", "n3", "t3")
    def store(): Option[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, Long)] =
      lastId.map { id =>
        (counters.toSeq.map { case (src, v) =>
          (src, v(0), v(1), v(2), v(3), v(4), v(5), v(6), v(7))
        }.toDF(("source" +: cols): _*),
          seen.toSeq.toDF("content_hash"), id)
      }
    def publishDelta(delta: org.apache.spark.sql.DataFrame,
        hashes: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      delta.collect().foreach { r =>
        counters(r.getAs[String]("source")) = cols.map(r.getAs[Long](_))
      }
      hashes.collect().foreach(r => seen += r.getString(0))
      lastId = Some(batchId)
    }
    val ms = MemoryStream[(Long, String, String)]
    val q = graft.streaming.WaterfallMonitor.waterfallMonitorStream(
      ms.toDS().toDF("doc_id", "source", "text"), benchDocs, store _)(publishDelta).start()
    try {
      val (b1, rest) = corpus.splitAt(corpus.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(b3); q.processAllAvailable()
    } finally q.stop()
    // the funnel over MAINTAINED counters equals the batch q268 table
    // row-for-row (counts, tokens AND integer retention shares)
    val got = graft.streaming.WaterfallMonitor.profile(store().get._1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val want = graft.operators.TextAnalysis.q268PipelineWaterfall(s0, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want, s"streamed waterfall != batch q268")
    // replay guard: applied id skips, fresh id applies
    val probe = Tables.documents(s0, sf).limit(5).select("doc_id", "source", "text")
    val bg = graft.operators.TextAnalysis.nGrams(benchDocs, 5).select(col("g")).distinct()
    val last = lastId.get
    assert(graft.streaming.WaterfallMonitor
      .waterfallBatch(store(), probe, bg, last).isEmpty)
    assert(graft.streaming.WaterfallMonitor
      .waterfallBatch(store(), probe, bg, last + 1L).isDefined)
  }

  test("s32 planted gates: cross-batch dup and contaminated doc drop at the right stage") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = s0.sqlContext
    val benchDocs = Seq((970L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val t1 = "the quick brown fox jumps over the lazy dog near the old river bank"
    val t2 = "too short"
    val t3 = "the quick brown owl waits under a tall tree while the moon rises slowly"
    val t4 = "students often study the alpha beta gamma delta epsilon zeta patterns and great interest daily"
    val counters = scala.collection.mutable.Map.empty[String, Seq[Long]]
    val seen = scala.collection.mutable.Set.empty[String]
    var lastId = Option.empty[Long]
    val cols = Seq("n0", "t0", "n1", "t1", "n2", "t2", "n3", "t3")
    def store(): Option[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, Long)] =
      lastId.map { id =>
        (counters.toSeq.map { case (src, v) =>
          (src, v(0), v(1), v(2), v(3), v(4), v(5), v(6), v(7))
        }.toDF(("source" +: cols): _*),
          seen.toSeq.toDF("content_hash"), id)
      }
    def publishDelta(delta: org.apache.spark.sql.DataFrame,
        hashes: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      delta.collect().foreach { r =>
        counters(r.getAs[String]("source")) = cols.map(r.getAs[Long](_))
      }
      hashes.collect().foreach(r => seen += r.getString(0))
      lastId = Some(batchId)
    }
    val ms = MemoryStream[(Long, String, String)]
    val q = graft.streaming.WaterfallMonitor.waterfallMonitorStream(
      ms.toDS().toDF("doc_id", "source", "text"), benchDocs, store _)(publishDelta).start()
    try {
      ms.addData(Seq((1L, "A", t1), (2L, "A", t2))); q.processAllAvailable()
      // batch 2: t3 repeats t1's first-3-words key (cross-batch dup);
      // t4 is clean-of-dup but carries a benchmark 5-gram
      ms.addData(Seq((3L, "A", t3), (4L, "A", t4))); q.processAllAvailable()
    } finally q.stop()
    // hand funnel: raw 4 docs/45 tokens; quality drops t2 (2 words);
    // dedup drops t3 (t1's hash won in batch 1); decontamination drops t4
    assert(counters("A") == Seq(4L, 45L, 3L, 43L, 2L, 29L, 1L, 14L),
      s"planted funnel drifted: ${counters("A")}")
  }

  test("s33 streaming rate monitor converges to the batch q270 dispersion table") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = s0.sqlContext
    val evs = Tables.events(s0, sf).select("event_type", "ts")
      .collect().map(r => (r.getString(0), r.getTimestamp(1))).toSeq
    val cells = scala.collection.mutable.Map.empty[(String, java.sql.Timestamp), Long]
    var lastId = Option.empty[Long]
    def store(): Option[(org.apache.spark.sql.DataFrame, Long)] =
      lastId.map { id =>
        (cells.toSeq.map { case ((t, h), c) => (t, h, c) }
          .toDF("event_type", "h", "c"), id)
      }
    def publishDelta(delta: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      delta.collect().foreach { r =>
        cells((r.getString(0), r.getTimestamp(1))) = r.getAs[Long]("c")
      }
      lastId = Some(batchId)
    }
    val ms = MemoryStream[(String, java.sql.Timestamp)]
    val q = graft.streaming.RateMonitor.rateMonitorStream(
      ms.toDS().toDF("event_type", "ts"), store _)(publishDelta).start()
    try {
      val (b1, rest) = evs.splitAt(evs.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(b3); q.processAllAvailable()
    } finally q.stop()
    // the dispersion table over MAINTAINED counts equals the batch q270
    // row-for-row (span, active hours, counts, verdict)
    val got = graft.streaming.RateMonitor.dispersion(store().get._1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    val want = graft.operators.Stats.q270ArrivalDispersion(s0, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    assert(got == want, "streamed dispersion != batch q270")
    // replay guard: applied id skips, fresh id applies
    val frag = graft.streaming.RateMonitor.fragmentOf(
      Tables.events(s0, sf).limit(10).select("event_type", "ts"))
    val last = lastId.get
    assert(graft.streaming.RateMonitor.hourlyCountsBatch(store(), frag, last).isEmpty)
    assert(graft.streaming.RateMonitor.hourlyCountsBatch(store(), frag, last + 1L).isDefined)
  }

  test("s28 dow derivation (r15): the maintained daily table serves the batch q245 verdict") {
    // the maintained-table ≡ rebuild property is s28's existing spec; this
    // pins the NEW fourth derivation: kruskalFromDaily off the maintained
    // counts equals the batch q245 table byte-for-byte
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
    val got = graft.streaming.TrendMonitor.dow(daily).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.getAs[Any]("h_x1000")).map(_.asInstanceOf[Long]),
        r.getString(4))).toSet
    val want = graft.operators.Stats.q245KruskalDow(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.getAs[Any]("h_x1000")).map(_.asInstanceOf[Long]),
        r.getString(4))).toSet
    assert(got == want, "maintained-table dow verdict != batch q245")
  }

  test("s36 streaming hotspot monitor converges to the batch q295; late weeks merge; replay skipped") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = s0.sqlContext
    val evs = Tables.events(s0, sf).select("user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSeq
    val cells = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    var lastId = Option.empty[Long]
    def store(): Option[(org.apache.spark.sql.DataFrame, Long)] =
      lastId.map { id =>
        (cells.toSeq.map { case ((x, y, w), n) => (x, y, w, n) }
          .toDF("zone_x", "zone_y", "wk", "n"), id)
      }
    def publishDelta(delta: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      delta.collect().foreach { r =>
        cells((r.getAs[Long]("zone_x"), r.getAs[Long]("zone_y"),
          r.getAs[Long]("wk"))) = r.getAs[Long]("n")
      }
      lastId = Some(batchId)
    }
    val ms = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = graft.streaming.HotspotMonitor.hotspotMonitorStream(
      ms.toDS().toDF("user_id", "ts", "value"), store _)(publishDelta).start()
    try {
      // batches split mid-stream so "late" cells for already-published
      // weeks arrive in later batches and must MERGE
      val (b1, rest) = evs.splitAt(evs.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(b3); q.processAllAvailable()
    } finally q.stop()
    // maintained cells equal the batch rebuild (the one shared fold)
    val rebuild = graft.operators.Geo.zoneWeekCellsOf(
        Tables.events(s0, sf).select("user_id", "ts", "value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(cells.toMap == rebuild, "maintained cells != batch rebuild")
    // the report over MAINTAINED cells equals the batch q295 exactly
    val got = graft.streaming.HotspotMonitor.profile(store().get._1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
    val want = graft.operators.Geo.q295HotspotPersistence(s0, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
    assert(got == want, "streamed persistence != batch q295")
    // replay guard: an already-applied id is skipped, a fresh id applies
    val frag = graft.operators.Geo.zoneWeekCellsOf(
      Tables.events(s0, sf).select("user_id", "ts", "value").limit(10))
    val last = lastId.get
    assert(graft.streaming.HotspotMonitor.cellsBatch(store(), frag, last).isEmpty)
    assert(graft.streaming.HotspotMonitor.cellsBatch(store(), frag, last + 1L).isDefined)
  }

  test("s37 streaming template monitor converges to batch q304; template onset flips the verdict next batch") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = s0.sqlContext
    val cells = scala.collection.mutable.Map.empty[(String, String), Long]
    var lastId = Option.empty[Long]
    def store(): Option[(org.apache.spark.sql.DataFrame, Long)] =
      lastId.map { id =>
        (cells.toSeq.map { case ((src, p), n) => (src, p, n) }
          .toDF("source", "prefix", "n"), id)
      }
    def publishDelta(delta: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      delta.collect().foreach { r =>
        cells((r.getAs[String]("source"), r.getAs[String]("prefix"))) =
          r.getAs[Long]("n")
      }
      lastId = Some(batchId)
    }
    val ms = MemoryStream[(String, String)]
    val q = graft.streaming.TemplateMonitor.templateMonitorStream(
      ms.toDS().toDF("source", "text"), store _)(publishDelta).start()
    def verdict(src: String): (Long, Boolean) = {
      val r = graft.streaming.TemplateMonitor.census(store().get._1)
        .filter(col("source") === src).collect().head
      (r.getAs[Long]("modal_bp"), r.getAs[Boolean]("templated"))
    }
    val docs = Tables.documents(s0, sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val hdr = "subscribe to our newsletter for the best deals"
    try {
      // wave 1: the corpus + an organic planted feed — under the bar
      val organic = (1 to 20).map(i =>
        ("pfeed", s"unique doc $i opening with its own eight tokens here"))
      ms.addData(docs ++ organic); q.processAllAvailable()
      val (bp1, t1) = verdict("pfeed")
      assert(bp1 == 500L && !t1, s"organic wave must be under the bar: $bp1")
      // wave 2: the feed grows a boilerplate header — 10 of now-30 docs
      // share the opening; the verdict flips ONE micro-batch later
      ms.addData((1 to 10).map(i => ("pfeed", s"$hdr extra tail $i")))
      q.processAllAvailable()
      val (bp2, t2) = verdict("pfeed")
      assert(bp2 == 3333L && t2, s"template onset must flip the verdict: $bp2")
    } finally q.stop()
    // maintained counts equal the batch rebuild on the corpus slice...
    val rebuild = graft.operators.TextAnalysis.prefixCountsOf(
      Tables.documents(s0, sf)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val corpusCells = cells.toMap.filter { case ((src, _), _) => src != "pfeed" }
    assert(corpusCells == rebuild, "maintained counts != batch rebuild")
    // ...and the census over MAINTAINED corpus cells equals batch q304
    val got = graft.streaming.TemplateMonitor.census(
      corpusCells.toSeq.map { case ((src, p), n) => (src, p, n) }
        .toDF("source", "prefix", "n")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
    val want = graft.operators.TextAnalysis.q304TemplatePrefix(s0, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
    assert(got == want, "streamed census != batch q304")
    // replay guard: an already-applied id is skipped, a fresh id applies
    val frag = graft.operators.TextAnalysis.prefixCountsOf(
      Tables.documents(s0, sf).limit(10))
    val last = lastId.get
    assert(graft.streaming.TemplateMonitor.prefixCountsBatch(store(), frag, last).isEmpty)
    assert(graft.streaming.TemplateMonitor.prefixCountsBatch(store(), frag, last + 1L).isDefined)
  }

}
