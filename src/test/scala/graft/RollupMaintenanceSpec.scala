package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quality

/** Mergeable-rollup maintenance: merging fragment rollups must reproduce
  * the full rebuild EXACTLY — counters, bounds, and the HLL distinct
  * estimates — whatever the fragment boundaries.
  */
class RollupMaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  private def readable(r: DataFrame): DataFrame =
    r.select(col("event_type"), col("day"), col("n_events"), col("sum_cents"),
      col("min_cents"), col("max_cents"),
      hll_sketch_estimate(col("user_sketch")).as("est_users"))

  test("merge of fragment rollups equals the full rebuild, sketches included") {
    val ev = Tables.events(spark, sf)
    val full = readable(Quality.dailyRollup(ev))
    // split mid-day by event_id parity: both fragments carry rows for the
    // SAME (type, day) cells, so the merge must genuinely combine state —
    // a day-boundary split would never exercise that
    val merged = readable(Quality.mergeRollups(
      Quality.dailyRollup(ev.filter(col("event_id") % 2 === 0)),
      Quality.dailyRollup(ev.filter(col("event_id") % 2 =!= 0))))
    assert(full.count() > 0 && full.count() == merged.count())
    assert(full.exceptAll(merged).count() == 0 && merged.exceptAll(full).count() == 0,
      "merge must be indistinguishable from a rebuild")
  }

  test("merged KLL quantile state answers range medians within the rank-error bound") {
    val ev = Tables.events(spark, sf)
    // medians from the MERGED sketch (mid-day split: both fragments feed
    // the same cells) and from the direct rebuild's sketch
    val meds = Quality.mergeRollups(
      Quality.dailyRollup(ev.filter(col("event_id") % 2 === 0)),
      Quality.dailyRollup(ev.filter(col("event_id") % 2 =!= 0)))
      .select(col("event_type"), col("day"),
        expr("kll_sketch_get_quantile_bigint(cents_sketch, 0.5)").as("sk_p50"))
      .join(Quality.dailyRollup(ev)
        .select(col("event_type"), col("day"),
          expr("kll_sketch_get_quantile_bigint(cents_sketch, 0.5)").as("rb_p50")),
        Seq("event_type", "day"))
    // KLL returns an ORDER STATISTIC (inclusive-rank quantile, no
    // interpolation), so the right bound is on the returned value's EXACT
    // normalized rank in its cell: within ±(10% + 1/n discreteness) of
    // 0.5 — KLL k=200 guarantees ~1.65%, and tiny sf0.001 cells (n≈4–12)
    // are exact in the sketch but quantized by 1/n. A broken merge
    // (double-counted fragment, dropped rows) blows far outside this.
    val cells = ev.select(col("event_type"),
      expr("unix_micros(ts) div 86400000000").as("day"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val ranks = cells.join(meds, Seq("event_type", "day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"),
        (sum(when(col("cents") <= col("sk_p50"), 1L).otherwise(0L)) /
          count(lit(1)).cast("double")).as("sk_rank"),
        (sum(when(col("cents") <= col("rb_p50"), 1L).otherwise(0L)) /
          count(lit(1)).cast("double")).as("rb_rank"))
      .collect()
    assert(ranks.nonEmpty)
    ranks.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      for (c <- Seq("sk_rank", "rb_rank")) {
        val rk = r.getAs[Double](c)
        assert(rk >= 0.5 - 0.1 && rk - 1.0 / n <= 0.5 + 0.1,
          s"${r.get(0)}/${r.get(1)}: $c=$rk (n=$n) outside the median rank window")
      }
    }
  }

  test("s10 streaming maintenance converges to the batch rebuild through a parquet store") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream
    import graft.streaming.EventStream.Event
    val dir = java.nio.file.Files.createTempDirectory("graft-rollup-").toString
    val path = s"$dir/rollup"
    val marker = java.nio.file.Paths.get(s"$dir/last_batch")
    // the published cell-partitioned table + last-applied batch id ARE the
    // state; deltas land via dynamic partition overwrite, so untouched
    // (event_type, day) cells are never rewritten. Per-WRITE option, not
    // a session conf: suites share the session, and a leaked dynamic
    // mode re-plans other suites' INSERT OVERWRITEs (it broke the graft
    // catalog's V1 truncate path under the full parallel run)
    def store(): Option[(DataFrame, Long)] =
      if (java.nio.file.Files.exists(marker))
        Some((s.read.parquet(path),
          java.nio.file.Files.readString(marker).trim.toLong))
      else None
    def publishDelta(delta: DataFrame, batchId: Long): Unit = {
      delta.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type", "day").parquet(path)
      java.nio.file.Files.writeString(marker, batchId.toString)
    }
    val events = Tables.events(s, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val (b1, b2) = events.partition(_.event_id % 2 == 0) // split mid-day
    val ms = MemoryStream[Event]
    val q = EventStream.rollupStream(ms.toDS(), store _)(publishDelta).start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val maintained = readable(s.read.parquet(path))
    val rebuild = readable(Quality.dailyRollup(Tables.events(s, sf)))
    assert(maintained.count() == rebuild.count() && rebuild.count() > 0)
    assert(maintained.exceptAll(rebuild).count() == 0 &&
      rebuild.exceptAll(maintained).count() == 0,
      "streamed maintenance must equal the batch rebuild")
    // at-least-once replay: re-applying an already-applied batch id is a
    // no-op — the additive counters would otherwise double-count
    val replayFrag = Quality.dailyRollup(
      Tables.events(s, sf).filter(col("event_id") % 2 =!= 0))
    assert(EventStream.rollupBatch(store(), replayFrag, batchId = 1L).isEmpty,
      "replayed batch must be skipped")
    assert(EventStream.rollupBatch(store(), replayFrag, batchId = 2L).isDefined,
      "a genuinely new batch must apply")
  }

  test("s10 through RollupSink: atomic generations converge to the rebuild") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{EventStream, RollupSink}
    import graft.streaming.EventStream.Event
    val path = java.nio.file.Files.createTempDirectory("graft-rollupsink-").toString + "/rollup"
    val events = Tables.events(s, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val (b1, b2) = events.partition(_.event_id % 2 == 0) // split mid-day
    val ms = MemoryStream[Event]
    val q = EventStream.rollupStream(ms.toDS(), () => RollupSink.load(s, path))(
      RollupSink.publish(s, path)).start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val Some((maintained, lastId)) = RollupSink.load(s, path)
    assert(lastId == 1L, s"two micro-batches -> last applied id 1, got $lastId")
    val rebuild = readable(Quality.dailyRollup(Tables.events(s, sf)))
    val got = readable(maintained)
    assert(got.count() == rebuild.count() && rebuild.count() > 0)
    assert(got.exceptAll(rebuild).count() == 0 && rebuild.exceptAll(got).count() == 0,
      "sink-maintained table must equal the batch rebuild")
  }

  test("RollupSink: crash between stage and commit cannot double-count") {
    val s = spark
    import graft.streaming.{EventStream, RollupSink}
    val path = java.nio.file.Files.createTempDirectory("graft-rollupcrash-").toString + "/rollup"
    val ev = Tables.events(s, sf)
    val frag0 = Quality.dailyRollup(ev.filter(col("event_id") % 2 === 0))
    val frag1 = Quality.dailyRollup(ev.filter(col("event_id") % 2 =!= 0))
    RollupSink.publish(s, path)(frag0, 0L)
    val before = readable(RollupSink.load(s, path).get._1).collect().toSet
    // batch 1 computes its merged delta and STAGES it, then the process
    // dies before the rename: nothing of batch 1 may be visible
    val delta1 = EventStream.rollupBatch(RollupSink.load(s, path), frag1, 1L).get
    RollupSink.stage(delta1, path, 1L)
    val Some((afterCrash, lastApplied)) = RollupSink.load(s, path)
    assert(lastApplied == 0L, "staged-but-uncommitted batch must not advance the id")
    assert(readable(afterCrash).collect().toSet == before,
      "staged-but-uncommitted rows must be invisible")
    // the replay then applies batch 1 exactly once (rollupBatch recomputes
    // from the store, whose id still says 0) and the result is the rebuild
    val replayed = EventStream.rollupBatch(RollupSink.load(s, path), frag1, 1L)
    assert(replayed.isDefined, "replay of the lost batch must apply")
    RollupSink.publish(s, path)(replayed.get, 1L)
    // a second retry of the SAME commit (success report lost after the
    // rename) is discarded by the sink, and rollupBatch skips it anyway
    RollupSink.publish(s, path)(replayed.get, 1L)
    assert(EventStream.rollupBatch(RollupSink.load(s, path), frag1, 1L).isEmpty)
    val got = readable(RollupSink.load(s, path).get._1)
    val rebuild = readable(Quality.dailyRollup(ev))
    assert(got.exceptAll(rebuild).count() == 0 && rebuild.exceptAll(got).count() == 0,
      "after crash + replay + duplicate retry the table equals the rebuild")
  }

  test("RollupSink.gc removes exactly the shadowed generations, load unchanged") {
    val s = spark
    import graft.streaming.{EventStream, RollupSink}
    val path = java.nio.file.Files.createTempDirectory("graft-rollupgc-").toString + "/rollup"
    val ev = Tables.events(s, sf)
    // batch 0: everything; batch 1: a fragment touching EVERY cell again
    // (rollupBatch emits fully-merged replacement rows for touched cells,
    // so gen=0 becomes fully shadowed); batch 2: a single-day fragment
    RollupSink.publish(s, path)(Quality.dailyRollup(ev), 0L)
    val frag1 = Quality.dailyRollup(ev) // touches all cells
    RollupSink.publish(s, path)(
      EventStream.rollupBatch(RollupSink.load(s, path), frag1, 1L).get, 1L)
    val day0 = ev.select(expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(min("d")).collect()(0).getLong(0)
    val frag2 = Quality.dailyRollup(
      ev.filter(expr(s"unix_micros(ts) div 86400000000 = $day0")))
    RollupSink.publish(s, path)(
      EventStream.rollupBatch(RollupSink.load(s, path), frag2, 2L).get, 2L)
    val before = readable(RollupSink.load(s, path).get._1).collect().toSet
    val deleted = RollupSink.gc(s, path)
    // gen=0 is fully shadowed by gen=1; gen=1 still carries the newest
    // copy of every non-day0 cell; gen=2 is the max
    assert(deleted == Seq(0L), s"deleted $deleted")
    val Some((after, lastId)) = RollupSink.load(s, path)
    assert(lastId == 2L)
    assert(readable(after).collect().toSet == before,
      "gc must not change the reconstructed table")
    // idempotent: nothing left to collect
    assert(RollupSink.gc(s, path).isEmpty)
  }

  test("merge is associative across a three-way split") {
    val ev = Tables.events(spark, sf)
    val frags = (0 until 3).map(i => Quality.dailyRollup(ev.filter(col("event_id") % 3 === i)))
    val leftAssoc = readable(Quality.mergeRollups(Quality.mergeRollups(frags(0), frags(1)), frags(2)))
    val rightAssoc = readable(Quality.mergeRollups(frags(0), Quality.mergeRollups(frags(1), frags(2))))
    assert(leftAssoc.exceptAll(rightAssoc).count() == 0 &&
      rightAssoc.exceptAll(leftAssoc).count() == 0)
  }
}
