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
    // (event_type, day) cells are never rewritten
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    def store(): Option[(DataFrame, Long)] =
      if (java.nio.file.Files.exists(marker))
        Some((s.read.parquet(path),
          java.nio.file.Files.readString(marker).trim.toLong))
      else None
    def publishDelta(delta: DataFrame, batchId: Long): Unit = {
      delta.write.mode("overwrite").partitionBy("event_type", "day").parquet(path)
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

  test("merge is associative across a three-way split") {
    val ev = Tables.events(spark, sf)
    val frags = (0 until 3).map(i => Quality.dailyRollup(ev.filter(col("event_id") % 3 === i)))
    val leftAssoc = readable(Quality.mergeRollups(Quality.mergeRollups(frags(0), frags(1)), frags(2)))
    val rightAssoc = readable(Quality.mergeRollups(frags(0), Quality.mergeRollups(frags(1), frags(2))))
    assert(leftAssoc.exceptAll(rightAssoc).count() == 0 &&
      rightAssoc.exceptAll(leftAssoc).count() == 0)
  }
}
