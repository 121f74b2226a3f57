package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graft-changefeed streaming source: a CommitLog table read AS a
  * stream, offsets = commit versions, batch contents = changesSince's
  * rows per version window.
  */
class ChangeFeedSourceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-cfeed").toString + "/tbl"

  private def batchDf(lo: Int, hi: Int) =
    (lo to hi).map(i => (i.toLong, s"row$i")).toDF("id", "v")

  test("change feed streams appends and merge updates; rewrites and deletes stay silent") {
    val root = freshRoot()
    CommitLog.append(batchDf(1, 10).coalesce(1), root, statsFor = Seq("id")) // v1
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[(Long, String)])]
    val q = spark.readStream.format("graft-changefeed")
      .option("path", root)
      .load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-cfeed-ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        seen.synchronized {
          seen += id -> b.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
        }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      // batch 0 drains everything from startingVersion 0: the v1 rows
      assert(seen.synchronized(seen.flatMap(_._2).toSet) ==
        (1 to 10).map(i => (i.toLong, s"row$i")).toSet)
      // append (new rows flow) …
      CommitLog.append(batchDf(11, 15).coalesce(1), root, statsFor = Seq("id")) // v2
      // … compact (re-adds NOTHING to the feed) …
      CommitLog.compact(spark, root, statsFor = Seq("id")) // v3
      // … merge (update rows only — survivor rewrites silent) …
      CommitLog.merge(Seq((3L, "upd3"), (99L, "new99")).toDF("id", "v").coalesce(1),
        root, "id") // v4
      // … delete (NOTHING flows)
      CommitLog.delete(spark, root, "id", Seq(7L)) // v5
      q.processAllAvailable()
      val later = seen.synchronized(seen.filter(_._1 > 0).flatMap(_._2))
      assert(later.toSet ==
        ((11 to 15).map(i => (i.toLong, s"row$i")).toSet ++ Set((3L, "upd3"), (99L, "new99"))),
        s"unexpected feed content: $later")
    } finally q.stop()
    // the table itself reflects every mutation the feed stayed silent on:
    // 10 seed + 5 appended + 1 inserted (99) − 1 deleted (7) = 15
    assert(CommitLog.snapshot(spark, root).count() == 15)
  }

  test("startingVersion skips history; a fresh stream drains only newer versions") {
    val root = freshRoot()
    CommitLog.append(batchDf(1, 10).coalesce(1), root) // v1 — history
    val deployAt = CommitLog.headVersion(spark, root)
    CommitLog.append(batchDf(11, 12).coalesce(1), root) // v2 — new
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-changefeed")
      .option("path", root)
      .option("startingVersion", deployAt.toString)
      .load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-cfeed-ckpt2").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got.synchronized { got ++= b.collect().map(_.getLong(0)) }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      assert(got.synchronized(got.sorted.toSeq) == Seq(11L, 12L))
    } finally q.stop()
  }

  test("CDC relay chain: changefeed source into the s22 sink replicates new rows table-to-table") {
    import graft.streaming.CommitLogSink
    val src = freshRoot()
    val dst = freshRoot()
    CommitLog.append(batchDf(1, 5).coalesce(1), src, statsFor = Seq("id"))
    // the relay: src's change feed streamed exactly-once into dst — one
    // table version per micro-batch on the far side (s22's contract)
    val q = CommitLogSink.appendStream(
      spark.readStream.format("graft-changefeed").option("path", src).load(),
      dst, Files.createTempDirectory("graft-relay-ckpt").toString,
      statsFor = Seq("id"))
    try {
      q.processAllAvailable()
      CommitLog.merge(Seq((3L, "upd3"), (9L, "new9")).toDF("id", "v").coalesce(1),
        src, "id")
      CommitLog.delete(spark, src, "id", Seq(1L))
      q.processAllAvailable()
      // dst accumulated: the seed + the merge's update rows; the delete
      // relayed nothing (retraction is not feed content)
      val got = CommitLog.snapshot(spark, dst).as[(Long, String)]
        .collect().sorted.toSeq
      val expect = ((1 to 5).map(i => (i.toLong, s"row$i")) ++
        Seq((3L, "upd3"), (9L, "new9"))).sorted
      assert(got == expect)
    } finally q.stop()
  }

  test("backfill admission control: maxVersionsPerBatch splits history into bounded batches, rows exactly-once") {
    val root = freshRoot()
    (1 to 6).foreach(i => // six 1-file versions of deep history
      CommitLog.append(batchDf(i * 10 + 1, i * 10 + 5).coalesce(1), root))
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val q = spark.readStream.format("graft-changefeed")
      .option("path", root)
      .option("maxVersionsPerBatch", "2")
      .load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-cfeed-adm").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        seen.synchronized { seen += id -> b.collect().map(_.getLong(0)).sorted.toSeq }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      val batches = seen.synchronized(seen.filter(_._2.nonEmpty).toVector)
      // 6 versions / 2 per batch = 3 bounded micro-batches, not one giant one
      assert(batches.size == 3, s"expected 3 bounded batches, got: $batches")
      // each batch = exactly 2 whole versions (10 rows); nothing split
      assert(batches.forall(_._2.size == 10), s"a version was split: $batches")
      // exactly-once across the whole backfill: every row once
      val all = batches.flatMap(_._2)
      assert(all.size == all.distinct.size)
      assert(all.sorted == (1 to 6).flatMap(i => (i * 10 + 1) to (i * 10 + 5)).map(_.toLong))
    } finally q.stop()
  }

  test("admission control by files: maxFilesPerBatch packs versions greedily, one version minimum") {
    val root = freshRoot()
    CommitLog.append(batchDf(1, 8).repartition(2), root)   // v1: 2 files
    CommitLog.append(batchDf(11, 18).repartition(2), root) // v2: 2 files
    CommitLog.append(batchDf(21, 28).repartition(4), root) // v3: 4 files > cap — atomic anyway
    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val q = spark.readStream.format("graft-changefeed")
      .option("path", root)
      .option("maxFilesPerBatch", "3")
      .load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-cfeed-admf").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.synchronized { seen += b.collect().map(_.getLong(0)).sorted.toSeq }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      val batches = seen.synchronized(seen.filter(_.nonEmpty).toVector)
      // v1 alone (v1+v2 = 4 files > 3), then v2 alone, then v3 whole
      // (4 files exceed the cap but a version is the atomic unit)
      assert(batches.map(_.toSet) == Vector(
        (1L to 8L).toSet, (11L to 18L).toSet, (21L to 28L).toSet),
        s"unexpected batch packing: $batches")
    } finally q.stop()
  }

  test("admission control survives a restart: persisted cursor, no replayed or skipped version") {
    val root = freshRoot()
    (1 to 6).foreach(i =>
      CommitLog.append(batchDf(i * 10 + 1, i * 10 + 5).coalesce(1), root))
    val ckpt = Files.createTempDirectory("graft-cfeed-restart").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    def run(): Unit = {
      val q = spark.readStream.format("graft-changefeed")
        .option("path", root)
        .option("maxVersionsPerBatch", "2")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          got.synchronized { got ++= b.collect().map(_.getLong(0)) }: Unit
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // drains the 6-version backfill in bounded batches, then stops
    // restart against the SAME checkpoint with a fully-committed offset
    // log: the engine's first call is getOffset — an unpersisted cursor
    // would hand back a stale bounded offset, regress the committed
    // offset, and replay versions 3..6 (review finding)
    CommitLog.append(batchDf(71, 75).coalesce(1), root) // v7 — new data
    CommitLog.append(batchDf(81, 85).coalesce(1), root) // v8
    run()
    val all = got.synchronized(got.sorted.toVector)
    val expect = ((1 to 6).flatMap(i => (i * 10 + 1) to (i * 10 + 5)) ++
      (71 to 75) ++ (81 to 85)).map(_.toLong).sorted.toVector
    assert(all == expect, s"replayed or lost rows across restart: " +
      s"got ${all.size}, expected ${expect.size} — dupes: " +
      all.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted.take(10).toString)
  }

  test("CDC apply chain survives a crash between merge commit and checkpoint commit: exactly-once vs the batch merge") {
    import graft.streaming.UpsertSink
    val src = freshRoot()
    val batchDst = freshRoot()  // the reference: merge applied version-at-a-time
    val streamDst = freshRoot() // the chain under test
    // 8-version CDC history over 10 keys, half the keys touched per
    // version with an increasing ver column
    def cdc(vn: Int) = (1 to 10).filter(i => (i + vn) % 2 == 0)
      .map(i => (i.toLong, s"k$i-v$vn", vn.toLong)).toDF("id", "v", "ver")
    (1 to 6).foreach(vn =>
      CommitLog.append(cdc(vn).coalesce(1), src, statsFor = Seq("id")))
    val ckpt = Files.createTempDirectory("graft-upsert-crash").toString
    def run(): Unit = {
      val q = UpsertSink.upsertStream(
        spark.readStream.format("graft-changefeed")
          .option("path", src).option("maxVersionsPerBatch", "2").load(),
        streamDst, "id", ckpt, latestBy = Some("ver"))
      try q.processAllAvailable() finally q.stop()
    }
    run() // admission control drains the backfill as 3 bounded batches
    val versionsAfterDrain = CommitLog.log(spark, streamDst).size
    // crash window: batch 2's merge committed to the TABLE but the
    // checkpoint lost its commit marker (a kill between the data write
    // and the checkpoint commit). On restart the engine replays batch 2
    // from offsets/2 — the merge's txn token must no-op BEFORE any data
    // write, or the chain is only at-least-once.
    // delete via the Hadoop fs so the checksum shadow file goes with it
    // (a raw java.io delete leaves commits/.2.crc behind and the re-write
    // fails as FileAlreadyExists inside ChecksumFileSystem)
    val hfs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sessionState.newHadoopConf())
    val commit2 = new org.apache.hadoop.fs.Path(s"$ckpt/commits/2")
    assert(hfs.exists(commit2), "test setup: expected 3 committed micro-batches")
    assert(hfs.delete(commit2, false))
    CommitLog.append(cdc(7).coalesce(1), src, statsFor = Seq("id")) // v7
    CommitLog.append(cdc(8).coalesce(1), src, statsFor = Seq("id")) // v8
    run() // replays batch 2 (must no-op), then drains v7..v8
    // the replayed merge wrote NO new table version — only v7/v8's batch did
    assert(CommitLog.log(spark, streamDst).size == versionsAfterDrain + 1,
      s"replayed batch must no-op: $versionsAfterDrain versions before, " +
        s"${CommitLog.log(spark, streamDst).size} after")
    // exactly-once row parity with the batch merge
    (1 to 8).foreach(vn => CommitLog.merge(cdc(vn).coalesce(1), batchDst, "id"))
    val got = CommitLog.snapshot(spark, streamDst)
      .as[(Long, String, Long)].collect().sorted.toSeq
    val want = CommitLog.snapshot(spark, batchDst)
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(got == want, s"streamed upsert != batch merge\n$got\n$want")
    // and both equal the driver-side latest-version-per-key fold
    val expect = (1 to 8).flatMap(vn => (1 to 10).filter(i => (i + vn) % 2 == 0)
      .map(i => (i.toLong, s"k$i-v$vn", vn.toLong)))
      .groupBy(_._1).map(kv => kv._2.maxBy(_._3)).toSeq.sorted
    assert(got == expect, s"latest-version fold mismatch\n$got\n$expect")
  }

  test("a drained-empty table still starts a stream: schema pins from the newest committed file") {
    val root = freshRoot()
    CommitLog.append(batchDf(1, 3).coalesce(1), root)
    CommitLog.delete(spark, root, "id", Seq(1L, 2L, 3L)) // survivors: none
    assert(CommitLog.liveFiles(spark, root).isEmpty ||
      CommitLog.snapshot(spark, root).count() == 0)
    val deployAt = CommitLog.headVersion(spark, root)
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-changefeed")
      .option("path", root)
      .option("startingVersion", deployAt.toString)
      .load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-cfeed-empty").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got.synchronized { got ++= b.collect().map(_.getLong(0)) }: Unit
      }
      .start()
    try {
      q.processAllAvailable() // idles: nothing live, nothing new
      assert(got.synchronized(got.isEmpty))
      CommitLog.append(batchDf(11, 12).coalesce(1), root) // wake on first commit
      q.processAllAvailable()
      assert(got.synchronized(got.sorted.toSeq) == Seq(11L, 12L))
    } finally q.stop()
  }

  test("a table whose committed files are gone from disk pins with the actionable error, not FileNotFoundException") {
    val root = freshRoot()
    CommitLog.append(batchDf(1, 3).coalesce(1), root)
    // every committed data file physically reclaimed (a fully-vacuumed /
    // externally-cleaned table): the schema pin must fall through to the
    // actionable error instead of a raw FileNotFoundException from the
    // first stale path it tries
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(): Unit
    }
    new java.io.File(root).listFiles().filter(_.getName.startsWith("d-")).foreach(rm)
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-changefeed").option("path", root).load()
    }
    assert(e.getMessage.contains(".schema("), e.getMessage)
  }

  test("a never-written table needs an explicit schema, then streams from the first commit") {
    val root = freshRoot()
    // no schema to pin from: loud, actionable reject
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-changefeed").option("path", root).load()
    }
    assert(e.getMessage.contains("schema"), e.getMessage)
    // with an explicit schema the stream starts idle and wakes on commit
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-changefeed")
      .option("path", root)
      .schema(batchDf(1, 1).schema)
      .load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-cfeed-never").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got.synchronized { got ++= b.collect().map(_.getLong(0)) }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      CommitLog.append(batchDf(5, 6).coalesce(1), root)
      q.processAllAvailable()
      assert(got.synchronized(got.sorted.toSeq) == Seq(5L, 6L))
    } finally q.stop()
  }

  test("an incompatible mid-stream type swap fails the stream loudly, matching batch semantics") {
    val root = freshRoot()
    CommitLog.append(batchDf(1, 3).coalesce(1), root) // pins (id LONG, v STRING)
    val q = spark.readStream.format("graft-changefeed").option("path", root).load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-cfeed-swap").toString)
      .foreachBatch { (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => (): Unit }
      .start()
    try {
      q.processAllAvailable()
      // v becomes LONG mid-stream: the blind cast would quietly corrupt
      // the feed (long→string here; string→long nulls) — must THROW
      CommitLog.append(Seq((4L, 42L)).toDF("id", "v").coalesce(1), root)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: chain(t.getCause)
      assert(chain(e).exists(_.getMessage != null) &&
        chain(e).exists(t => t.getMessage != null &&
          t.getMessage.contains("evolved incompatibly mid-stream")),
        s"wrong failure: ${chain(e).map(_.getMessage)}")
    } finally q.stop()
  }

  test("the stream survives a table evolution mid-flight: aligned to its pinned schema") {
    val root = freshRoot()
    CommitLog.append(batchDf(1, 3).coalesce(1), root) // (id LONG, v STRING)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = spark.readStream.format("graft-changefeed").option("path", root).load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-cfeed-ckpt3").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got.synchronized { got ++= b.collect().map(r => (r.getLong(0), r.getString(1))) }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      // evolution AFTER the pin: a batch with an ADDED column (w) and an
      // INT-typed id (widened at read) — the stream must keep flowing,
      // aligned to its pinned (id LONG, v STRING) schema
      CommitLog.append(Seq((4, "row4", 8L)).toDF("id", "v", "w").coalesce(1), root)
      q.processAllAvailable()
      assert(got.synchronized(got.sorted.toSeq) ==
        (1 to 4).map(i => (i.toLong, s"row$i")).sorted)
    } finally q.stop()
  }
}
