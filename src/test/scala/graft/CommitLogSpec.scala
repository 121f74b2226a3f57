package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The commit-log table format: versioned snapshots, time travel,
  * optimistic concurrency, exactly-once tokens, compaction, vacuum,
  * crash-litter invisibility.
  */
class CommitLogSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-commitlog").toString + "/tbl"

  private def batch(lo: Int, hi: Int) =
    (lo to hi).map(i => (i.toLong, s"row$i")).toDF("id", "v")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("appends version the table; snapshots are exact; time travel replays the prefix") {
    val root = freshRoot()
    assert(CommitLog.append(batch(1, 10), root) == Some(1L))
    assert(CommitLog.append(batch(11, 20), root) == Some(2L))
    assert(CommitLog.append(batch(21, 30), root) == Some(3L))
    assert(CommitLog.headVersion(spark, root) == 3L)
    assert(ids(CommitLog.snapshot(spark, root)) == (1L to 30L))
    assert(ids(CommitLog.snapshot(spark, root, asOf = 1)) == (1L to 10L))
    assert(ids(CommitLog.snapshot(spark, root, asOf = 2)) == (1L to 20L))
  }

  test("timestamp time travel: mtime semantics, tie rule, pre-table error, checkpoint clamp") {
    val root = freshRoot()
    CommitLog.append(batch(1, 10), root)
    CommitLog.append(batch(11, 20), root)
    CommitLog.append(batch(21, 30), root)
    // pin the entry mtimes so the spec is deterministic at ms granularity
    def entry(v: Long) = new java.io.File(f"$root/_graft_log/$v%020d.json")
    assert(entry(1).setLastModified(10000L))
    assert(entry(2).setLastModified(20000L))
    assert(entry(3).setLastModified(20000L)) // tie: max version wins
    assert(CommitLog.versionAsOfTime(spark, root, 10000L) == 1L)
    assert(CommitLog.versionAsOfTime(spark, root, 19999L) == 1L)
    assert(CommitLog.versionAsOfTime(spark, root, 20000L) == 3L)
    assert(CommitLog.versionAsOfTime(spark, root, Long.MaxValue) == 3L)
    assert(ids(CommitLog.snapshotAsOfTime(spark, root, 15000L)) == (1L to 10L))
    assert(ids(CommitLog.snapshotAsOfTime(spark, root, 20000L)) == (1L to 30L))
    // an instant before the first commit is unreadable — same as Delta
    intercept[IllegalArgumentException] {
      CommitLog.versionAsOfTime(spark, root, 9999L)
    }
    // a checkpoint over INTACT history must not change timestamp
    // resolution: the original entries still carry the authoritative
    // mtimes, so a pre-first-commit instant stays an error (clamping it
    // to the checkpoint would silently serve the head-at-checkpoint
    // version for a time at which the table did not exist) and
    // in-history instants resolve exactly as before
    val cp = CommitLog.checkpoint(spark, root)
    intercept[IllegalArgumentException] {
      CommitLog.versionAsOfTime(spark, root, 9999L)
    }
    assert(CommitLog.versionAsOfTime(spark, root, 10000L) == 1L)
    // checkpoint clamp: once older entries are compacted away, an early
    // instant resolves to the earliest reconstructable version
    (1L to cp).foreach(v => entry(v).delete())
    assert(CommitLog.versionAsOfTime(spark, root, 9999L) == cp)
    assert(ids(CommitLog.snapshotAsOfTime(spark, root, 9999L)) == (1L to 30L))
  }

  test("overwrite replaces contents at head; older versions still read the old files") {
    val root = freshRoot()
    CommitLog.append(batch(1, 10), root)
    val v = CommitLog.overwrite(batch(100, 105), root)
    assert(v == 2L)
    assert(ids(CommitLog.snapshot(spark, root)) == (100L to 105L))
    assert(ids(CommitLog.snapshot(spark, root, asOf = 1)) == (1L to 10L))
  }

  test("compact folds files in one commit without changing rows; time travel intact") {
    val root = freshRoot()
    (0 until 4).foreach(i => CommitLog.append(batch(i * 10 + 1, i * 10 + 10), root))
    val filesBefore = CommitLog.liveFiles(spark, root)
    assert(filesBefore.size >= 4)
    val v = CommitLog.compact(spark, root)
    assert(v == 5L)
    assert(CommitLog.liveFiles(spark, root).size < filesBefore.size)
    assert(ids(CommitLog.snapshot(spark, root)) == (1L to 40L))
    // a reader pinned before the compaction resolves the ORIGINAL files
    assert(CommitLog.liveFiles(spark, root, asOf = 4) == filesBefore)
    assert(ids(CommitLog.snapshot(spark, root, asOf = 4)) == (1L to 40L))
  }

  test("optimistic concurrency: a lost commit race retries onto the next version") {
    val root = freshRoot()
    CommitLog.append(batch(1, 10), root)
    // simulate a racing writer: pre-commit version 2 by hand
    val racer = batch(900, 901)
    assert(CommitLog.append(racer, root) == Some(2L))
    // our append serializes after it — no lost update, no double write
    assert(CommitLog.append(batch(11, 20), root) == Some(3L))
    assert(ids(CommitLog.snapshot(spark, root)) ==
      ((1L to 20L) ++ Seq(900L, 901L)).sorted)
  }

  test("exactly-once txn token: a replayed append is a no-op") {
    val root = freshRoot()
    assert(CommitLog.append(batch(1, 10), root, txnId = Some("batch-7")) == Some(1L))
    assert(CommitLog.append(batch(1, 10), root, txnId = Some("batch-7")) == None)
    assert(CommitLog.append(batch(11, 12), root, txnId = Some("batch-8")) == Some(2L))
    assert(ids(CommitLog.snapshot(spark, root)) == (1L to 12L))
    // the replay wrote NO new data dir (pre-check skips the write too)
    val f = new java.io.File(root)
    assert(f.listFiles().count(_.getName.startsWith("d-")) == 2)
  }

  test("txn tokens with quotes/backslashes round-trip: replay still no-ops") {
    val root = freshRoot()
    // caller-supplied free text: the codec must unescape on read or the
    // replayed token never matches and exactly-once silently breaks
    val nasty = """batch "7" with \backslash\ and, comma"""
    assert(CommitLog.append(batch(1, 5), root, txnId = Some(nasty)) == Some(1L))
    assert(CommitLog.log(spark, root).head.txnId.contains(nasty))
    assert(CommitLog.append(batch(1, 5), root, txnId = Some(nasty)).isEmpty)
    assert(ids(CommitLog.snapshot(spark, root)) == (1L to 5L))
    // the lost-token-race data dir is reclaimed, not leaked: force the
    // post-write race by bypassing the cheap pre-check path — simulate
    // with a fresh token whose commit loses to a pre-created entry is
    // covered by the concurrency test; here pin the dir count stays 1
    assert(new java.io.File(root).listFiles().count(_.getName.startsWith("d-")) == 1)
  }

  test("codec property: enc/dec round-trips 500 random commits incl. hostile strings") {
    val rnd = new scala.util.Random(99)
    val nastyPool = Seq("plain", "with space", "q\"uote", "back\\slash",
      "comma,inside", "bracket]close", "[open", "{\"add\":[\"fake\"]}",
      "\"txn\":\"inject\"", "unicode ☃ ü", "tab\tchar", "newline\nchar",
      "carriage\rreturn", "bell\u0007null\u0000esc\u001b", "trailing\\")
    def nasty(): String = nastyPool(rnd.nextInt(nastyPool.length)) + rnd.nextInt(100)
    def path(): String = s"d-${rnd.nextInt(1000)}/part-${rnd.nextInt(1000)}.parquet"
    (1 to 500).foreach { i =>
      val c = CommitLog.Commit(
        version = rnd.nextInt(1 << 20).toLong + 1,
        op = Seq("append", "overwrite", "compact", "checkpoint")(rnd.nextInt(4)),
        add = Seq.fill(rnd.nextInt(4))(path()),
        remove = Seq.fill(rnd.nextInt(3))(path()),
        txnId = if (rnd.nextBoolean()) Some(nasty()) else None,
        stats = Seq.fill(rnd.nextInt(3))(CommitLog.FileStat(
          path(), s"c${rnd.nextInt(5)}", rnd.nextLong(), rnd.nextLong()))
          .map(st => st.copy(min = math.min(st.min, st.max),
            max = math.max(st.min, st.max))),
        txns = Seq.fill(rnd.nextInt(3))(nasty()))
      val cWithRewrite = c.copy(rewrite = c.add.take(rnd.nextInt(c.add.size + 1)))
      val enc = CommitLog.enc(cWithRewrite)
      val back = CommitLog.dec(cWithRewrite.version, enc)
      assert(back == cWithRewrite, s"round-trip $i diverged:\n $cWithRewrite\n $back\n $enc")
      // the standard-JSON contract: control characters must be escaped,
      // so external tools (jq, debugging scripts) can parse the log
      assert(!enc.exists(_ < 0x20), s"raw control char in entry $i: $enc")
    }
  }

  test("externally rewritten entries decode: \\b/\\f, \\uXXXX, malformed \\u passthrough") {
    // the object doc advertises standard-JSON interop: a conforming
    // external tool may rewrite our \u0008/\u000c forms as \b/\f, and a
    // corrupt/hand-edited entry must degrade to lenient passthrough, not
    // throw NumberFormatException out of the reader (round-10 advice)
    // built from escaped literals, not triple quotes: scalac's own
    // \u source processing must not pre-decode the sequences under test
    val json = "{\"version\":7,\"op\":\"append\",\"add\":[" +
      "\"a\\b\",\"b\\f\",\"c\\u0041x\",\"d\\" + "uZZZZ\",\"e\\q\",\"f\\" + "u00\"" +
      "],\"remove\":[]}"
    val back = CommitLog.dec(7L, json)
    assert(back.add == Seq("a\b", "b\f", "cAx", "duZZZZ", "eq", "fu00"))
    assert(back.remove.isEmpty)
  }

  /** Every id present in any parquet file still on disk under root —
    * the physical-bytes view vacuum's GDPR proof needs (the log-resolved
    * snapshot view would hide removed-but-unreclaimed files). */
  private def idsOnDisk(root: String): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      .iterator().asScala.map(_.toString)
      .filter(_.endsWith(".parquet")).toSeq
    if (files.isEmpty) Seq.empty
    else spark.read.parquet(files: _*).select("id")
      .collect().map(_.getLong(0)).distinct.sorted.toSeq
  }

  test("delete is delta-sized: only stat-admissible files rewritten; vacuum is the GDPR proof") {
    val root = freshRoot()
    CommitLog.append(batch(1, 10).coalesce(1), root, statsFor = Seq("id"))
    CommitLog.append(batch(11, 20).coalesce(1), root, statsFor = Seq("id"))
    CommitLog.append(batch(21, 30).coalesce(1), root, statsFor = Seq("id"))
    val before = CommitLog.liveFiles(spark, root)
    assert(before.size == 3)
    // keys outside every file's [min,max]: nothing admissible, nothing committed
    assert(CommitLog.delete(spark, root, "id", Seq(999L)).isEmpty)
    assert(CommitLog.headVersion(spark, root) == 3L)
    val v = CommitLog.delete(spark, root, "id", Seq(15L, 17L))
    assert(v.contains(4L))
    assert(ids(CommitLog.snapshot(spark, root)) ==
      (1L to 30L).filterNot(Seq(15L, 17L).contains))
    // delta-sized: the two untouched files keep their IDENTITY (no rewrite)
    val after = CommitLog.liveFiles(spark, root)
    assert(after.toSet.intersect(before.toSet) == Set(before(0), before(2)))
    val entry = CommitLog.log(spark, root).last
    assert(entry.op == "delete" && entry.remove == Seq(before(1)))
    // rewritten survivors re-embed key stats: future range scans still skip
    assert(entry.stats.nonEmpty && entry.stats.forall(_.column == "id"))
    // time travel still serves the pre-delete rows until vacuum
    assert(ids(CommitLog.snapshot(spark, root, asOf = 3)) == (1L to 30L))
    assert(idsOnDisk(root).contains(15L)) // corpse still physically present
    CommitLog.vacuum(spark, root)
    // the GDPR proof: NO data file on disk holds a deleted key anymore
    val disk = idsOnDisk(root)
    assert(!disk.contains(15L) && !disk.contains(17L))
    assert(ids(CommitLog.snapshot(spark, root)) ==
      (1L to 30L).filterNot(Seq(15L, 17L).contains))
  }

  test("delete rewrites stat-less files: no stats means no skipping, never a missed delete") {
    val root = freshRoot()
    CommitLog.append(batch(1, 10).coalesce(1), root) // NO statsFor
    val before = CommitLog.liveFiles(spark, root)
    // key far outside the actual data: without stats the file must still
    // be rewritten (the snapshotRange superset rule, inverted)
    val v = CommitLog.delete(spark, root, "id", Seq(999L))
    assert(v.contains(2L))
    assert(CommitLog.liveFiles(spark, root).toSet.intersect(before.toSet).isEmpty)
    assert(ids(CommitLog.snapshot(spark, root)) == (1L to 10L))
  }

  test("merge equals a full latest-wins rebuild; exact probe keeps range-overlapped files") {
    val root = freshRoot()
    CommitLog.append(batch(1, 10).coalesce(1), root, statsFor = Seq("id"))
    CommitLog.append(batch(11, 20).coalesce(1), root, statsFor = Seq("id"))
    CommitLog.append(batch(21, 30).coalesce(1), root, statsFor = Seq("id"))
    val before = CommitLog.liveFiles(spark, root)
    // key range [12, 35] stats-admits files 2 AND 3, but only file 2
    // actually HOLDS an updated key — the exact probe must spare file 3
    val updates = Seq((12L, "upd12"), (35L, "new35")).toDF("id", "v").coalesce(1)
    val v = CommitLog.merge(updates, root, "id")
    assert(v.contains(4L))
    val got = CommitLog.snapshot(spark, root).as[(Long, String)].collect().sorted.toSeq
    val expected = ((1L to 30L).filterNot(_ == 12L).map(i => (i, s"row$i")) ++
      Seq((12L, "upd12"), (35L, "new35"))).sorted
    assert(got == expected) // == full rebuild: target anti updated-keys, union updates
    val after = CommitLog.liveFiles(spark, root)
    assert(after.toSet.intersect(before.toSet) == Set(before(0), before(2)))
    val entry = CommitLog.log(spark, root).last
    assert(entry.op == "merge" && entry.remove == Seq(before(1)))
    // time travel below the merge reads the pre-merge table
    assert(ids(CommitLog.snapshot(spark, root, asOf = 3)) == (1L to 30L))
  }

  test("merge: empty table inserts; disjoint keys touch nothing; schema mismatch is loud") {
    val root = freshRoot()
    assert(CommitLog.merge(batch(1, 5).coalesce(1), root, "id").contains(1L))
    assert(ids(CommitLog.snapshot(spark, root)) == (1L to 5L))
    val before = CommitLog.liveFiles(spark, root)
    // keys hitting no live file: pure insert, every existing file untouched
    assert(CommitLog.merge(batch(100, 102).coalesce(1), root, "id").contains(2L))
    assert(CommitLog.liveFiles(spark, root).toSet.intersect(before.toSet) == before.toSet)
    assert(ids(CommitLog.snapshot(spark, root)) == ((1L to 5L) ++ (100L to 102L)))
    val bad = Seq((1L, "x", 9L)).toDF("id", "v", "extra")
    val e = intercept[IllegalArgumentException] { CommitLog.merge(bad, root, "id") }
    assert(e.getMessage.contains("does not match table schema"))
    // NAME AND TYPE: an int-typed id next to the table's long id must be
    // loud, not a silent write into the mixed-schema state
    val badType = Seq((1, "x")).toDF("id", "v") // id INT vs table's LONG
    val e2 = intercept[IllegalArgumentException] { CommitLog.merge(badType, root, "id") }
    assert(e2.getMessage.contains("does not match table schema"))
    // a non-integral, non-string key (binary here) would cast to null in
    // either pruning domain and misroute the merge into a pure insert
    // (duplicated keys) — rejected loudly instead. (STRING keys are
    // supported since r19 — see the string-key merge test below.)
    val sroot = freshRoot()
    val bkeyed = Seq((Array[Byte](1), "a")).toDF("id", "v")
    val e3 = intercept[IllegalArgumentException] { CommitLog.merge(bkeyed, sroot, "id") }
    assert(e3.getMessage.contains("must be an integral or string type"))
  }

  test("string keys (r19): keyImage parity, bloom-pruned merge stays delta-sized, deleteStrings, probe pruning") {
    // 1. the driver-side key image replays Spark's xxhash64 bit-for-bit
    val probeStrs = Seq("doc-1", "", "ünïcode-文档", "a" * 300)
    val sparkHashes = probeStrs.toDF("s")
      .select(xxhash64(col("s"))).collect().map(_.getLong(0)).toSeq
    assert(sparkHashes == probeStrs.map(CommitLog.keyImage),
      "keyImage must equal Spark's xxhash64(string) or every bloom probe misreads")

    // 2. a string-keyed table built from merges (each lands key blooms)
    val root = freshRoot()
    def docs(lo: Int, hi: Int) =
      (lo to hi).map(i => (f"doc-$i%04d", s"body$i")).toDF("doc_id", "body")
    assert(CommitLog.merge(docs(1, 10).coalesce(1), root, "doc_id").contains(1L))
    assert(CommitLog.merge(docs(11, 20).coalesce(1), root, "doc_id").contains(2L))
    assert(CommitLog.merge(docs(21, 30).coalesce(1), root, "doc_id").contains(3L))
    val before = CommitLog.liveFiles(spark, root)
    assert(before.size == 3)

    // 3. probe pruning: a key only file 2 holds keeps exactly file 2
    val kept = CommitLog.probeFilesString(spark, root, "doc_id", Seq("doc-0015"))
    assert(kept == Seq(before(1)), s"bloom probe kept $kept of $before")
    // an absent key keeps nothing (no false-negative risk: superset-safe)
    assert(CommitLog.probeFilesString(spark, root, "doc_id", Seq("doc-9999")).isEmpty)
    val (probedDf, nKept, nLive) =
      CommitLog.snapshotProbeString(spark, root, "doc_id", Seq("doc-0015"))
    assert(nKept == 1 && nLive == 3)
    assert(probedDf.filter(col("doc_id") === "doc-0015").count() == 1L)

    // 4. merge upsert+insert is delta-sized: only the HOLDING file rewrites
    val updates = Seq(("doc-0012", "UPDATED"), ("doc-0099", "NEW"))
      .toDF("doc_id", "body").coalesce(1)
    assert(CommitLog.merge(updates, root, "doc_id").contains(4L))
    val after = CommitLog.liveFiles(spark, root)
    assert(after.toSet.intersect(before.toSet) == Set(before(0), before(2)),
      "files 1 and 3 hold no updated key and must keep their identity")
    val got = CommitLog.snapshot(spark, root)
      .as[(String, String)].collect().sorted.toSeq
    val expected = ((1 to 30).filterNot(_ == 12)
      .map(i => (f"doc-$i%04d", s"body$i")) ++
      Seq(("doc-0012", "UPDATED"), ("doc-0099", "NEW"))).sorted
    assert(got == expected)

    // 5. deleteStrings is delta-sized and exact; missing keys no-op
    val preDel = CommitLog.liveFiles(spark, root)
    val dv = CommitLog.deleteStrings(spark, root, "doc_id",
      Seq("doc-0001", "doc-0002", "doc-not-there"))
    assert(dv.contains(5L))
    val snap = CommitLog.snapshot(spark, root)
    assert(snap.filter(col("doc_id").isin("doc-0001", "doc-0002")).count() == 0L)
    assert(snap.count() == 29L) // 31 − 2
    // only the file holding doc-0001/2 was touched
    val postDel = CommitLog.liveFiles(spark, root)
    assert(preDel.toSet.intersect(postDel.toSet).size == preDel.size - 1)
    // a delete probing nothing commits nothing
    assert(CommitLog.deleteStrings(spark, root, "doc_id", Seq("nope")).isEmpty)
    // txn token replay no-ops
    val tv = CommitLog.deleteStrings(spark, root, "doc_id", Seq("doc-0003"),
      txnId = Some("sdel-1"))
    assert(tv.contains(6L))
    assert(CommitLog.deleteStrings(spark, root, "doc_id", Seq("doc-0004"),
      txnId = Some("sdel-1")).isEmpty)
    assert(CommitLog.snapshot(spark, root).count() == 28L)

    // 6. probe reads stay FLAT in table age (the ClusterCensus claim on
    // the string domain): after growing the table to 15 merge versions,
    // a batch's probe opens only the files actually holding its keys
    // (± bloom fpp ≈ 0 at m=65536), never O(live files)
    val groot = freshRoot()
    (0 until 15).foreach { b =>
      CommitLog.merge(
        (0 until 50).map(i => (s"g$b-doc-$i", s"b$b")).toDF("doc_id", "body")
          .coalesce(1), groot, "doc_id")
    }
    val liveN = CommitLog.liveFiles(spark, groot).size
    assert(liveN == 15)
    val probeKeys = (0 until 50).map(i => s"g7-doc-$i") // one mid-age batch
    val keptFlat = CommitLog.probeFilesString(spark, groot, "doc_id", probeKeys)
    assert(keptFlat.size <= 2,
      s"probe opened ${keptFlat.size}/$liveN files for a 1-file key set — not flat")

    // 7. merge on a string key equals the latest-wins rebuild even when
    // the probe collect is over the cap (stage 1 skipped, stage 2 exact)
    spark.conf.set("graft.commitlog.maxProbeKeys", "1")
    try {
      val up2 = Seq(("doc-0013", "UPD13"), ("doc-0014", "UPD14"))
        .toDF("doc_id", "body").coalesce(1)
      assert(CommitLog.merge(up2, root, "doc_id").contains(7L))
      val s2 = CommitLog.snapshot(spark, root)
      assert(s2.filter(col("body").isin("UPD13", "UPD14")).count() == 2L)
      assert(s2.count() == 28L)
    } finally spark.conf.unset("graft.commitlog.maxProbeKeys")
  }

  test("composite-key merge (r19): tuple semantics, per-component intersected pruning, any-null rows insert") {
    val root = freshRoot()
    def rows3(t: String, lo: Int, hi: Int) =
      (lo to hi).map(i => (t, i.toLong, s"v-$t$i")).toDF("tenant", "k", "v")
    assert(CommitLog.mergeComposite(rows3("a", 1, 10).coalesce(1), root,
      Seq("tenant", "k")).contains(1L))
    assert(CommitLog.mergeComposite(rows3("b", 1, 10).coalesce(1), root,
      Seq("tenant", "k")).contains(2L))
    val before = CommitLog.liveFiles(spark, root)
    // update (b,3) + insert (c,1): the k range [1,3] stats-admits BOTH
    // files, but the tenant bloom ({b,c}) excludes the 'a' file — the
    // per-component INTERSECTION must spare it without a read
    val up = Seq(("b", 3L, "UPD"), ("c", 1L, "NEW")).toDF("tenant", "k", "v").coalesce(1)
    assert(CommitLog.mergeComposite(up, root, Seq("tenant", "k")).contains(3L))
    val after = CommitLog.liveFiles(spark, root)
    assert(after.toSet.intersect(before.toSet) == Set(before.head),
      s"tenant-bloom intersection must keep ${before.head}; before=$before after=$after")
    val got = CommitLog.snapshot(spark, root)
      .as[(String, Long, String)].collect().sorted.toSeq
    val want = ((for (t <- Seq("a", "b"); i <- 1 to 10) yield (t, i.toLong, s"v-$t$i"))
      .filterNot(_ == (("b", 3L, "v-b3"))) ++ Seq(("b", 3L, "UPD"), ("c", 1L, "NEW"))).sorted
    assert(got == want)
    // a row with ANY null component never matches: it lands as a pure
    // insert and the same-k same-v target rows survive
    val withNull = Seq((null.asInstanceOf[String], 5L, "NULLROW"))
      .toDF("tenant", "k", "v").coalesce(1)
    assert(CommitLog.mergeComposite(withNull, root, Seq("tenant", "k")).contains(4L))
    val s2 = CommitLog.snapshot(spark, root)
    assert(s2.filter(col("v") === "NULLROW").count() == 1L)
    assert(s2.filter(col("tenant") === "a" && col("k") === 5L).count() == 1L)
    assert(s2.count() == want.size + 1L)
    // same k under different tenants is NOT a duplicate tuple
    val dupK = Seq(("a", 7L, "A7"), ("b", 7L, "B7")).toDF("tenant", "k", "v").coalesce(1)
    assert(CommitLog.mergeComposite(dupK, root, Seq("tenant", "k")).contains(5L))
    assert(CommitLog.snapshot(spark, root).filter(col("k") === 7L)
      .filter(col("v").isin("A7", "B7")).count() == 2L)
    // guardrails: duplicate column list and non-key types are loud
    intercept[IllegalArgumentException] {
      CommitLog.mergeComposite(dupK, root, Seq("tenant", "tenant"))
    }
  }

  test("snapshotEvolved: added columns null-fill, int widens to long, asOf keeps old schema") {
    val root = freshRoot()
    CommitLog.append(batch(1, 5).coalesce(1), root) // (id LONG, v STRING)
    CommitLog.append((6 to 8).map(i => (i.toLong, s"row$i", i * 2L))
      .toDF("id", "v", "w").coalesce(1), root) // + w LONG
    CommitLog.append(Seq((9, "row9", 18L)).toDF("id", "v", "w")
      .coalesce(1), root) // id INT: must widen back to LONG
    val ev = CommitLog.snapshotEvolved(spark, root)
    assert(ev.columns.toSeq == Seq("id", "v", "w"))
    assert(ev.schema("id").dataType == org.apache.spark.sql.types.LongType)
    val rows = ev.as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == (1L to 9L))
    assert(rows.filter(_._1 <= 5).forall(_._3.isEmpty))   // null-filled
    assert(rows.filter(_._1 >= 6).forall(r => r._3.contains(r._1 * 2)))
    // a pre-evolution version reads with its own old schema
    assert(CommitLog.snapshotEvolved(spark, root, asOf = 1).columns.toSeq == Seq("id", "v"))
    // incompatible change (v STRING -> BIGINT) is rejected loudly
    CommitLog.append(Seq((100L, 999L, 1L)).toDF("id", "v", "w").coalesce(1), root)
    val e = intercept[IllegalArgumentException] { CommitLog.snapshotEvolved(spark, root) }
    assert(e.getMessage.contains("incompatible schema evolution on column 'v'"))
  }

  test("z-ordered layout through the format: zkey clustering prunes BOTH zone dims, through compaction") {
    val root = freshRoot()
    // q119's (event_id, zone_x, zone_y, zkey), written z-CLUSTERED: range
    // partitioning on the Morton key gives each file a contiguous zkey
    // run, which bounds BOTH zone dims per file — that locality is what
    // the commit-embedded stats then expose to snapshotRange
    val zoned = graft.operators.Geo.q119ZorderKey(spark, sf)
    CommitLog.append(
      zoned.repartitionByRange(8, col("zkey")).sortWithinPartitions(col("zkey")),
      root, statsFor = Seq("zone_x", "zone_y", "zkey"))
    assert(CommitLog.liveFiles(spark, root).size >= 4)
    val r = zoned.agg(min("zone_x"), max("zone_x"), min("zone_y"), max("zone_y"))
      .collect().head
    val (x0, x1, y0, y1) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // a narrow window on each dim must read a STRICT SUBSET of files yet
    // return full-scan-identical rows (the skipping superset guarantee)
    def check(c: String, lo: Long, hi: Long): Unit = {
      val (df, read, total) = CommitLog.snapshotRange(spark, root, c, lo, hi)
      assert(read < total, s"no files skipped on $c ($read/$total)")
      assert(read > 0, s"window on $c unexpectedly empty")
      val got = df.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      val expect = CommitLog.snapshot(spark, root)
        .filter(col(c) >= lo && col(c) <= hi)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expect)
    }
    check("zone_x", x0, x0 + (x1 - x0) / 4)
    check("zone_y", y0 + 3 * (y1 - y0) / 4, y1)
    // BOX query: constraining BOTH dims must skip at least as much as the
    // better single dim (the z-order payoff), rows still full-scan-exact
    def checkBox(): Unit = {
      val bx = (x0, x0 + (x1 - x0) / 4)
      val by = (y0, y0 + (y1 - y0) / 4)
      val (_, rx, _) = CommitLog.snapshotRange(spark, root, "zone_x", bx._1, bx._2)
      val (_, ry, _) = CommitLog.snapshotRange(spark, root, "zone_y", by._1, by._2)
      val (df, rb, total) = CommitLog.snapshotBox(spark, root,
        Seq(("zone_x", bx._1, bx._2), ("zone_y", by._1, by._2)))
      assert(rb <= math.min(rx, ry) && rb < total)
      val got = df.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      val expect = CommitLog.snapshot(spark, root)
        .filter(col("zone_x").between(bx._1, bx._2) &&
          col("zone_y").between(by._1, by._2))
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expect)
    }
    checkBox()
    // compact WITH re-clustering: stats are re-collected for the rewritten
    // files and stay tight because clusterBy re-ranges on zkey — pruning
    // survives the compaction on BOTH dims (a plain coalesce would pack
    // mixed key ranges and widen every [min,max] to the full span)
    val before = CommitLog.liveFiles(spark, root)
    CommitLog.compact(spark, root, partitions = 8,
      statsFor = Seq("zone_x", "zone_y", "zkey"), clusterBy = Seq("zkey"))
    assert(CommitLog.liveFiles(spark, root).toSet.intersect(before.toSet).isEmpty)
    check("zone_x", x0, x0 + (x1 - x0) / 4)
    check("zone_y", y0 + 3 * (y1 - y0) / 4, y1)
    checkBox()
  }

  test("changesSince: exactly the post-cursor appended rows; compaction emits nothing") {
    val root = freshRoot()
    CommitLog.append(batch(1, 10), root)
    CommitLog.append(batch(11, 20), root)
    val (c1, head1) = CommitLog.changesSince(spark, root, 1L)
    assert(head1 == 2L && ids(c1.get) == (11L to 20L))
    // compaction rewrites rows that already flowed: NOT a change
    CommitLog.compact(spark, root)
    val (c2, head2) = CommitLog.changesSince(spark, root, 2L)
    assert(head2 == 3L && c2.isEmpty, "compaction must not re-emit rows")
    // the feed survives a checkpoint (also not a change) + new appends
    CommitLog.checkpoint(spark, root)
    CommitLog.append(batch(21, 30), root)
    val (c3, head3) = CommitLog.changesSince(spark, root, 2L)
    assert(head3 == 4L && ids(c3.get) == (21L to 30L))
    // full-history cursor: everything appended, nothing doubled by the
    // compacted copy
    val (all, _) = CommitLog.changesSince(spark, root, 0L)
    assert(ids(all.get) == (1L to 30L))
  }

  test("stray files in the log dir are ignored: only *.json commit names parse") {
    val root = freshRoot()
    CommitLog.append(batch(1, 5), root)
    // a stray numeric-named file (operator note, object-store marker)
    // must not be parsed as a commit — it would brick every read
    Files.write(java.nio.file.Paths.get(s"$root/_graft_log/00000000000000000005"),
      "not a commit".getBytes)
    Files.write(java.nio.file.Paths.get(s"$root/_graft_log/README.txt"),
      "notes".getBytes)
    assert(CommitLog.headVersion(spark, root) == 1L)
    assert(ids(CommitLog.snapshot(spark, root)) == (1L to 5L))
    assert(CommitLog.append(batch(6, 7), root) == Some(2L))
  }

  test("crash litter is invisible: staged log entries and unreferenced data dirs") {
    val root = freshRoot()
    CommitLog.append(batch(1, 10), root)
    // unreferenced data dir (crash between data write and log commit)
    batch(500, 510).write.parquet(s"$root/d-crashed-before-commit")
    // staged-but-never-renamed log entry
    Files.write(java.nio.file.Paths.get(s"$root/_graft_log/.staging-dead.json"),
      """{"version":99,"op":"append","add":["d-x/f.parquet"],"remove":[]}""".getBytes)
    assert(ids(CommitLog.snapshot(spark, root)) == (1L to 10L))
    assert(CommitLog.headVersion(spark, root) == 1L)
  }

  test("vacuum reclaims removed files only; head unaffected; litter untouched") {
    val root = freshRoot()
    (0 until 3).foreach(i => CommitLog.append(batch(i * 10 + 1, i * 10 + 10), root))
    CommitLog.compact(spark, root)
    batch(700, 701).write.parquet(s"$root/d-maybe-inflight") // litter stays
    val preHead = ids(CommitLog.snapshot(spark, root))
    val deleted = CommitLog.vacuum(spark, root)
    assert(deleted.nonEmpty)
    assert(ids(CommitLog.snapshot(spark, root)) == preHead)
    val f = new java.io.File(root)
    assert(f.listFiles().exists(_.getName == "d-maybe-inflight"))
    // the reclaimed files are gone from disk
    deleted.foreach(p => assert(!new java.io.File(s"$root/$p").exists(), p))
  }

  test("publish loop on the commit log: incremental dedup batches land exactly once") {
    import graft.operators.Dedup
    val root = freshRoot()
    val sigDir = Files.createTempDirectory("graft-cl-sigs").toString + "/sigs"
    def publishViaLog(docs: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      val f = new org.apache.hadoop.fs.Path(sigDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val survivors =
        (if (f.exists(new org.apache.hadoop.fs.Path(sigDir)))
          Dedup.dedupeIncremental(docs, spark.read.parquet(sigDir))
        else docs).localCheckpoint()
      if (CommitLog.append(survivors, root, txnId = Some(s"batch-$batchId")).isDefined)
        Dedup.writeSignatureTable(survivors,
          s"$sigDir/gen=$batchId") // sig table sharded per committed batch
    }
    val sigTableAll = () => spark.read.parquet(s"$sigDir/gen=*")
    val b1 = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val b2 = Seq((10L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 1
      (11L, "nine ten eleven twelve thirteen fourteen fifteen sixteen")).toDF("doc_id", "text")
    publishViaLog(b1, 1)
    // second batch dedupes against the committed signature state
    val surv2 = Dedup.dedupeIncremental(b2, sigTableAll()).localCheckpoint()
    if (CommitLog.append(surv2, root, txnId = Some("batch-2")).isDefined)
      Dedup.writeSignatureTable(surv2, s"$sigDir/gen=2")
    // replay of batch 2 (foreachBatch crash-retry): a committed token no-ops
    assert(CommitLog.append(surv2, root, txnId = Some("batch-2")).isEmpty)
    val corpus = CommitLog.snapshot(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(corpus == Seq(1L, 2L, 11L), "near-dup 10 dropped, no doubles")
    assert(CommitLog.headVersion(spark, root) == 2L)
  }

  test("commit-embedded stats skip files at planning time; superset guarantee holds") {
    val root = freshRoot()
    // three appends with disjoint id ranges, stats recorded per file
    assert(CommitLog.append(batch(1, 100).coalesce(1), root,
      statsFor = Seq("id")) == Some(1L))
    assert(CommitLog.append(batch(101, 200).coalesce(1), root,
      statsFor = Seq("id")) == Some(2L))
    assert(CommitLog.append(batch(201, 300).coalesce(1), root,
      statsFor = Seq("id")) == Some(3L))
    val (df, read, total) = CommitLog.snapshotRange(spark, root, "id", 120, 150)
    assert(total == 3 && read == 1, s"read $read of $total")
    assert(ids(df) == (120L to 150L))
    // empty intersection: zero files read, empty frame, schema intact
    val (none, r0, _) = CommitLog.snapshotRange(spark, root, "id", 900, 999)
    assert(r0 == 0 && none.count() == 0 && none.columns.toSeq == Seq("id", "v"))
    // a stats-less append (e.g. an old writer) can never be skipped —
    // superset guarantee over mixed provenance
    CommitLog.append(batch(121, 121), root) // no statsFor
    val (df2, read2, total2) = CommitLog.snapshotRange(spark, root, "id", 120, 150)
    assert(total2 == 4 && read2 == 2, "stats-less file must be kept")
    assert(ids(df2) == ((120L to 150L) :+ 121L).sorted)
    // time travel sees the version's OWN stats and file set
    val (df3, read3, total3) = CommitLog.snapshotRange(spark, root, "id", 120, 150, asOf = 1)
    assert(total3 == 1 && read3 == 0 && df3.count() == 0,
      "v1 has no rows in [120,150] and its single file is skippable")
  }

  test("checkpoint: reads fold from it, tokens/stats/vacuum/time-travel all survive") {
    val root = freshRoot()
    CommitLog.append(batch(1, 100).coalesce(1), root,
      txnId = Some("b-1"), statsFor = Seq("id"))
    CommitLog.append(batch(101, 200).coalesce(1), root,
      txnId = Some("""b "2", tricky"""), statsFor = Seq("id"))
    // compaction re-collects stats for its rewritten file (without this
    // every post-compaction snapshotRange over the span is a full read)
    CommitLog.compact(spark, root, statsFor = Seq("id")) // pre-checkpoint corpses
    val cv = CommitLog.checkpoint(spark, root)
    assert(cv == 3L)
    // reads start AT the checkpoint: the first entry is the fold
    val entries = CommitLog.log(spark, root)
    assert(entries.head.op == "checkpoint" && entries.head.version == 3L)
    assert(ids(CommitLog.snapshot(spark, root)) == (1L to 200L))
    // exactly-once survives the fold — incl. the comma/quote token the
    // quote-aware array codec must round-trip
    assert(CommitLog.append(batch(1, 100), root, txnId = Some("b-1")).isEmpty)
    assert(CommitLog.append(batch(1, 100), root,
      txnId = Some("""b "2", tricky""")).isEmpty)
    // post-checkpoint commits append normally and fold on top
    assert(CommitLog.append(batch(201, 300).coalesce(1), root,
      statsFor = Seq("id")) == Some(4L))
    assert(ids(CommitLog.snapshot(spark, root)) == (1L to 300L))
    // stats skipping works across the checkpoint boundary (carried stat
    // for the compacted file + fresh stat for the new one)
    val (df, read, total) = CommitLog.snapshotRange(spark, root, "id", 250, 260)
    assert(total == 2 && read == 1 && ids(df) == (250L to 260L))
    // time travel BELOW the checkpoint replays the raw prefix
    assert(ids(CommitLog.snapshot(spark, root, asOf = 1)) == (1L to 100L))
    // vacuum still reclaims the pre-checkpoint compaction corpses
    val deleted = CommitLog.vacuum(spark, root)
    assert(deleted.nonEmpty)
    assert(ids(CommitLog.snapshot(spark, root)) == (1L to 300L))
  }

  test("s22 streaming sink: one table version per micro-batch, replay no-ops") {
    import graft.streaming.CommitLogSink
    val root = freshRoot()
    implicit val sq = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = CommitLogSink.appendStream(ms.toDF().toDF("id", "v"), root,
      Files.createTempDirectory("graft-cls-ckpt").toString)
    try {
      ms.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      ms.addData((3L, "c"))
      q.processAllAvailable()
      assert(CommitLog.headVersion(spark, root) == 2L)
      assert(CommitLog.snapshot(spark, root).select("id")
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
      // a pinned reader at version 1 sees only batch 0 — snapshot
      // isolation across batch boundaries, which gen-directories can't give
      assert(CommitLog.snapshot(spark, root, asOf = 1).count() == 2)
    } finally q.stop()
    // a crash-replay of batch 1 (its token is committed): full no-op
    import spark.implicits._
    val replayed = CommitLog.append(Seq((99L, "z")).toDF("id", "v"), root,
      txnId = Some(CommitLogSink.txnToken(1L)))
    assert(replayed.isEmpty)
    assert(CommitLog.snapshot(spark, root).count() == 3)
  }

  test("s23 upsert sink: per-batch delta-sized merges, latest-wins fold, replay no-ops") {
    import graft.streaming.UpsertSink
    val root = freshRoot()
    // seed the table with two single-file batches so pruning is visible
    // (the table carries the version column: CDC state includes its clock)
    def vbatch(lo: Int, hi: Int) =
      (lo to hi).map(i => (i.toLong, s"row$i", 0L)).toDF("id", "v", "ver")
    CommitLog.append(vbatch(1, 10).coalesce(1), root, statsFor = Seq("id"))
    CommitLog.append(vbatch(11, 20).coalesce(1), root, statsFor = Seq("id"))
    val seed = CommitLog.liveFiles(spark, root)
    implicit val sq = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    val q = UpsertSink.upsertStream(ms.toDF().toDF("id", "v", "ver"), root, "id",
      Files.createTempDirectory("graft-ups-ckpt").toString, latestBy = Some("ver"))
    try {
      // batch 0: two versions of key 15 in ONE batch (the CDC collision)
      // + a brand-new key — latest-wins fold must keep ver=2 only
      ms.addData((15L, "stale", 1L), (15L, "fresh", 2L), (100L, "new", 1L))
      q.processAllAvailable()
      // batch 1: update a key in the OTHER seed file
      ms.addData((3L, "upd3", 1L))
      q.processAllAvailable()
      val got = CommitLog.snapshot(spark, root)
        .filter(col("id").isin(3L, 15L, 100L))
        .select("id", "v").as[(Long, String)].collect().sorted.toSeq
      assert(got == Seq((3L, "upd3"), (15L, "fresh"), (100L, "new")))
      assert(CommitLog.snapshot(spark, root).count() == 21) // 20 seed + 1 insert
      assert(CommitLog.snapshot(spark, root).select("id").distinct().count() == 21)
      // delta-sized: batch 0 touched only the 11-20 file; batch 1 only the
      // 1-10 file — each seed file was rewritten by exactly one batch, and
      // the log's remove lists point at exactly one file each
      val merges = CommitLog.log(spark, root).filter(_.op == "merge")
      assert(merges.size == 2)
      assert(merges.head.remove == Seq(seed(1)) && merges(1).remove.head != seed(1))
    } finally q.stop()
    // crash-replay of batch 1: token committed, merge is a full no-op
    import spark.implicits._
    val replayed = CommitLog.merge(Seq((3L, "evil", 9L)).toDF("id", "v", "ver"),
      root, "id", txnId = Some(UpsertSink.txnToken(1L)))
    assert(replayed.isEmpty)
    assert(CommitLog.snapshot(spark, root).filter(col("id") === 3L)
      .select("v").as[String].collect().toSeq == Seq("upd3"))
  }

  test("changesSince after merge/delete: only genuinely new rows flow, rewrites are silent") {
    val root = freshRoot()
    CommitLog.append(batch(1, 10).coalesce(1), root, statsFor = Seq("id"))
    val (_, cursor0) = CommitLog.changesSince(spark, root, 0L)
    // merge: updates one existing key + inserts one — the CDC feed must
    // carry exactly those two rows, NOT the 9 surviving rewrites
    val updates = Seq((3L, "upd3"), (50L, "new50")).toDF("id", "v").coalesce(1)
    assert(CommitLog.merge(updates, root, "id").contains(2L))
    val (changed, cursor1) = CommitLog.changesSince(spark, root, cursor0)
    assert(changed.get.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(3L, 50L))
    // delete: pure retraction — NOTHING new flows (the survivors moved
    // files, but a consumer already has those rows)
    assert(CommitLog.delete(spark, root, "id", Seq(5L)).contains(3L))
    val (afterDelete, _) = CommitLog.changesSince(spark, root, cursor1)
    assert(afterDelete.isEmpty)
    // snapshots still see the post-mutation truth
    assert(ids(CommitLog.snapshot(spark, root)) ==
      ((1L to 10L).filterNot(_ == 5L) :+ 50L).sorted)
  }

  test("s24 retraction sink: streamed keys vanish delta-sized; replay no-ops; CDC stays silent") {
    import graft.streaming.RetractionSink
    val root = freshRoot()
    CommitLog.append(batch(1, 10).coalesce(1), root, statsFor = Seq("id"))
    CommitLog.append(batch(11, 20).coalesce(1), root, statsFor = Seq("id"))
    val seed = CommitLog.liveFiles(spark, root)
    val (_, cursor) = CommitLog.changesSince(spark, root, 0L)
    implicit val sq = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = RetractionSink.retractStream(ms.toDF().toDF("id"), root, "id",
      Files.createTempDirectory("graft-ret-ckpt").toString)
    try {
      ms.addData(15L, 17L) // both in the second file only
      q.processAllAvailable()
      assert(ids(CommitLog.snapshot(spark, root)) ==
        (1L to 20L).filterNot(Seq(15L, 17L).contains))
      // delta-sized: the first seed file is untouched
      assert(CommitLog.liveFiles(spark, root).contains(seed.head))
      val entry = CommitLog.log(spark, root).last
      assert(entry.op == "delete" && entry.remove == Seq(seed(1)))
      // a retraction feeds the CDC consumer NOTHING
      val (changes, _) = CommitLog.changesSince(spark, root, cursor)
      assert(changes.isEmpty)
      // keys absent from every file's range: no version committed at all
      val head = CommitLog.headVersion(spark, root)
      ms.addData(999L)
      q.processAllAvailable()
      assert(CommitLog.headVersion(spark, root) == head)
    } finally q.stop()
    // crash-replay of batch 0: token committed → full no-op
    import spark.implicits._
    val replayed = CommitLog.delete(spark, root, "id", Seq(1L),
      txnId = Some(RetractionSink.txnToken(0L)))
    assert(replayed.isEmpty)
    assert(ids(CommitLog.snapshot(spark, root)).contains(1L))
  }

  test("s23 upsert sink on a STRING-keyed table: latest-wins CDC folds land delta-sized by bloom") {
    import graft.streaming.UpsertSink
    val root = freshRoot()
    def docs(lo: Int, hi: Int) =
      (lo to hi).map(i => (f"doc-$i%04d", s"body$i", 0L)).toDF("doc_id", "body", "ver")
    CommitLog.merge(docs(1, 10).coalesce(1), root, "doc_id")
    CommitLog.merge(docs(11, 20).coalesce(1), root, "doc_id")
    val seed = CommitLog.liveFiles(spark, root)
    implicit val sq = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String, Long)]
    val q = UpsertSink.upsertStream(ms.toDF().toDF("doc_id", "body", "ver"),
      root, "doc_id",
      Files.createTempDirectory("graft-sups-ckpt").toString, latestBy = Some("ver"))
    try {
      ms.addData(("doc-0015", "stale", 1L), ("doc-0015", "fresh", 2L),
        ("doc-new", "new", 1L))
      q.processAllAvailable()
      val got = CommitLog.snapshot(spark, root)
        .filter(col("doc_id").isin("doc-0015", "doc-new"))
        .select("doc_id", "body").as[(String, String)].collect().sorted.toSeq
      assert(got == Seq(("doc-0015", "fresh"), ("doc-new", "new")))
      assert(CommitLog.snapshot(spark, root).count() == 21)
      // delta-sized via the string-key bloom probe: only the holding file moved
      val merge = CommitLog.log(spark, root).filter(_.op == "merge").last
      assert(merge.remove == Seq(seed(1)), s"${merge.remove} vs ${seed(1)}")
    } finally q.stop()
  }

  test("s24 retraction sink on a STRING-keyed table: doc-id keys vanish via bloom-admitted delta rewrites") {
    import graft.streaming.RetractionSink
    val root = freshRoot()
    def docs(lo: Int, hi: Int) =
      (lo to hi).map(i => (f"doc-$i%04d", s"body$i")).toDF("doc_id", "body")
    CommitLog.merge(docs(1, 10).coalesce(1), root, "doc_id")
    CommitLog.merge(docs(11, 20).coalesce(1), root, "doc_id")
    val seed = CommitLog.liveFiles(spark, root)
    implicit val sq = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = RetractionSink.retractStream(ms.toDF().toDF("doc_id"), root, "doc_id",
      Files.createTempDirectory("graft-sret-ckpt").toString)
    try {
      ms.addData("doc-0015", "doc-0017") // both in the second file only
      q.processAllAvailable()
      val snap = CommitLog.snapshot(spark, root)
      assert(snap.count() == 18L)
      assert(snap.filter(col("doc_id").isin("doc-0015", "doc-0017")).count() == 0L)
      // delta-sized through the keyImage blooms: file 1 keeps identity
      assert(CommitLog.liveFiles(spark, root).contains(seed.head))
      val entry = CommitLog.log(spark, root).last
      assert(entry.op == "delete" && entry.remove == Seq(seed(1)))
      // keys no bloom admits: no version committed at all
      val head = CommitLog.headVersion(spark, root)
      ms.addData("doc-nope")
      q.processAllAvailable()
      assert(CommitLog.headVersion(spark, root) == head)
    } finally q.stop()
  }

  test("delete/merge refuse a mixed-schema rewrite loudly (evolve first, then mutate)") {
    val root = freshRoot()
    CommitLog.append(batch(1, 10).coalesce(1), root)
    CommitLog.append((11 to 20).map(i => (i.toLong, s"row$i", i * 2L))
      .toDF("id", "v", "w").coalesce(1), root) // evolved: + w
    // both files are stat-less → every key admits both → mixed rewrite
    val e1 = intercept[IllegalArgumentException] {
      CommitLog.delete(spark, root, "id", Seq(5L))
    }
    assert(e1.getMessage.contains("MIXED schemas"))
    val e2 = intercept[IllegalArgumentException] {
      CommitLog.merge(Seq((5L, "x")).toDF("id", "v"), root, "id")
    }
    assert(e2.getMessage.contains("MIXED schemas") ||
      e2.getMessage.contains("does not match table schema"))
    // the evolved reader still serves the table (the documented path out)
    assert(CommitLog.snapshotEvolved(spark, root).count() == 20)
  }

  test("vacuum retention: retainLast keeps recent versions readable while older reclaim") {
    val root = freshRoot()
    (0 until 3).foreach(i => CommitLog.append(batch(i * 10 + 1, i * 10 + 10), root))
    CommitLog.compact(spark, root) // v4: originals removed, compacted live
    CommitLog.append(batch(41, 50), root) // v5
    val originals = CommitLog.liveFiles(spark, root, asOf = 3)
    // retain the last 1 version before head: asOf=4 must survive the
    // reclaim, the pre-compaction originals (live only ≤ v3) must not
    val dead = CommitLog.vacuum(spark, root, retainLast = 1)
    assert(dead.toSet == originals.toSet)
    assert(ids(CommitLog.snapshot(spark, root)) == ((1L to 30L) ++ (41L to 50L)))
    assert(ids(CommitLog.snapshot(spark, root, asOf = 4)) == (1L to 30L))
    // below the horizon the files are gone — time travel fails on read
    intercept[Exception] {
      CommitLog.snapshot(spark, root, asOf = 3).collect()
    }
    // nothing else is reclaimable: every remaining file is live at head-1+
    assert(CommitLog.vacuum(spark, root, retainLast = 1).isEmpty)
  }

  test("restore: metadata-only rollback to an earlier version; vacuumed targets fail loudly") {
    val root = freshRoot()
    CommitLog.append(batch(1, 10).coalesce(1), root, statsFor = Seq("id")) // v1
    CommitLog.append(batch(11, 20).coalesce(1), root, statsFor = Seq("id")) // v2
    CommitLog.delete(spark, root, "id", Seq(15L)) // v3: second file rewritten
    assert(ids(CommitLog.snapshot(spark, root)) == (1L to 20L).filterNot(_ == 15L))
    val v = CommitLog.restore(spark, root, toVersion = 2L) // v4
    assert(v == 4L)
    assert(ids(CommitLog.snapshot(spark, root)) == (1L to 20L)) // 15 is back
    // metadata-only: the restored file IS v2's file (identity, no copy)
    assert(CommitLog.liveFiles(spark, root).toSet ==
      CommitLog.liveFiles(spark, root, asOf = 2).toSet)
    // every intermediate version still reads
    assert(ids(CommitLog.snapshot(spark, root, asOf = 3)) ==
      (1L to 20L).filterNot(_ == 15L))
    // restored stats still skip: a range probe outside [11,20] skips it
    val (_, read, total) = CommitLog.snapshotRange(spark, root, "id", 1, 5)
    assert(read < total)
    // restoring the current state is a no-op
    assert(CommitLog.restore(spark, root, toVersion = 4L) == 4L)
    assert(CommitLog.headVersion(spark, root) == 4L)
    // after vacuum reclaims the delete-era rewrite, restoring to v3 is loud
    CommitLog.vacuum(spark, root)
    val e = intercept[IllegalArgumentException] {
      CommitLog.restore(spark, root, toVersion = 3L)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("snapshotRange on an evolved table null-fills across groups instead of mis-schema") {
    val root = freshRoot()
    CommitLog.append(batch(1, 10).coalesce(1), root, statsFor = Seq("id")) // (id, v)
    CommitLog.append((11 to 20).map(i => (i.toLong, s"row$i", i * 2L))
      .toDF("id", "v", "w").coalesce(1), root, statsFor = Seq("id")) // + w
    // the window spans BOTH schema groups: rows must union with the old
    // group null-filled, not silently drop w (or worse, drop rows)
    val (df, read, total) = CommitLog.snapshotRange(spark, root, "id", 8, 13)
    assert(read == 2 && total == 2)
    assert(df.columns.toSeq == Seq("id", "v", "w"))
    val rows = df.as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == (8L to 13L))
    assert(rows.filter(_._1 <= 10).forall(_._3.isEmpty))
    assert(rows.filter(_._1 >= 11).forall(r => r._3.contains(r._1 * 2)))
    // a window inside ONE group still skips the other
    val (_, read2, _) = CommitLog.snapshotRange(spark, root, "id", 1, 5)
    assert(read2 == 1)
  }

  test("snapshotEvolved rejects a rename loudly instead of two half-null columns") {
    val root = freshRoot()
    CommitLog.append(batch(1, 5).coalesce(1), root) // (id, v)
    // "rename" v -> w: the second group misses v and carries w — the
    // null-fill fold would silently make BOTH columns half-null
    CommitLog.append(Seq((6L, "row6")).toDF("id", "w").coalesce(1), root)
    val e = intercept[IllegalArgumentException] {
      CommitLog.snapshotEvolved(spark, root)
    }
    assert(e.getMessage.contains("incomparable column sets") &&
      e.getMessage.contains("v") && e.getMessage.contains("w"), e.getMessage)
  }

  test("changesSince maxVersions drains a deep backlog in bounded steps, exactly once") {
    val root = freshRoot()
    (1 to 5).foreach(i => CommitLog.append(batch(i * 10 + 1, i * 10 + 5).coalesce(1), root))
    var cursor = 0L
    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    var moved = true
    while (moved) {
      val (df, next) = CommitLog.changesSince(spark, root, cursor, maxVersions = 2)
      df.foreach(d => seen += ids(d))
      moved = next != cursor
      cursor = next
    }
    // 5 versions / 2 per step = 3 bounded reads; every row exactly once
    assert(seen.size == 3 && seen.map(_.size) == Seq(10, 10, 5), seen)
    assert(seen.flatten.sorted == (1 to 5).flatMap(i => (i * 10 + 1) to (i * 10 + 5)).map(_.toLong))
    assert(cursor == 5L)
    // default = old everything-at-once behavior
    val (all, head) = CommitLog.changesSince(spark, root, 0L)
    assert(head == 5L && ids(all.get).size == 25)
  }

  test("divergent independent ADDs read as the null-filled union under the opt-in conf") {
    val root = freshRoot()
    CommitLog.append(batch(1, 5).coalesce(1), root)                       // (id, v)
    CommitLog.append(Seq((6L, "row6", 1L)).toDF("id", "v", "a").coalesce(1), root) // +a
    CommitLog.append(Seq((7L, "row7", 2L)).toDF("id", "v", "b").coalesce(1), root) // +b (no a)
    // {id,v,a} vs {id,v,b} is structurally a rename signature: loud by default
    intercept[IllegalArgumentException] { CommitLog.snapshotEvolved(spark, root) }
    spark.conf.set("graft.commitlog.allowDivergentColumns", "true")
    try {
      val ev = CommitLog.snapshotEvolved(spark, root)
      assert(ev.columns.toSet == Set("id", "v", "a", "b"))
      assert(ev.count() == 7)
      val r7 = ev.filter(col("id") === 7L).collect().head
      assert(r7.isNullAt(r7.fieldIndex("a")) && r7.getLong(r7.fieldIndex("b")) == 2L)
    } finally spark.conf.unset("graft.commitlog.allowDivergentColumns")
  }

  test("bulk delete switches to the broadcast anti-join path; nulls survive; result exact") {
    val root = freshRoot()
    val withNull = ((1 to 3000).map(i => (Some(i.toLong), s"row$i")) :+
      ((None: Option[Long]), "rowNull")).toDF("id", "v")
    CommitLog.append(withNull.coalesce(2), root, statsFor = Seq("id"))
    // 2000 distinct keys > the literal-isin ceiling (1000): the rewrite
    // must anti-join, and null target keys never match a key row
    val v = CommitLog.delete(spark, root, "id", (1L to 2000L), statsFor = Some(Seq("id")))
    assert(v.nonEmpty)
    val left = CommitLog.snapshot(spark, root)
    assert(left.count() == 1001)
    assert(left.filter(col("id").isNull).count() == 1)
    assert(ids(left.filter(col("id").isNotNull)) == (2001L to 3000L))
  }

  test("delete races an append: removal set re-derived at the moved head, no lost appends, no resurrected keys") {
    val root = freshRoot()
    (0 until 3).foreach(i => CommitLog.append(
      batch(i * 10 + 1, i * 10 + 10).coalesce(1), root, statsFor = Seq("id")))
    // the race: delete derives its touched set, writes survivors, and an
    // append lands BEFORE the delete commits. Fire the append from a
    // watcher thread the moment the survivor data dir hits the disk —
    // i.e. inside delete's derive→commit window. commitEntry re-derives
    // `remove` against the moved head, so the appended file (not in
    // `touched`) must survive untouched whichever side commits first.
    val dirsBefore = new java.io.File(root).listFiles().count(_.getName.startsWith("d-"))
    val appended = new java.util.concurrent.atomic.AtomicBoolean(false)
    val watcher = new Thread(() => {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!appended.get() && System.nanoTime() < deadline) {
        val dirs = Option(new java.io.File(root).listFiles()).toSeq.flatten
          .filter(f => f.isDirectory && f.getName.startsWith("d-"))
        if (dirs.size > dirsBefore) {
          CommitLog.append(batch(41, 50).coalesce(1), root, statsFor = Seq("id"))
          appended.set(true)
        } else Thread.sleep(1)
      }
    })
    watcher.start()
    val v = CommitLog.delete(spark, root, "id", Seq(3L, 17L), statsFor = Some(Seq("id")))
    watcher.join(30000)
    // whichever interleaving the scheduler produced, the append must
    // have fired (the survivor dir always appears) …
    assert(appended.get(), "racing append never fired")
    assert(v.nonEmpty)
    // … no lost appends, no resurrected keys, deletes applied:
    val got = ids(CommitLog.snapshot(spark, root))
    assert(got == ((1L to 30L).filterNot(Set(3L, 17L)) ++ (41L to 50L)).sorted, got)
    // and the delete's removal set named only files it derived against —
    // never the racer's
    val deleteEntry = CommitLog.log(spark, root).find(_.op == "delete").get
    val appendEntry = CommitLog.log(spark, root)
      .filter(_.op == "append").maxBy(_.version)
    assert(deleteEntry.remove.toSet.intersect(appendEntry.add.toSet).isEmpty)
  }

  test("merge races an append on disjoint keys: both land, latest-wins per key, nothing duplicated") {
    val root = freshRoot()
    (0 until 2).foreach(i => CommitLog.append(
      batch(i * 10 + 1, i * 10 + 10).coalesce(1), root, statsFor = Seq("id")))
    val dirsBefore = new java.io.File(root).listFiles().count(_.getName.startsWith("d-"))
    val appended = new java.util.concurrent.atomic.AtomicBoolean(false)
    val watcher = new Thread(() => {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!appended.get() && System.nanoTime() < deadline) {
        val dirs = Option(new java.io.File(root).listFiles()).toSeq.flatten
          .filter(f => f.isDirectory && f.getName.startsWith("d-"))
        if (dirs.size > dirsBefore) {
          CommitLog.append(batch(31, 40).coalesce(1), root, statsFor = Seq("id"))
          appended.set(true)
        } else Thread.sleep(1)
      }
    })
    watcher.start()
    val v = CommitLog.merge(
      Seq((5L, "upd5"), (99L, "new99")).toDF("id", "v").coalesce(1), root, "id")
    watcher.join(30000)
    assert(appended.get(), "racing append never fired")
    assert(v.nonEmpty)
    val rows = CommitLog.snapshot(spark, root).as[(Long, String)].collect().toSeq
    // no duplicates anywhere …
    assert(rows.map(_._1).sorted == rows.map(_._1).distinct.sorted)
    // … the update applied, the insert landed, the racer's rows all live
    val byId = rows.toMap
    assert(byId(5L) == "upd5" && byId(99L) == "new99")
    assert((31L to 40L).forall(i => byId.get(i).contains(s"row$i")))
    assert(rows.size == 20 + 10 + 1)
  }

  test("compact races an append safely: the racing rows stay live") {
    val root = freshRoot()
    (0 until 3).foreach(i => CommitLog.append(batch(i * 10 + 1, i * 10 + 10), root))
    // interleave: a compaction computed against v3, an append lands as v4
    // before the compact commits. Emulate by doing what compact does, with
    // the append injected between read and commit — the public compact
    // re-derives its removal set at commit time, so run the real compact
    // AFTER the append but against the same pre-append live set semantics:
    val before = CommitLog.liveFiles(spark, root)
    assert(CommitLog.append(batch(41, 50), root) == Some(4L))
    val v = CommitLog.compact(spark, root) // folds v4's live set
    assert(v == 5L)
    assert(ids(CommitLog.snapshot(spark, root)) == ((1L to 30L) ++ (41L to 50L)))
    // and the files removed were exactly the pre-compact live set
    val removed = CommitLog.log(spark, root).last.remove.toSet
    assert(removed == CommitLog.liveFiles(spark, root, asOf = 4).toSet)
    assert(before.forall(removed.contains))
  }

  test("history: one audit row per entry, ops/counts/txn faithful, instants agree with time travel") {
    val root = freshRoot()
    CommitLog.append(batch(1, 10), root)
    CommitLog.append(batch(11, 20), root, txnId = Some("ingest-7"))
    CommitLog.overwrite(batch(100, 102), root)
    val h = CommitLog.history(spark, root).collect()
      .map(r => (r.getAs[Long]("version"), r.getAs[String]("op"),
        r.getAs[Long]("n_added"), r.getAs[Long]("n_removed"),
        Option(r.getAs[String]("txn_id"))))
    assert(h.map(x => (x._1, x._2)).toSeq ==
      Seq((1L, "append"), (2L, "append"), (3L, "overwrite")))
    // the overwrite removes everything the two appends added
    assert(h(2)._4 == h(0)._3 + h(1)._3)
    assert(h.map(_._5).toSeq == Seq(None, Some("ingest-7"), None))
    // instants are the same clock versionAsOfTime resolves against:
    // asking for each entry's own recorded instant returns a version
    // at least that entry's (ties resolve to the max version)
    val ts = CommitLog.history(spark, root).collect()
      .map(r => r.getAs[Long]("version") ->
        r.getAs[java.sql.Timestamp]("commit_ts").getTime).toMap
    ts.foreach { case (v, t) =>
      assert(CommitLog.versionAsOfTime(spark, root, t) >= v)
    }
    // a checkpoint rows with its own op tag
    val cp = CommitLog.checkpoint(spark, root)
    val ops = CommitLog.history(spark, root).collect()
      .map(r => (r.getAs[Long]("version"), r.getAs[String]("op"))).toSet
    assert(ops.contains((cp, "checkpoint")))
  }

  test("shallow clone: zero-copy fork, independent writes, clone-side copy-on-write, vacuum ownership") {
    val src = freshRoot()
    CommitLog.append(batch(1, 10), src, statsFor = Seq("id"))
    CommitLog.append(batch(11, 20), src, statsFor = Seq("id"))
    val dst = freshRoot()
    assert(CommitLog.cloneShallow(spark, src, dst) == 1L)
    // zero-copy: the clone root holds ONLY the log — no data bytes moved
    val dstFiles = new java.io.File(dst).listFiles().map(_.getName).toSet
    assert(dstFiles == Set("_graft_log"), dstFiles.toString)
    assert(ids(CommitLog.snapshot(spark, dst)) == (1L to 20L))
    // carried stats: range pruning works on the clone without a rewrite
    val (_, read, live) = CommitLog.snapshotRange(spark, dst, "id", 1L, 5L)
    assert(read < live, s"clone must skip files on carried stats ($read/$live)")
    // independent appends: neither table sees the other's rows
    CommitLog.append(batch(21, 30), dst)
    CommitLog.append(batch(31, 40), src)
    assert(ids(CommitLog.snapshot(spark, dst)) == ((1L to 20L) ++ (21L to 30L)))
    assert(ids(CommitLog.snapshot(spark, src)) == ((1L to 20L) ++ (31L to 40L)))
    // clone-side DELETE rewrites the touched FOREIGN file's survivors
    // clone-local (copy-on-write at file granularity); the source still
    // serves every row from the same bytes
    assert(CommitLog.delete(spark, dst, "id", Seq(3L)).isDefined)
    assert(ids(CommitLog.snapshot(spark, dst)) ==
      ((1L to 30L).filterNot(_ == 3L)))
    assert(ids(CommitLog.snapshot(spark, src)) == ((1L to 20L) ++ (31L to 40L)))
    // vacuum ownership: the delete dropped a foreign reference, but the
    // clone's vacuum must neither report nor delete SOURCE bytes
    val dead = CommitLog.vacuum(spark, dst, retainLast = 0)
    assert(dead.forall(!_.startsWith("/")), s"vacuum reclaimed foreign paths: $dead")
    assert(ids(CommitLog.snapshot(spark, src)) == ((1L to 20L) ++ (31L to 40L)),
      "source table must survive a clone-side vacuum byte-for-byte")
    // time-travel clone: fork the PRE-append version of the source
    val dst2 = freshRoot()
    CommitLog.cloneShallow(spark, src, dst2, asOf = 1L)
    assert(ids(CommitLog.snapshot(spark, dst2)) == (1L to 10L))
    // clone of a clone keeps absolute references as-is and still reads
    val dst3 = freshRoot()
    CommitLog.cloneShallow(spark, dst2, dst3)
    assert(ids(CommitLog.snapshot(spark, dst3)) == (1L to 10L))
    // the one refused shape: cloning ONTO a non-empty table
    intercept[IllegalArgumentException] {
      CommitLog.cloneShallow(spark, src, dst)
    }
    // history names the fork
    val ops = CommitLog.history(spark, dst).collect()
      .map(r => (r.getAs[Long]("version"), r.getAs[String]("op"))).toSet
    assert(ops.contains((1L, "clone")), ops.toString)
  }

  test("blooms: probe pruning skips files without the keys, never drops files with them; codec + checkpoint round-trip; saturation stores nothing") {
    val root = freshRoot()
    spark.conf.set("graft.commitlog.bloomColumns", "h")
    try {
      // two appends of hash-like keys with overlapping [min,max] ranges —
      // range stats alone could never tell them apart
      val h1 = Seq(101L, 90001L, 17L, 55555L)
      val h2 = Seq(202L, 80002L, 33L, 44444L)
      CommitLog.append(h1.toDF("h").coalesce(1), root, None, Seq("h"))
      CommitLog.append(h2.toDF("h").coalesce(1), root, None, Seq("h"))
      val live = CommitLog.liveFiles(spark, root)
      assert(live.size == 2)
      // no false negatives: every written value's file is kept
      for (v <- h1 ++ h2)
        assert(CommitLog.probeFiles(spark, root, "h", Seq(v)).nonEmpty,
          s"probe for present key $v must keep its file")
      // batch-1 keys keep ONLY batch 1's file (bloom skip despite the
      // overlapping ranges)
      val kept1 = CommitLog.probeFiles(spark, root, "h", h1)
      assert(kept1.size == 1, s"expected 1 file for h1 keys, got $kept1")
      // absent keys: everything bloom-skipped, empty-but-schema'd frame
      val (none, k0, l0) = CommitLog.snapshotProbe(spark, root, "h",
        Seq(999999999L, -12345L))
      assert(k0 == 0 && l0 == 2 && none.count() == 0L &&
        none.schema.fieldNames.toSeq == Seq("h"))
      // driver/distributed hash parity: the stored bloom CONTAINS the
      // value by the driver-side position computation on fresh bits
      val blooms = CommitLog.log(spark, root).flatMap(_.blooms)
      assert(blooms.size == 2)
      assert(blooms.forall(_.column == "h"))
      // codec round trip (bits by value, not reference)
      val c = CommitLog.log(spark, root).last
      val rt = CommitLog.dec(c.version, CommitLog.enc(c))
      assert(rt.blooms.map(b => (b.file, b.column, b.k)) ==
        c.blooms.map(b => (b.file, b.column, b.k)))
      assert(rt.blooms.zip(c.blooms).forall { case (a, b) =>
        a.bits.sameElements(b.bits) })
      // checkpoint folds blooms: pruning survives the fold
      CommitLog.checkpoint(spark, root)
      CommitLog.append(Seq(7070L).toDF("h").coalesce(1), root, None, Seq("h"))
      assert(CommitLog.probeFiles(spark, root, "h", h1).size == 1,
        "bloom pruning must survive checkpointing")
      // compaction re-collects blooms for the columns the live set
      // carried them on (even with no session conf at compact time):
      // the compacted file still answers probes
      spark.conf.unset("graft.commitlog.bloomColumns")
      CommitLog.compact(spark, root, partitions = 1, statsFor = Seq("h"))
      spark.conf.set("graft.commitlog.bloomColumns", "h")
      assert(CommitLog.liveFiles(spark, root).size == 1)
      assert(CommitLog.log(spark, root).flatMap(_.blooms)
        .exists(b => b.column == "h"), "compact must re-collect blooms")
      assert(CommitLog.probeFiles(spark, root, "h", Seq(888888888L)).isEmpty,
        "the compacted bloom must still skip absent keys")
      assert(CommitLog.probeFiles(spark, root, "h", Seq(h1.head)).size == 1,
        "the compacted bloom must still admit present keys")
      // saturation: a filter too small for the rows stores NO bloom and
      // the file stays unskippable (kept for any probe)
      val satRoot = freshRoot()
      spark.conf.set("graft.commitlog.bloomBits", "64")
      try {
        CommitLog.append((1L to 100L).toDF("h").coalesce(1), satRoot)
        assert(CommitLog.log(spark, satRoot).flatMap(_.blooms).isEmpty,
          "a saturated bloom must not be stored")
        assert(CommitLog.probeFiles(spark, satRoot, "h", Seq(424242L)).size == 1,
          "a bloom-less file is unskippable")
      } finally spark.conf.unset("graft.commitlog.bloomBits")
    } finally spark.conf.unset("graft.commitlog.bloomColumns")
  }

}
