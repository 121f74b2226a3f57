package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** A minimal transaction-log table format — the storage seam that unifies
  * the repo's piecewise lakehouse mechanics (AtomicGen's rename commits,
  * ZoneMap's file manifests, q98's snapshot diff) into one versioned
  * table: every mutation is ONE atomically-renamed JSON commit file, and
  * readers resolve a snapshot purely from the log, never from directory
  * listing. The public Delta/Iceberg design in miniature:
  *
  *  - `<root>/_graft_log/<20-digit-version>.json` — the commit log. Each
  *    entry lists data files ADDED and REMOVED (paths relative to root)
  *    plus an operation tag and optional idempotence token. A version
  *    file is staged dot-invisible and published by one rename, so a
  *    version either exists completely or not at all.
  *  - `<root>/d-<uuid>/` — immutable data directories (parquet). Data
  *    lands BEFORE its commit and is invisible until the log references
  *    it, so a crash between the two leaves unreferenced litter, never a
  *    torn table.
  *
  * Semantics this buys over raw directories:
  *  - SNAPSHOT ISOLATION: a reader resolves the live file set at a
  *    version and reads exactly those files — concurrent appends /
  *    compactions never tear a scan.
  *  - TIME TRAVEL: `snapshot(root, asOf = v)` replays the log prefix.
  *  - OPTIMISTIC CONCURRENCY: the version-file rename is the lock; a
  *    loser re-reads the head and retries against the new version, so
  *    two appends both land (serialized), never lost or doubled.
  *  - EXACTLY-ONCE INGEST: `append(..., txnId = Some(id))` is a no-op if
  *    any committed entry already carries the token — the foreachBatch
  *    replay contract AtomicGen provides for generation directories,
  *    here for log-referenced tables.
  *  - COMPACTION without reader disruption: `compact` commits
  *    added-compacted + removed-smalls in one version; old versions
  *    still resolve the old files until `vacuum` reclaims them.
  *  - ROW-LEVEL DELETE / MERGE, delta-sized: `delete` (keyed retraction —
  *    the GDPR operation) and `merge` (keyed upsert, q109's semantics
  *    through the format) rewrite ONLY the files the commit-embedded
  *    per-file stats + an exact file probe show to hold affected keys;
  *    untouched files keep their identity across the commit.
  *  - READER-SIDE SCHEMA EVOLUTION: `snapshotEvolved` reads across
  *    versions after a column ADD (old files null-fill) or a numeric
  *    WIDENING (int→long, float→double; old files upcast); any other
  *    cross-version change throws with the column and both types.
  *    Time travel to a pre-change version reads the old schema as-is.
  *
  * Scale shape: the log is O(commits) tiny JSON files read by the
  * DRIVER (a production table periodically checkpoints the folded state;
  * the fold here is cheap enough not to); data files stream through
  * executors untouched. Same rename caveat as AtomicGen: atomic on
  * POSIX/HDFS, object stores need a commit service.
  *
  * The commit-record JSON is written AND parsed by this object only;
  * relative paths are library-generated (`d-<uuid>/part-*.parquet`), so
  * the hand-rolled codec never meets adversarial strings (paths are
  * still escaped on write, defensively). Caller-supplied txn tokens DO
  * flow through it, so [[GraftSession.jsonEscape]] performs full
  * RFC 8259 escaping (quotes, backslashes, control characters) and the
  * entries on disk are valid standard JSON that external tools (jq, a
  * debugging script) can parse — spec-asserted in the codec property
  * test.
  */
object CommitLog {

  private[graft] val LogDir = "_graft_log"
  private val MaxCommitRetries = 20

  /** [[delete]] key-count ceiling for the literal `isin` survivor filter;
    * above it the rewrite anti-joins a broadcast key frame instead — a
    * 100k-literal In expression is an analyzer/codegen blow-up (64 KB
    * method limit, quadratic analysis), while the broadcast hash
    * anti-join costs one tiny exchange and scales to millions of keys. */
  private val DeleteIsinMaxKeys = 1000

  /** Newest txn tokens a checkpoint carries forward (see [[checkpoint]]). */
  private val TxnRetention = 1000

  /** One per-file column-stat row: the data-skipping metadata a commit
    * carries for its added files. Encoded as `file|col|min|max` strings
    * inside the entry's `stats` array (reusing the string-array codec;
    * file paths are library-generated and stat column names must not
    * contain '|' — enforced at write). NULL-only files carry no row for
    * that column and are treated as unskippable (kept), like a file with
    * no stats at all.
    */
  final case class FileStat(file: String, column: String, min: Long, max: Long)

  /** One per-file column BLOOM — the skipping metadata for HASH-domain
    * keys, where min/max ranges never prune (a uniformly-hashed probe
    * key set intersects every file's range): a file is skippable for a
    * probe key set iff its bloom contains NONE of the keys. No false
    * negatives by construction (every non-null value is inserted at
    * write), so probe pruning stays superset-safe like the stats path;
    * false positives only cost an extra read. Bit positions come from
    * `pmod(xxhash64(CAST(i AS BIGINT), CAST(v AS BIGINT)), m)` for
    * i = 0..k-1 — Spark's own xxhash64 fold, replayed driver-side via
    * the public `XXH64.hashLong` (spec-pinned bit parity), never a UDF.
    * Encoded `file|col|k|base64(bits)` in the entry's `blooms` array
    * ('|' is not in the base64 alphabet). */
  final case class FileBloom(file: String, column: String, k: Int,
      bits: Array[Byte]) {
    def m: Int = bits.length * 8
    def mightContain(v: Long): Boolean =
      bloomPositions(v, k, m).forall(p => (bits(p >>> 3) & (1 << (p & 7))) != 0)
  }

  /** The driver half of the bloom hash — MUST stay bit-identical to the
    * distributed write side in [[fileMeta]] (xxhash64's long fold:
    * seed 42, then each long child rehashes the running hash). */
  private[graft] def bloomPositions(v: Long, k: Int, m: Int): Array[Int] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    Array.tabulate(k)(i =>
      java.lang.Math.floorMod(XXH64.hashLong(v, XXH64.hashLong(i.toLong, 42L)),
        m.toLong).toInt)
  }

  /** A STRING key's long image in every hash-domain structure here (the
    * r19 string-key lift): Spark's own `xxhash64(col)` — seed 42 over the
    * UTF-8 bytes — replayed driver-side bit-identically. String blooms
    * store positions of `xxhash64(i, image)`, i.e. the long fold applied
    * to the image, so [[bloomPositions]] serves both key domains
    * unchanged. An xxhash64 collision between two distinct strings only
    * ever ADDS a bloom/probe false positive (an extra file read) — the
    * pruning layers stay superset-safe, and the rewrite paths match on
    * the actual string values, never the image. */
  private[graft] def keyImage(key: String): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(key)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  final case class Commit(version: Long, op: String,
      add: Seq[String], remove: Seq[String], txnId: Option[String],
      stats: Seq[FileStat] = Seq.empty,
      /** checkpoint entries only: every txn token committed ≤ this
        * version, carried forward so exactly-once survives checkpointing
        * (a replayed old batch must still find its token). */
      txns: Seq[String] = Seq.empty,
      /** The subset of `add` whose files carry NO new rows — delete/merge
        * survivor rewrites (the public formats' dataChange=false).
        * [[changesSince]] excludes them so a CDC consumer never replays
        * rows that merely moved files; snapshot reads are unaffected. */
      rewrite: Seq[String] = Seq.empty,
      blooms: Seq[FileBloom] = Seq.empty)

  private def fs(s: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def versionFile(root: String, v: Long): Path =
    new Path(f"$root/$LogDir/$v%020d.json")

  /** Resolve a commit-entry data path against the table root: relative
    * paths are root-local (every writer here produces them); ABSOLUTE
    * paths are cloned-in foreign references ([[cloneShallow]]) and
    * resolve as-is. */
  private[graft] def dataPath(root: String, p: String): String =
    if (p.startsWith("/")) p else s"$root/$p"

  /** Immutable-data-dir grouping key for a commit path (schema memo /
    * evolved-read groups): the leading dir for root-local paths, the
    * full parent dir for cloned-in absolute ones (a bare prefix would
    * collapse every foreign dir into one memo key — a stale-schema
    * hazard). */
  private def dirKey(p: String): String =
    if (p.startsWith("/")) p.substring(0, p.lastIndexOf('/'))
    else p.takeWhile(_ != '/')

  // ---------- codec ----------

  private[graft] def enc(c: Commit): String = {
    def arr(xs: Seq[String]) =
      xs.map(x => "\"" + GraftSession.jsonEscape(x) + "\"").mkString("[", ",", "]")
    val txn = c.txnId.map(t => s""","txn":"${GraftSession.jsonEscape(t)}"""").getOrElse("")
    val st = if (c.stats.isEmpty) ""
      else s""","stats":${arr(c.stats.map(f => s"${f.file}|${f.column}|${f.min}|${f.max}"))}"""
    val tx = if (c.txns.isEmpty) "" else s""","txns":${arr(c.txns)}"""
    val rw = if (c.rewrite.isEmpty) "" else s""","rewrite":${arr(c.rewrite)}"""
    val bl = if (c.blooms.isEmpty) ""
      else s""","blooms":${arr(c.blooms.map(b => s"${b.file}|${b.column}|${b.k}|" +
        java.util.Base64.getEncoder.encodeToString(b.bits)))}"""
    s"""{"version":${c.version},"op":"${c.op}","add":${arr(c.add)},"remove":${arr(c.remove)}$txn$st$tx$rw$bl}"""
  }

  /** Minimal parser for the exact shape [[enc]] writes (see object doc
    * for why that's sufficient): quoted strings inside the named arrays,
    * unescaped on read. */
  /** Decode one escape sequence starting at `json(j) == '\\'`, appending
    * the decoded character; returns the index after the sequence. Inverse
    * of [[GraftSession.jsonEscape]] (incl. the `\u00XX` control-char
    * forms), plus the standard `\b`/`\f` a conforming external rewriter
    * may emit; unknown or malformed escapes (incl. `\u` not followed by
    * four hex digits) pass through literally — which also reads
    * pre-escaping log entries (raw control chars) unchanged. */
  private def unescapeAt(json: String, j: Int, sb: java.lang.StringBuilder): Int =
    json.charAt(j + 1) match {
      case 'n' => sb.append('\n'); j + 2
      case 't' => sb.append('\t'); j + 2
      case 'r' => sb.append('\r'); j + 2
      case 'b' => sb.append('\b'); j + 2
      case 'f' => sb.append('\f'); j + 2
      case 'u' if j + 5 < json.length &&
          json.substring(j + 2, j + 6).forall(c => Character.digit(c, 16) >= 0) =>
        sb.append(Integer.parseInt(json.substring(j + 2, j + 6), 16).toChar); j + 6
      case c => sb.append(c); j + 2 // \" and \\ (and lenient passthrough)
    }

  private[graft] def dec(version: Long, json: String): Commit = {
    // quote-aware array scan: elements are read as escaped JSON strings,
    // so a caller-supplied txn token containing a comma (or quote) in a
    // checkpoint's txns array round-trips — a naive split-on-comma would
    // shear it and silently break replay detection
    def field(name: String): Seq[String] = {
      val i = json.indexOf(s""""$name":[""")
      if (i < 0) return Seq.empty
      var j = json.indexOf('[', i) + 1
      val out = Seq.newBuilder[String]
      var done = false
      while (!done && j < json.length) {
        json.charAt(j) match {
          case ']' => done = true
          case '"' =>
            val sb = new java.lang.StringBuilder
            j += 1
            var inStr = true
            while (inStr && j < json.length) {
              json.charAt(j) match {
                case '\\' if j + 1 < json.length =>
                  j = unescapeAt(json, j, sb)
                case '"' => inStr = false; j += 1
                case ch => sb.append(ch); j += 1
              }
            }
            out += sb.toString
          case _ => j += 1 // comma / whitespace between elements
        }
      }
      out.result()
    }
    val op = {
      val i = json.indexOf("\"op\":\"")
      val start = i + 6
      json.substring(start, json.indexOf('"', start))
    }
    val txn = {
      val i = json.indexOf("\"txn\":\"")
      if (i < 0) None
      else {
        // the token is CALLER-supplied free text (unlike the
        // library-generated paths), so the scan must honor enc()'s
        // escaping: stop at the first UNescaped quote, then unescape
        val start = i + 7
        val sb = new java.lang.StringBuilder
        var j = start
        var done = false
        while (!done && j < json.length) {
          json.charAt(j) match {
            case '\\' if j + 1 < json.length =>
              j = unescapeAt(json, j, sb)
            case '"' => done = true
            case c => sb.append(c); j += 1
          }
        }
        Some(sb.toString)
      }
    }
    val stats = field("stats").flatMap { enc =>
      enc.split('|') match {
        case Array(f, c, lo, hi) =>
          for (l <- lo.toLongOption; h <- hi.toLongOption) yield FileStat(f, c, l, h)
        case _ => None
      }
    }
    val blooms = field("blooms").flatMap { enc =>
      enc.split('|') match {
        case Array(f, c, k, b64) =>
          for (kk <- k.toIntOption;
               bits <- scala.util.Try(java.util.Base64.getDecoder.decode(b64)).toOption)
            yield FileBloom(f, c, kk, bits)
        case _ => None
      }
    }
    Commit(version, op, field("add"), field("remove"), txn, stats, field("txns"),
      field("rewrite"), blooms)
  }

  // ---------- log access ----------

  private def readEntry(f: FileSystem, v: Long, p: Path): Commit = {
    val in = f.open(p)
    val bytes = try {
      val len = f.getFileStatus(p).getLen.toInt
      val b = new Array[Byte](len)
      in.readFully(0, b)
      b
    } finally in.close()
    dec(v, new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** The committed entries ≤ asOf, in version order — starting from the
    * LATEST CHECKPOINT ≤ asOf when one exists (see [[checkpoint]]): the
    * checkpoint is a synthetic base entry carrying the folded live set,
    * live stats, the cumulative removed-file list (vacuum still sees
    * pre-checkpoint corpses) and every txn token seen (exactly-once
    * survives), so reads cost O(commits since checkpoint), not
    * O(history) — the bound that matters when s22 commits one version
    * per micro-batch. Time travel BELOW the newest checkpoint falls back
    * to an older checkpoint or the raw prefix (commit files are never
    * deleted), so asOf semantics are unchanged.
    */
  def log(s: SparkSession, root: String, asOf: Long = Long.MaxValue): Seq[Commit] = {
    val f = fs(s, root)
    val dir = new Path(s"$root/$LogDir")
    if (!f.exists(dir)) return Seq.empty
    val files = f.listStatus(dir).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("."))
    val commits = files
      .filter(st => st.getPath.getName.endsWith(".json") &&
        !st.getPath.getName.endsWith(".checkpoint.json"))
      .flatMap(st => st.getPath.getName.stripSuffix(".json").toLongOption
        .map(v => (v, st.getPath)))
      .filter(_._1 <= asOf)
    val base = files
      .flatMap(st => st.getPath.getName.stripSuffix(".checkpoint.json").toLongOption
        .filter(_ => st.getPath.getName.endsWith(".checkpoint.json"))
        .map(v => (v, st.getPath)))
      .filter(_._1 <= asOf)
      .sortBy(_._1).lastOption
    val tail = commits
      .filter { case (v, _) => base.forall(_._1 < v) }
      .sortBy(_._1)
      .map { case (v, p) => readEntry(f, v, p) }
    base.map { case (v, p) => readEntry(f, v, p) }.toSeq ++ tail
  }

  def headVersion(s: SparkSession, root: String): Long =
    log(s, root).lastOption.map(_.version).getOrElse(0L)

  /** Time travel by TIMESTAMP — the public table formats' semantics
    * (Delta's AS OF TIMESTAMP): the version of record at `tsMillis` is
    * the LAST commit whose log-file modification time is ≤ the asked
    * instant. The log entry's mtime is assigned by the filesystem at the
    * atomic create that IS the commit, so it needs no log-format change
    * and is exactly as monotone as the commit sequence itself (a clock
    * step between commits can tie mtimes — the max-version winner below
    * matches the public formats' tie rule). Asking for an instant before
    * the first commit is an error, same as Delta: there is no table to
    * read there.
    *
    * Checkpoint files are ignored here on purpose: a checkpoint REWRITES
    * history at a later wall-clock time; only original commit entries
    * carry the when-did-this-version-land fact. Vacuumed-away versions
    * (entries compacted into a checkpoint) resolve to the checkpoint
    * base — the same "earliest available version" clamp the public
    * formats apply.
    */
  def versionAsOfTime(s: SparkSession, root: String, tsMillis: Long): Long = {
    val f = fs(s, root)
    val dir = new Path(s"$root/$LogDir")
    require(f.exists(dir), s"no commit log at $root")
    val stamped = f.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".json") &&
        !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.endsWith(".checkpoint.json"))
      .flatMap(st => st.getPath.getName.stripSuffix(".json").toLongOption
        .map(v => (v, st.getModificationTime)))
    val checkpoints = f.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".checkpoint.json"))
      .flatMap(_.getPath.getName.stripSuffix(".checkpoint.json").toLongOption)
    require(stamped.nonEmpty || checkpoints.nonEmpty, s"no commit entries at $root")
    val eligible = stamped.filter(_._2 <= tsMillis)
    // a checkpoint base is the EARLIEST reconstructable version ONLY once
    // the older entries were actually compacted away (vacuum). While the
    // original entries still exist alongside a checkpoint, their mtimes
    // remain the authoritative when-did-this-land record — an instant
    // that predates them all predates the TABLE, and clamping it to the
    // checkpoint base would silently resolve a pre-history timestamp to
    // the head-at-checkpoint version. Clamp only when no entry at or
    // below the checkpoint version survives.
    val clampTo = checkpoints.sorted.lastOption
      .filter(cp => stamped.isEmpty || stamped.map(_._1).min > cp)
    if (eligible.nonEmpty) eligible.map(_._1).max
    else clampTo.getOrElse {
      // history is intact back to its earliest surviving entry and every
      // entry (incl. version 0's) postdates the instant: the timestamp
      // truly predates the table
      throw new IllegalArgumentException(
        s"timestamp $tsMillis predates the first commit at $root")
    }
  }

  /** Snapshot read at a wall-clock instant — [[versionAsOfTime]] composed
    * with the ordinary version snapshot. */
  def snapshotAsOfTime(s: SparkSession, root: String, tsMillis: Long): DataFrame =
    snapshot(s, root, versionAsOfTime(s, root, tsMillis))

  /** DESCRIBE HISTORY — the audit table the public formats expose: one
    * row per log entry still present (vacuum/checkpoint compaction
    * removes history by construction; checkpoint base files row with
    * op = checkpoint), carrying the op tag, add/remove/rewrite counts,
    * the exactly-once txn id if any, and the commit instant. The instant
    * is the entry file's mtime — the SAME clock [[versionAsOfTime]]
    * resolves against, so `history` and timestamp time travel can never
    * disagree about when a version landed. Driver-built: the log is
    * metadata, bounded by commit count, never data-scale.
    */
  def history(s: SparkSession, root: String): DataFrame = {
    val f = fs(s, root)
    val dir = new Path(s"$root/$LogDir")
    require(f.exists(dir), s"no commit log at $root")
    val rows = f.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".json") &&
        !st.getPath.getName.startsWith("."))
      .flatMap { st =>
        val name = st.getPath.getName
        val cp = name.endsWith(".checkpoint.json")
        val v = name.stripSuffix(if (cp) ".checkpoint.json" else ".json").toLongOption
        v.map { ver =>
          val c = readEntry(f, ver, st.getPath)
          (ver, if (cp) "checkpoint" else c.op,
            c.add.size.toLong, c.remove.size.toLong, c.rewrite.size.toLong,
            c.txnId.orNull, new java.sql.Timestamp(st.getModificationTime))
        }
      }
      .sortBy(r => (r._1, r._2))
    import s.implicits._
    rows.toDF("version", "op", "n_added", "n_removed", "n_rewritten",
      "txn_id", "commit_ts")
  }

  /** Live relative file paths at a version (the log fold). */
  def liveFiles(s: SparkSession, root: String, asOf: Long = Long.MaxValue): Seq[String] = {
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    log(s, root, asOf).foreach { c =>
      c.remove.foreach(live -= _)
      c.add.foreach(live += _)
    }
    live.toSeq
  }

  /** Snapshot read: exactly the live files of the version, never a
    * directory listing — concurrent commits cannot tear the scan. */
  def snapshot(s: SparkSession, root: String, asOf: Long = Long.MaxValue): DataFrame = {
    val files = liveFiles(s, root, asOf)
    require(files.nonEmpty, s"commit-log table at $root has no live files (asOf=$asOf)")
    s.read.parquet(files.map(p => dataPath(root, p)): _*)
  }

  /** Range scan with commit-log data skipping — the ZoneMap mechanism
    * moved INSIDE the table format, where it stays transactionally
    * consistent with the file set (a side `_zonemap` manifest goes stale
    * the moment a new version commits; stats embedded in the commit
    * entries version WITH the data, including under time travel). Files
    * whose recorded [min, max] on `c` cannot intersect [lo, hi] are
    * skipped at PLANNING time; files with no stat for `c` (none recorded,
    * or all-NULL in that file) are kept — skipping is a superset
    * guarantee, exactly like partition pruning, and the row predicate is
    * re-applied. Returns (frame, files read, files live) so callers and
    * specs can see the skip.
    */
  def snapshotRange(s: SparkSession, root: String, c: String, lo: Long, hi: Long,
      asOf: Long = Long.MaxValue): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.col
    val entries = log(s, root, asOf)
    val live = liveFiles(s, root, asOf)
    val statByFile = entries.flatMap(_.stats).filter(_.column == c)
      .map(st => st.file -> st).toMap // later duplicate wins (rewrites)
    val kept = live.filter { f =>
      statByFile.get(f).forall(st => st.max >= lo && st.min <= hi)
    }
    val pred = col(c) >= lo && col(c) <= hi
    if (live.isEmpty)
      throw new IllegalArgumentException(s"commit-log table at $root has no live files")
    else if (kept.isEmpty)
      (snapshot(s, root, asOf).filter(org.apache.spark.sql.functions.lit(false)),
        0, live.size)
    else
      (readFilesEvolved(s, root, kept).filter(pred), kept.size, live.size)
  }

  /** BOX range scan — [[snapshotRange]] over several columns at once,
    * the z-order payoff shape (a zone query constrains BOTH dims): a
    * file is read only if EVERY predicate's recorded [min, max] can
    * intersect its range (missing stat on a column ⇒ unskippable on that
    * column — the same superset rule, intersected), and the full
    * conjunction is re-applied to rows. On a zkey-clustered table the
    * intersection skips strictly more than either dim alone — spec-pinned
    * in the z-order layout test. Returns (frame, files read, files live).
    */
  def snapshotBox(s: SparkSession, root: String,
      preds: Seq[(String, Long, Long)],
      asOf: Long = Long.MaxValue): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    require(preds.nonEmpty, "snapshotBox needs at least one (column, lo, hi) predicate")
    val entries = log(s, root, asOf)
    val live = liveFiles(s, root, asOf)
    if (live.isEmpty)
      throw new IllegalArgumentException(s"commit-log table at $root has no live files")
    val folds = preds.map { case (c, _, _) => c -> statFold(entries, c) }.toMap
    val kept = live.filter { f =>
      preds.forall { case (c, lo, hi) =>
        folds(c).get(f).forall(st => st.max >= lo && st.min <= hi)
      }
    }
    val rowPred = preds.map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi }
      .reduce(_ && _)
    if (kept.isEmpty)
      (snapshot(s, root, asOf).filter(lit(false)), 0, live.size)
    else
      (readFilesEvolved(s, root, kept).filter(rowPred), kept.size, live.size)
  }

  // ---------- commit protocol ----------

  /** Write df into a fresh immutable data dir; returns relative parquet
    * paths. Data is invisible until a commit references it. */
  private def writeData(df: DataFrame, root: String): Seq[String] = {
    val s = df.sparkSession
    val dirName = s"d-${java.util.UUID.randomUUID()}"
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$dirName")
    val f = fs(s, root)
    f.listStatus(new Path(s"$root/$dirName")).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => s"$dirName/${st.getPath.getName}")
      .sorted
  }

  /** Per-root in-process locks: POSIX rename(2) REPLACES an existing
    * destination (Hadoop's RawLocalFileSystem inherits that), so on a
    * local filesystem the version-file rename alone is NOT a lock — two
    * same-JVM writers could both "succeed" and one commit would vanish.
    * All local writers share this JVM (local[n] — the deployment the
    * local scheme actually has), so a per-root monitor restores the
    * serialization there; on HDFS, where rename onto an existing path
    * fails, the rename itself is the cross-JVM lock. The read-back
    * verification below additionally detects a cross-JVM local-FS
    * overwrite after the fact. Multi-JVM writers on one LOCAL directory
    * remain outside the contract (real deployments are HDFS or a commit
    * service — the AtomicGen caveat).
    */
  private val rootLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** The optimistic-concurrency loop: stage the entry dot-invisible, try
    * to rename onto the next version, verify by read-back; on a lost
    * race re-read the head (re-deriving `remove` via `removeAtHead` so
    * an overwrite/compact retried against a moved head removes the
    * RIGHT files) and retry.
    */
  private def commitEntry(s: SparkSession, root: String, op: String,
      add: Seq[String], removeAtHead: Seq[Commit] => Seq[String],
      txnId: Option[String], stats: Seq[FileStat] = Seq.empty,
      rewrite: Seq[String] = Seq.empty,
      blooms: Seq[FileBloom] = Seq.empty): Option[Long] =
    rootLocks.computeIfAbsent(root, _ => new Object).synchronized {
      val f = fs(s, root)
      f.mkdirs(new Path(s"$root/$LogDir"))
      var attempt = 0
      while (attempt < MaxCommitRetries) {
        val entries = log(s, root)
        if (txnId.exists(t => entries.exists(e => e.txnId.contains(t) || e.txns.contains(t))))
          return None // idempotent replay: the token already committed
        val v = entries.lastOption.map(_.version).getOrElse(0L) + 1
        val target = versionFile(root, v)
        if (!f.exists(target)) {
          val body = enc(Commit(v, op, add, removeAtHead(entries), txnId, stats,
            Seq.empty, rewrite, blooms))
          val staged = new Path(s"$root/$LogDir/.staging-${java.util.UUID.randomUUID()}.json")
          val out = f.create(staged, false)
          try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          if (f.rename(staged, target)) {
            // read-back verification: on a filesystem whose rename
            // replaces, a cross-process racer may have overwritten us
            // (or we them) — whoever reads back foreign bytes lost
            val in = f.open(target)
            val got = try {
              val len = f.getFileStatus(target).getLen.toInt
              val b = new Array[Byte](len)
              in.readFully(0, b)
              new String(b, java.nio.charset.StandardCharsets.UTF_8)
            } finally in.close()
            if (got == body) return Some(v)
          } else f.delete(staged, false) // lost the race: clean our stage
        }
        attempt += 1
      }
      throw new java.io.IOException(
        s"commit-log: lost $MaxCommitRetries consecutive commit races at $root")
    }

  /** ONE scan over a just-written file set computing EVERYTHING the
    * commit entry embeds per physical file — row count (the
    * empty-survivor drop), [min, max] long stats, and bloom bit
    * positions — where the write path formerly paid a count scan, a
    * stats scan, and one scan PER bloom column (r18 advice: mutation
    * read amplification). Blooms avoid the explode entirely: k
    * `collect_set`s of the k position expressions per column keep the
    * frame one-row-per-input-row, so one aggregate serves all three
    * metadata layers.
    *
    * STATS ([[snapshotRange]]): columns cast to long (integer-exact
    * stats only — the repo-wide determinism rule); an all-NULL column
    * carries no stat row → kept (unskippable), never falsely skipped.
    * '|' is reserved by the entry codec.
    *
    * BLOOMS ([[probeFiles]]): for the union of
    * `graft.commitlog.bloomColumns` (session-wide default) and
    * `bloomFor` (the caller-threaded explicit form). Integral columns
    * hash as their long value, STRING columns as their [[keyImage]];
    * other types are skipped silently (one session conf can serve
    * several tables). k=6 positions per non-null value via Spark's own
    * `xxhash64` — the driver probe replays the identical fold
    * ([[bloomPositions]]). Files whose non-null key count saturates the
    * filter (> m/8 → fpp ≳ 2%) store NO bloom and stay unskippable —
    * honest metadata only. m defaults to 65536 bits (8 KB; conf
    * `graft.commitlog.bloomBits`), sized for micro-batch-scale files —
    * exactly the s38 regime where the probe-read bound matters. A file
    * whose key column is entirely NULL stores an all-zero bloom: NULL
    * never equals a probe key, so skipping it is exact.
    *
    * DROP (`dropEmpty` — the [[merge]]/[[delete]] survivor rule): a
    * touched file whose every row was updated/deleted writes an EMPTY
    * part file, which carries no stats and no bloom and would be
    * UNSKIPPABLE forever (the r18 ClusterCensus finding: probe reads
    * grew with table age purely from accumulated empty rewrites) — it
    * is deleted on the spot and excluded from the returned add list.
    * Append/create keep zero-row files (create's IS the schema
    * carrier). */
  private def fileMeta(s: SparkSession, root: String, add: Seq[String],
      statsFor: Seq[String], bloomFor: Seq[String], dropEmpty: Boolean)
      : (Seq[String], Seq[FileStat], Seq[FileBloom]) = {
    if (add.isEmpty) return (add, Seq.empty, Seq.empty)
    require(statsFor.forall(!_.contains('|')), "stat column names must not contain '|'")
    import org.apache.spark.sql.functions.{col, collect_set, count, input_file_name, lit, max, min, pmod, when, xxhash64}
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    val m = s.conf.getOption("graft.commitlog.bloomBits").map(_.toInt).getOrElse(65536)
    require(m > 0 && m % 8 == 0, s"graft.commitlog.bloomBits must be a positive multiple of 8, got $m")
    val k = 6
    val df = s.read.parquet(add.map(p => dataPath(root, p)): _*)
    val typeOf = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val bloomCols = (s.conf.getOption("graft.commitlog.bloomColumns")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty) ++ bloomFor).distinct
    require(bloomCols.forall(!_.contains('|')), "bloom column names must not contain '|'")
    val bCols = bloomCols.flatMap { c =>
      typeOf.get(c).collect {
        case LongType | IntegerType | ShortType | ByteType => c -> col(c).cast("long")
        case StringType => c -> xxhash64(col(c))
      }
    }
    val aggs: Seq[org.apache.spark.sql.Column] =
      Seq(count(lit(1)).as("__n")) ++
        statsFor.flatMap(c => Seq(
          min(col(c).cast("long")).as(s"${c}__min"),
          max(col(c).cast("long")).as(s"${c}__max"))) ++
        bCols.flatMap { case (c, img) =>
          (0 until k).map(i => collect_set(when(col(c).isNotNull,
            pmod(xxhash64(lit(i.toLong), img), lit(m.toLong)).cast("int")))
            .as(s"${c}__b$i")) :+ count(col(c)).as(s"${c}__nk")
        }
    val byName = add.map(p => p.split('/').last -> p).toMap
    // a zero-row file produces no group at all — presence IS the n>0 test
    val metaOf = df.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().toSeq
      .flatMap(r => byName.get(r.getString(0).split('/').last).map(_ -> r))
      .toMap
    val keep =
      if (!dropEmpty) add
      else {
        val (k0, drop) = add.partition(metaOf.contains)
        drop.foreach(p => fs(s, root).delete(new Path(dataPath(root, p)), false))
        k0
      }
    val stats = keep.flatMap { p =>
      metaOf.get(p).toSeq.flatMap { r =>
        statsFor.flatMap { c =>
          val (iMin, iMax) = (r.fieldIndex(s"${c}__min"), r.fieldIndex(s"${c}__max"))
          if (r.isNullAt(iMin) || r.isNullAt(iMax)) None
          else Some(FileStat(p, c, r.getLong(iMin), r.getLong(iMax)))
        }
      }
    }
    val blooms = keep.flatMap { p =>
      metaOf.get(p).toSeq.flatMap { r =>
        bCols.flatMap { case (c, _) =>
          val nk = r.getLong(r.fieldIndex(s"${c}__nk"))
          if (nk > m / 8) None // saturated: no bloom, unskippable
          else {
            val bits = new Array[Byte](m / 8)
            (0 until k).foreach { i =>
              r.getSeq[Int](r.fieldIndex(s"${c}__b$i")).foreach(pos =>
                bits(pos >>> 3) = (bits(pos >>> 3) | (1 << (pos & 7))).toByte)
            }
            Some(FileBloom(p, c, k, bits))
          }
        }
      }
    }
    (keep, stats, blooms)
  }

  /** Latest bloom per live file for a column (the [[statFold]] twin). */
  private[graft] def bloomFold(entries: Seq[Commit],
      column: String): Map[String, FileBloom] =
    entries.flatMap(_.blooms).filter(_.column == column)
      .map(b => b.file -> b).toMap // later duplicate wins (rewrites)

  /** Live files that MIGHT hold any of `keys` on `column` — the
    * hash-domain twin of [[snapshotRange]]'s file skipping, combining
    * both metadata layers: a file is skipped when its [min, max] stat
    * excludes every key OR its bloom contains none of them; files with
    * neither are kept (unskippable — superset-safe, the pruning is an
    * optimization, never a correctness dependency). This is the bound
    * that makes a maintained table's per-batch probe reads proportional
    * to the batch's actual overlap instead of the table's age (s38's
    * sink): for a mostly-novel stream, old files genuinely lack the new
    * batch's keys and their blooms prune them without a read.
    */
  def probeFiles(s: SparkSession, root: String, column: String,
      keys: Seq[Long], asOf: Long = Long.MaxValue): Seq[String] = {
    if (keys.isEmpty) return Seq.empty
    val ks = keys.toArray
    probeFilesBy(s, root, column, Some(ks), ks, asOf)
  }

  /** [[probeFiles]] for STRING keys: blooms prune on each key's
    * [[keyImage]]; the [min, max] stats layer is intentionally ignored
    * (string columns carry no long stats, and a numeric-LOOKING string
    * column's accidental long stats would not be the key's order
    * anyway) — superset-safe either way. */
  def probeFilesString(s: SparkSession, root: String, column: String,
      keys: Seq[String], asOf: Long = Long.MaxValue): Seq[String] = {
    if (keys.isEmpty) return Seq.empty
    probeFilesBy(s, root, column, None, keys.toArray.map(keyImage), asOf)
  }

  private def probeFilesBy(s: SparkSession, root: String, column: String,
      rangeKeys: Option[Array[Long]], images: Array[Long],
      asOf: Long): Seq[String] = {
    val entries = log(s, root, asOf)
    val live = liveFiles(s, root, asOf)
    val stats = statFold(entries, column)
    val blooms = bloomFold(entries, column)
    // positions depend only on (key, k, m) — hash each key once per
    // distinct filter geometry, not once per file (the probe is a
    // per-micro-batch driver step; O(keys·k) hashes + O(files·keys)
    // bit tests)
    val posCache = scala.collection.mutable.HashMap.empty[(Int, Int), Array[Array[Int]]]
    def positionsFor(k: Int, m: Int): Array[Array[Int]] =
      posCache.getOrElseUpdate((k, m), images.map(v => bloomPositions(v, k, m)))
    live.filter { f =>
      rangeKeys.forall(ks =>
        stats.get(f).forall(st => ks.exists(v => v >= st.min && v <= st.max))) &&
        blooms.get(f).forall { b =>
          val pos = positionsFor(b.k, b.m)
          pos.exists(_.forall(p => (b.bits(p >>> 3) & (1 << (p & 7))) != 0))
        }
    }
  }

  /** [[probeFiles]] as a frame: the kept files' ROWS (evolved read, NOT
    * row-filtered — the caller's joins do exact key matching; this layer
    * only bounds which files are opened), plus (kept, live) counts for
    * observability. An empty keep set returns the empty-but-schema'd
    * frame like [[snapshotRange]]'s short circuit. */
  def snapshotProbe(s: SparkSession, root: String, column: String,
      keys: Seq[Long], asOf: Long = Long.MaxValue): (DataFrame, Int, Int) = {
    val live = liveFiles(s, root, asOf)
    require(live.nonEmpty, s"commit-log table at $root has no live files")
    val kept = probeFiles(s, root, column, keys, asOf)
    if (kept.isEmpty)
      (snapshot(s, root, asOf).filter(org.apache.spark.sql.functions.lit(false)),
        0, live.size)
    else (readFilesEvolved(s, root, kept), kept.size, live.size)
  }

  /** [[snapshotProbe]] for STRING keys ([[probeFilesString]]). */
  def snapshotProbeString(s: SparkSession, root: String, column: String,
      keys: Seq[String], asOf: Long = Long.MaxValue): (DataFrame, Int, Int) = {
    val live = liveFiles(s, root, asOf)
    require(live.nonEmpty, s"commit-log table at $root has no live files")
    val kept = probeFilesString(s, root, column, keys, asOf)
    if (kept.isEmpty)
      (snapshot(s, root, asOf).filter(org.apache.spark.sql.functions.lit(false)),
        0, live.size)
    else (readFilesEvolved(s, root, kept), kept.size, live.size)
  }

  /** Append df as a new version. `txnId` makes the commit exactly-once
    * under replays (foreachBatch: pass the batch id); `statsFor` embeds
    * per-file min/max skipping stats for the named long-castable columns
    * into the commit entry (see [[snapshotRange]]); `bloomFor` embeds
    * per-file blooms for the named integral/string key columns (see
    * [[probeFiles]]) — the EXPLICIT form of the session-wide
    * `graft.commitlog.bloomColumns` conf, safe under concurrent writers
    * in one session (the two union). Returns the committed version, or
    * None if the token was already committed. */
  def append(df: DataFrame, root: String, txnId: Option[String] = None,
      statsFor: Seq[String] = Seq.empty,
      bloomFor: Seq[String] = Seq.empty): Option[Long] = {
    val s = df.sparkSession
    if (txnId.exists(t => log(s, root).exists(e => e.txnId.contains(t) || e.txns.contains(t))))
      return None // cheap pre-check: replay skips the data write too
    val add = writeData(df, root)
    val (_, stats, blooms) = fileMeta(s, root, add, statsFor, bloomFor,
      dropEmpty = false)
    val committed = commitEntry(s, root, "append", add, _ => Seq.empty, txnId,
      stats, blooms = blooms)
    if (committed.isEmpty && add.nonEmpty) {
      // token race lost AFTER the data write (two concurrent replays both
      // passed the pre-check): this dir is OURS and will never be
      // referenced — delete it now, because vacuum deliberately spares
      // unreferenced dirs (they could belong to an in-flight writer) and
      // retry-heavy streaming would otherwise leak one dir per lost race
      fs(s, root).delete(new Path(s"$root/${add.head.takeWhile(_ != '/')}"), true)
    }
    committed
  }

  /** CREATE TABLE — an empty table whose schema is durable: version 1 is
    * a zero-row parquet commit (op `create`), so the schema rides in a
    * parquet footer exactly like every other version's and the format
    * needs NO separate metadata store (schema-on-read stays the one
    * schema mechanism; an empty table is simply a table whose one live
    * file has no rows). The SQL catalog's `CREATE TABLE` lands here;
    * CTAS follows with an ordinary [[append]]. Refuses a root that
    * already has commits — create is not idempotent by design (the
    * catalog maps "already exists" to its own exception). */
  def create(s: SparkSession, root: String,
      schema: org.apache.spark.sql.types.StructType): Long = {
    require(log(s, root).isEmpty,
      s"create target $root already has a commit log")
    val empty = s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema).coalesce(1)
    val add = writeData(empty, root)
    require(add.nonEmpty,
      s"create at $root wrote no schema-carrying parquet file")
    commitEntry(s, root, "create", add, _ => Seq.empty, None).get
  }

  /** Replace the table contents with df in one version; `statsFor`
    * embeds per-file min/max skipping stats exactly as [[append]]'s (a
    * rebuilt table should not lose the pruning its appends had). */
  def overwrite(df: DataFrame, root: String,
      statsFor: Seq[String] = Seq.empty): Long = {
    val s = df.sparkSession
    val add = writeData(df, root)
    val (_, stats, blooms) = fileMeta(s, root, add, statsFor, Seq.empty,
      dropEmpty = false)
    commitEntry(s, root, "overwrite", add, entries => {
      val live = scala.collection.mutable.LinkedHashSet.empty[String]
      entries.foreach { c => c.remove.foreach(live -= _); c.add.foreach(live += _) }
      live.toSeq
    }, None, stats, blooms = blooms).get
  }

  /** Fold the current live files into one coalesced data dir — small-file
    * compaction as ONE commit (add compacted, remove olds); readers at
    * older versions still resolve the old files. Concurrency contract:
    * compact races safely with APPENDs (a racing append's files stay
    * live beside the compacted copy — the removal set is re-derived at
    * commit time); compact racing an OVERWRITE is outside the contract
    * (the compacted copy would resurrect overwritten rows — real table
    * formats reject that pairing in conflict detection; one writer per
    * table for destructive ops is this seam's rule, as in AtomicGen). */
  def compact(s: SparkSession, root: String, partitions: Int = 1,
      statsFor: Seq[String] = Seq.empty,
      /** OPTIMIZE-style re-clustering: when set, the compacted copy is
        * range-repartitioned + sorted on these columns instead of
        * coalesced, so each output file owns a contiguous key run and
        * the re-collected `statsFor` stats stay TIGHT — a plain coalesce
        * packs small files in size order, mixing key ranges and widening
        * every [min, max] until snapshotRange can no longer skip (the
        * z-order layout story: cluster on the zkey, keep pruning on both
        * zone dims through the compaction). */
      clusterBy: Seq[String] = Seq.empty): Long = {
    import org.apache.spark.sql.functions.col
    val before = liveFiles(s, root)
    require(before.nonEmpty, s"nothing to compact at $root")
    val snap = snapshot(s, root)
    val folded =
      if (clusterBy.isEmpty) snap.coalesce(partitions)
      else snap.repartitionByRange(partitions, clusterBy.map(col): _*)
        .sortWithinPartitions(clusterBy.map(col): _*)
    val add = writeData(folded, root)
    // re-collect skipping stats for the rewritten files (a compaction
    // that silently DROPPED its inputs' stats would turn every future
    // snapshotRange over the compacted span into a full read), and
    // blooms survive compaction like stats: re-collect for every column
    // the pre-compaction live set carried a bloom on (plus the session
    // conf), so a maintained table compacted through CALL keeps its
    // probe pruning — saturated outputs auto-skip storage
    val (_, stats, blooms) = fileMeta(s, root, add, statsFor,
      log(s, root).flatMap(_.blooms).map(_.column).distinct, dropEmpty = false)
    commitEntry(s, root, "compact", add, entries => {
      // remove what is live at COMMIT time, not at read time: if an
      // append raced in, its files are not ours to remove — re-deriving
      // from `entries` keeps only files that existed when we read…
      val live = scala.collection.mutable.LinkedHashSet.empty[String]
      entries.foreach { c => c.remove.foreach(live -= _); c.add.foreach(live += _) }
      // …intersected with the snapshot we actually rewrote: racing
      // appends stay live alongside the compacted copy
      live.toSeq.filter(before.contains)
    }, None, stats, blooms = blooms).get
  }

  /** Incremental change feed — the CDC-lite consumption loop a commit
    * log enables for append-shaped tables: the rows added STRICTLY AFTER
    * `sinceVersion`, read from exactly the files those commits added.
    * Compaction and checkpoint entries are excluded by op (they re-add
    * files whose ROWS already flowed — the dataChange=false idea from
    * the public formats, keyed off the op tag here); `overwrite` adds
    * ARE included (its rows are new content; a consumer that must also
    * observe the retraction diffs snapshots — q98's job). Returns
    * (frame, new cursor) so the caller persists the new cursor only
    * after processing succeeds (at-least-once by construction; pair
    * with a txn-token sink for exactly-once). Retention: a cursor that
    * lags behind a vacuum may reference reclaimed files and fails
    * LOUDLY on read (the standard CDC retention trade — vacuum no
    * earlier than your slowest consumer).
    *
    * `maxVersions` is the batch-consumer twin of the streaming source's
    * admission control: a poller whose cursor fell months behind
    * otherwise gets the ENTIRE backlog in one frame. Bounded, the
    * returned cursor advances at most `maxVersions` past `sinceVersion`
    * — loop until the cursor stops moving to drain; the default is the
    * old everything-at-once behavior, unchanged.
    */
  def changesSince(s: SparkSession, root: String, sinceVersion: Long,
      maxVersions: Long = Long.MaxValue): (Option[DataFrame], Long) = {
    require(maxVersions >= 1, s"changesSince maxVersions must be >= 1, got $maxVersions")
    val cap = if (Long.MaxValue - maxVersions < sinceVersion) Long.MaxValue
              else sinceVersion + maxVersions
    val (files, head) = changedFiles(s, root, sinceVersion, cap)
    // the cursor never jumps past the cap: versions (cap, head] were NOT
    // read, so handing back `head` would silently skip them
    val cursor = math.min(head, cap)
    if (files.isEmpty) (None, cursor)
    // evolved fold, not a plain multi-file read: a cursor window spanning
    // a schema evolution must null-fill, never take one group's schema
    else (Some(readFilesEvolved(s, root, files)), cursor)
  }

  /** The raw-commit change walk shared by [[changesSince]] and the
    * `graft-changefeed` streaming source: relative paths of the files
    * whose ROWS are new content in versions (`sinceVersion`, `toVersion`]
    * (compaction/checkpoint re-adds and dataChange=false survivor
    * rewrites excluded), plus the head version. RAW commits, never the
    * checkpoint fold: a cursor BELOW the newest checkpoint must still see
    * the individual append entries the fold hides (commit files are
    * never deleted, so the raw walk is always available); cost is
    * O(commits since cursor) — the cursor advances, so a live consumer
    * never replays deep history.
    */
  private[graft] def changedFiles(s: SparkSession, root: String,
      sinceVersion: Long, toVersion: Long): (Seq[String], Long) = {
    val (byVersion, head) = changedFilesByVersion(s, root, sinceVersion, toVersion)
    (byVersion.flatMap(_._2).toSeq, head)
  }

  /** [[changedFiles]] with per-version attribution — the change walk the
    * streaming source's admission control needs (it decides how many
    * versions fit a micro-batch from each version's file count, in ONE
    * log-dir listing instead of one per candidate version). The
    * per-version entries are a LAZY iterator: the listing is one
    * listStatus, but each element reads one commit file, and admission
    * control stops at its bound — a files-only bound over a deep
    * backfill must not parse the whole (since, head] window per trigger.
    * Versions whose commits carry no new-row files (compaction,
    * checkpoints, pure rewrites, pure removes) still appear, with an
    * empty file list — the cursor must be able to advance past them. */
  private[graft] def changedFilesByVersion(s: SparkSession, root: String,
      sinceVersion: Long, toVersion: Long): (Iterator[(Long, Seq[String])], Long) = {
    val f = fs(s, root)
    val dir = new Path(s"$root/$LogDir")
    require(f.exists(dir), s"commit-log table at $root is empty")
    val commits = f.listStatus(dir).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith(".") &&
        st.getPath.getName.endsWith(".json") &&
        !st.getPath.getName.endsWith(".checkpoint.json"))
      .flatMap(st => st.getPath.getName.stripSuffix(".json").toLongOption
        .map(v => (v, st.getPath)))
      .sortBy(_._1)
    require(commits.nonEmpty, s"commit-log table at $root is empty")
    val head = commits.last._1
    val byVersion = commits.iterator
      .filter { case (v, _) => v > sinceVersion && v <= toVersion }
      .map { case (v, p) =>
        val c = readEntry(f, v, p)
        val files =
          if (c.op == "compact" || c.op == "checkpoint") Seq.empty[String]
          else c.add.filterNot(c.rewrite.toSet) // rewrites carry no new rows
        (v, files)
      }
    (byVersion, head)
  }

  /** Fold the log at head into one CHECKPOINT entry
    * (`<v>.checkpoint.json`), so every future read starts from the fold
    * instead of replaying the whole history — the bound that matters
    * once s22 commits one version per micro-batch. The checkpoint
    * carries: the live file set (as `add`), the cumulative removed-file
    * list (as `remove` — vacuum still finds pre-checkpoint corpses), the
    * LATEST stat per live (file, column), and the most recent
    * [[TxnRetention]] txn tokens in commit order — exactly-once replay
    * detection is therefore guaranteed for any batch within the
    * retention window, which is the only window a checkpointed stream
    * can actually replay from (the engine re-runs at most the last
    * uncommitted batches, never the deep past); retaining EVERY token
    * would make the checkpoint itself the O(history) object it exists
    * to eliminate (Delta bounds the same state with per-app txn
    * retention). Commit files are never deleted, so time travel below
    * the checkpoint falls back to the raw prefix unchanged. Idempotent:
    * a checkpoint already present at the head version is kept (same
    * fold — entries are immutable). Returns the checkpointed version.
    */
  def checkpoint(s: SparkSession, root: String): Long =
    rootLocks.computeIfAbsent(root, _ => new Object).synchronized {
      val entries = log(s, root)
      require(entries.nonEmpty, s"nothing to checkpoint at $root")
      val v = entries.last.version
      val live = scala.collection.mutable.LinkedHashSet.empty[String]
      entries.foreach { c => c.remove.foreach(live -= _); c.add.foreach(live += _) }
      val everRemoved = (entries.flatMap(_.add) ++ entries.flatMap(_.remove))
        .distinct.filterNot(live)
      val stats = entries.flatMap(_.stats)
        .groupBy(st => (st.file, st.column)).map(_._2.last).toSeq
        .filter(st => live.contains(st.file))
        .sortBy(st => (st.file, st.column))
      // blooms fold exactly like stats: latest per (file, column), live
      // files only — probe pruning must survive checkpointing
      val blooms = entries.flatMap(_.blooms)
        .groupBy(b => (b.file, b.column)).map(_._2.last).toSeq
        .filter(b => live.contains(b.file))
        .sortBy(b => (b.file, b.column))
      // commit order: carried (older) tokens first, then this segment's —
      // takeRight keeps the newest TxnRetention across checkpoint chains
      val txns = (entries.flatMap(c => c.txns ++ c.txnId)).distinct
        .takeRight(TxnRetention)
      val target = new Path(f"$root/$LogDir/$v%020d.checkpoint.json")
      val f = fs(s, root)
      if (!f.exists(target)) {
        val body = enc(Commit(v, "checkpoint", live.toSeq, everRemoved, None, stats,
          txns, Seq.empty, blooms))
        val staged = new Path(s"$root/$LogDir/.staging-${java.util.UUID.randomUUID()}.json")
        val out = f.create(staged, false)
        try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        if (!f.rename(staged, target)) {
          if (!f.exists(target))
            throw new java.io.IOException(s"checkpoint rename failed at $target")
          // idempotent lost race: another checkpointer landed the same
          // fold — reclaim our staged body (commitEntry's cleanup, mirrored)
          f.delete(staged, false): Unit
        }
      }
      v
    }

  /** The latest stat per (file, column) for `column`, folded over the
    * entries — snapshotRange's "later duplicate wins" rule, shared with
    * the row-level mutation paths below. */
  private[graft] def statFold(entries: Seq[Commit], column: String): Map[String, FileStat] =
    entries.flatMap(_.stats).filter(_.column == column)
      .map(st => st.file -> st).toMap

  /** Per-(root, data dir) footer schemas — data dirs are IMMUTABLE once
    * committed, so their schema never changes and can be memoized: a
    * standing s23/s24 stream that mutates a table every micro-batch pays
    * one footer read per NEW dir instead of re-reading every dir's
    * footer on every merge (O(N²) over a stream's lifetime otherwise —
    * review finding). Bounded (the DriverMemo contract) well above any
    * realistic live-dir count; evictions merely cost a re-read. */
  private val dirSchemaCache = new DriverMemo[(String, String),
    org.apache.spark.sql.types.StructType](cap = 65536)

  /** Loud guard for the row-level mutation paths: a rewrite reads its
    * touched files in ONE parquet scan, and a schema-EVOLVED table
    * (mixed per-dir schemas) would silently take one file's schema and
    * drop columns from the others — data loss inside a rewrite. Evolved
    * tables must be unified first (snapshotEvolved + overwrite), then
    * mutated. Footer reads are memoized per immutable data dir
    * ([[dirSchemaCache]]). Returns the (single) schema.
    */
  private def requireUniformSchema(s: SparkSession, root: String,
      files: Seq[String], op: String): org.apache.spark.sql.types.StructType = {
    val schemas = files.groupBy(dirKey).toSeq.sortBy(_._1)
      .map { case (d, fs) =>
        dirSchemaCache.getOrElseUpdate((root, d))(
          s.read.parquet(fs.map(p => dataPath(root, p)): _*).schema)
      }
    if (schemas.distinct.size > 1)
      throw new IllegalArgumentException(
        s"$op at $root would rewrite files with MIXED schemas " +
          s"(${schemas.distinct.map(_.simpleString).mkString(" vs ")}) — a single-scan " +
          "rewrite would silently drop columns; unify first " +
          "(snapshotEvolved + overwrite), then mutate")
    schemas.head
  }

  /** Integral or STRING key columns (r19 lifted the integral-only rule:
    * string keys prune through [[keyImage]] blooms instead of long
    * stats). Returns true for a string key. Any other type is loud —
    * a binary/decimal key would cast to null in the long path and
    * silently misroute a merge into a pure insert (duplicated keys,
    * review finding). */
  private def requireKeyType(schema: org.apache.spark.sql.types.StructType,
      keyCol: String, op: String): Boolean = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    schema(keyCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => false
      case StringType => true
      case dt => throw new IllegalArgumentException(
        s"$op key column '$keyCol' must be an integral or string type " +
          s"(stats/bloom pruning cover only those domains), got ${dt.sql}")
    }
  }

  /** Keyed row-level DELETE — the GDPR right-to-be-forgotten operation,
    * DELTA-SIZED instead of a full-table overwrite: only live files whose
    * commit-embedded [min, max] stats on `keyCol` ADMIT one of the keys
    * are rewritten; every other file keeps its identity (no rewrite, no
    * churn). A file with NO stat on `keyCol` must be rewritten too — the
    * snapshotRange superset rule inverted: uncertainty forces the
    * rewrite, never a missed delete. One commit version: add = the
    * rewritten survivors, remove = every admissible file. Rewritten
    * files re-embed min/max stats for `statsFor` (default: `keyCol`
    * itself, so key-range skipping survives the rewrite).
    *
    * Time travel below the delete still serves the pre-delete rows until
    * [[vacuum]] reclaims the removed files — the GDPR proof is
    * delete + vacuum (spec-asserted: no remaining data file on disk
    * holds a deleted key). Returns None (and commits nothing) when no
    * live file can contain any key.
    *
    * `keys` is a driver-held set (the operation's real shape: a handful
    * of subject ids). Small sets filter with a literal `isin`; above
    * [[DeleteIsinMaxKeys]] the rewrite switches to a broadcast anti-join
    * (a 100k-literal In is an analyzer/codegen blow-up), so bulk
    * retractions are safe too. Null keys never match and are never
    * deleted.
    * Same concurrency contract as [[compact]]: races appends safely
    * (removal set re-derived at commit time), one writer per table for
    * destructive ops. `txnId` makes the delete EXACTLY-ONCE under
    * replays (the [[append]]/[[merge]] token contract) — None then also
    * means "this token already committed".
    */
  def delete(s: SparkSession, root: String, keyCol: String, keys: Seq[Long],
      statsFor: Option[Seq[String]] = None,
      txnId: Option[String] = None,
      bloomFor: Seq[String] = Seq.empty): Option[Long] = {
    import org.apache.spark.sql.functions.{broadcast, col, lit, not}
    if (keys.isEmpty) return None
    if (txnId.exists(t => log(s, root).exists(e => e.txnId.contains(t) || e.txns.contains(t))))
      return None // replay: skip the probe and the rewrite
    val entries = log(s, root)
    val live = liveFiles(s, root)
    val stats = statFold(entries, keyCol)
    // sorted distinct keys: the per-file admission probe is then one
    // binary search per file ("any key in [min, max]" = first key ≥ min
    // is ≤ max) instead of an O(files × keys) driver scan
    val sortedKeys = keys.distinct.sorted.toArray
    def admits(min: Long, max: Long): Boolean = {
      val i = java.util.Arrays.binarySearch(sortedKeys, min)
      val at = if (i >= 0) i else -i - 1
      at < sortedKeys.length && sortedKeys(at) <= max
    }
    val touched = live.filter { f =>
      stats.get(f).forall(st => admits(st.min, st.max))
    }
    if (touched.isEmpty) return None
    requireKeyType(requireUniformSchema(s, root, touched, "delete"), keyCol, "delete")
    val scan = s.read.parquet(touched.map(p => dataPath(root, p)): _*)
    val survivors =
      if (sortedKeys.length <= DeleteIsinMaxKeys)
        scan.filter(col(keyCol).isNull ||
          not(col(keyCol).isin(sortedKeys.map(lit).toSeq: _*)))
      else {
        // broadcast anti-join for bulk retractions: null target keys
        // never equal a key row, so they survive, matching the isin path
        val keyDf = s.createDataFrame(
          s.sparkContext.parallelize(sortedKeys.toSeq.map(Tuple1(_)), 1)
            .map(t => org.apache.spark.sql.Row(t._1)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__graft_del_key",
              org.apache.spark.sql.types.LongType, nullable = false))))
        scan.join(broadcast(keyDf),
          col(keyCol).cast("long") === col("__graft_del_key"), "left_anti")
      }
    commitDelete(s, root, touched, survivors,
      statsFor.getOrElse(Seq(keyCol)), txnId, bloomFor)
  }

  /** [[delete]] for STRING keys (the r19 string-key lift): file
    * admission rides the commit-embedded [[keyImage]] blooms
    * ([[probeFilesString]]) — a file without a bloom on `keyCol` is
    * rewritten (uncertainty forces the rewrite, never a missed delete),
    * and the survivor filter matches the ACTUAL string values, so a
    * bloom/hash false positive only costs a needless rewrite, never a
    * wrong row. Rewritten files re-embed a `keyCol` bloom by default so
    * probe pruning survives the rewrite (the long path's stats rule,
    * transposed to the hash domain). Everything else — isin/anti-join
    * switchover, txn token, empty-survivor drop — is the long path's
    * contract verbatim. */
  def deleteStrings(s: SparkSession, root: String, keyCol: String,
      keys: Seq[String], statsFor: Option[Seq[String]] = None,
      txnId: Option[String] = None,
      bloomFor: Seq[String] = Seq.empty): Option[Long] = {
    import org.apache.spark.sql.functions.{broadcast, col, lit, not}
    require(!keys.contains(null), s"deleteStrings at $root: null key (null never matches; drop it)")
    if (keys.isEmpty) return None
    if (txnId.exists(t => log(s, root).exists(e => e.txnId.contains(t) || e.txns.contains(t))))
      return None // replay: skip the probe and the rewrite
    val sortedKeys = keys.distinct.sorted.toArray
    val touched = probeFilesString(s, root, keyCol, sortedKeys.toSeq)
    if (touched.isEmpty) return None
    val isString = requireKeyType(
      requireUniformSchema(s, root, touched, "delete"), keyCol, "delete")
    require(isString,
      s"deleteStrings at $root: key column '$keyCol' is not a string — use delete(keys: Seq[Long])")
    val scan = s.read.parquet(touched.map(p => dataPath(root, p)): _*)
    val survivors =
      if (sortedKeys.length <= DeleteIsinMaxKeys)
        scan.filter(col(keyCol).isNull ||
          not(col(keyCol).isin(sortedKeys.map(lit).toSeq: _*)))
      else {
        val keyDf = s.createDataFrame(
          s.sparkContext.parallelize(sortedKeys.toSeq.map(Tuple1(_)), 1)
            .map(t => org.apache.spark.sql.Row(t._1)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__graft_del_key",
              org.apache.spark.sql.types.StringType, nullable = false))))
        scan.join(broadcast(keyDf),
          col(keyCol) === col("__graft_del_key"), "left_anti")
      }
    commitDelete(s, root, touched, survivors,
      statsFor.getOrElse(Seq.empty), txnId, (bloomFor :+ keyCol).distinct)
  }

  /** Keyed DELETE on a COMPOSITE conjunction (r19): removes exactly the
    * rows satisfying `c1 IN set1 AND c2 IN set2 AND …` — the SQL
    * `DELETE FROM t WHERE tenant = 'a' AND k IN (1, 2)` shape. File
    * admission INTERSECTS the per-component layers (integral components
    * by [min, max] stats with the sorted-key binary search, string
    * components by keyImage blooms; a component with no metadata admits
    * everything — superset-safe), and the survivor filter keeps every
    * row FAILING the conjunction, nulls included (a null component
    * never satisfies its equality, so null rows always survive — SQL
    * semantics). Key sets are literal-sized by contract (each ≤
    * [[DeleteIsinMaxKeys]], loud above — a composite delete is a
    * pinpoint op; corpus-scale retraction is the single-key bulk path
    * or a merge). Same txn-token/empty-survivor/commit contract as
    * [[delete]]. */
  def deleteComposite(s: SparkSession, root: String,
      components: Seq[(String, Either[Seq[Long], Seq[String]])],
      statsFor: Option[Seq[String]] = None,
      txnId: Option[String] = None,
      bloomFor: Seq[String] = Seq.empty): Option[Long] = {
    import org.apache.spark.sql.functions.{col, lit, not}
    require(components.nonEmpty &&
      components.map(_._1).distinct.size == components.size,
      s"deleteComposite needs distinct key columns, got ${components.map(_._1)}")
    if (components.exists(_._2.fold(_.isEmpty, _.isEmpty))) return None // empty set: no tuple matches
    components.foreach { case (c, ks) =>
      val n = ks.fold(_.size, _.size)
      require(n <= DeleteIsinMaxKeys,
        s"deleteComposite component '$c' carries $n keys (> $DeleteIsinMaxKeys) — " +
          "composite deletes are pinpoint ops; use the single-key bulk delete or a merge")
      ks.fold(_ => (), ss => require(!ss.contains(null),
        s"deleteComposite component '$c': null key (null never matches; drop it)"))
    }
    if (txnId.exists(t => log(s, root).exists(e => e.txnId.contains(t) || e.txns.contains(t))))
      return None // replay
    val entries = log(s, root)
    val live = liveFiles(s, root)
    var admitted: Set[String] = live.toSet
    components.foreach { case (c, ks) =>
      val a: Set[String] = ks match {
        case Left(longs) =>
          val sorted = longs.distinct.sorted.toArray
          val stats = statFold(entries, c)
          def admits(min: Long, max: Long): Boolean = {
            val i = java.util.Arrays.binarySearch(sorted, min)
            val at = if (i >= 0) i else -i - 1
            at < sorted.length && sorted(at) <= max
          }
          live.filter(f => stats.get(f).forall(st => admits(st.min, st.max))).toSet
        case Right(strs) => probeFilesString(s, root, c, strs.distinct).toSet
      }
      admitted = admitted.intersect(a)
    }
    val touched = live.filter(admitted)
    if (touched.isEmpty) return None
    components.foreach { case (c, ks) =>
      val isString = requireKeyType(
        requireUniformSchema(s, root, touched, "delete"), c, "delete")
      require(isString == ks.isRight,
        s"deleteComposite component '$c': key values are ${if (ks.isRight) "strings" else "longs"} " +
          s"but the column is ${if (isString) "string" else "integral"}")
    }
    val scan = s.read.parquet(touched.map(p => dataPath(root, p)): _*)
    val conj = components.map { case (c, ks) =>
      ks.fold(ls => col(c).isin(ls.distinct.map(lit): _*),
        ss => col(c).isin(ss.distinct.map(lit): _*))
    }.reduce(_ && _)
    val survivors = scan.filter(not(coalesce0(conj)))
    commitDelete(s, root, touched, survivors,
      statsFor.getOrElse(components.collect { case (c, Left(_)) => c }),
      txnId, (bloomFor ++ components.collect { case (c, Right(_)) => c }).distinct)
  }

  /** null-is-false for a delete predicate: a null component fails its
    * equality, so the row survives. */
  private def coalesce0(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.coalesce(c,
      org.apache.spark.sql.functions.lit(false))

  /** Every bloom column any commit has recorded — the compact rule
    * ("blooms survive compaction") extended to the delete/merge survivor
    * rewrites: a rewritten file must not silently LOSE the bloom columns
    * its predecessor carried, or a maintained table's probe pruning
    * decays one mutation at a time (r19 review finding: a composite
    * delete re-blooming only its own components stripped the tenant
    * bloom from survivors, and the next tenant-probe had to read them).
    * collectBlooms skips absent/wrong-typed columns silently, so the
    * union is always safe. */
  private def carriedBloomCols(s: SparkSession, root: String): Seq[String] =
    log(s, root).flatMap(_.blooms).map(_.column).distinct

  /** Shared delete tail: write survivors, drop empty part files, commit
    * one `delete` version removing every touched file (removal set
    * re-derived at commit time — the compact concurrency rule), reclaim
    * our data dirs on a lost token race. */
  private def commitDelete(s: SparkSession, root: String,
      touched: Seq[String], survivors: DataFrame, stCols: Seq[String],
      txnId: Option[String], bloomFor: Seq[String]): Option[Long] = {
    val (add, stats, blooms) = fileMeta(s, root, writeData(survivors, root),
      stCols, (bloomFor ++ carriedBloomCols(s, root)).distinct, dropEmpty = true)
    val committed = commitEntry(s, root, "delete", add, entries => {
      val liveNow = scala.collection.mutable.LinkedHashSet.empty[String]
      entries.foreach { c => c.remove.foreach(liveNow -= _); c.add.foreach(liveNow += _) }
      liveNow.toSeq.filter(touched.contains)
    }, txnId, stats,
      rewrite = add, // survivors only — no new rows for a CDC consumer
      blooms = blooms)
    if (committed.isEmpty && add.nonEmpty)
      add.map(_.takeWhile(_ != '/')).distinct.foreach(d =>
        fs(s, root).delete(new Path(s"$root/$d"), true))
    committed
  }

  /** Keyed MERGE (upsert) THROUGH the format — q109's latest-wins
    * semantics as a delta-sized commit: every target row whose `keyCol`
    * appears in `updates` is replaced by the update row; keys absent
    * from the target are inserted. File pruning is two-stage, the
    * Delta-style touched-file scan:
    *
    *  1. STATS: live files whose [min, max] on `keyCol` cannot intersect
    *     the updates' key range are untouched without being read.
    *  2. EXACT PROBE: the stats-admitted candidates are scanned once
    *     (keyCol + input_file_name only — column-pruned) and semi-joined
    *     against the distinct update keys; only files that actually HOLD
    *     an updated key are rewritten. The probe's driver result is
    *     O(touched files), never rows.
    *
    * One commit: add = rewritten touched files (old rows of updated keys
    * anti-joined away) + the update rows themselves; remove = the
    * touched files. Untouched files keep their identity — spec-pinned.
    * `updates` must carry the table's exact column set (loudly rejected
    * otherwise; use [[snapshotEvolved]]-style migration first for schema
    * change) and one row per key (q109's upstream latest-per-key fold is
    * the caller's job — duplicate update keys land as duplicate rows).
    * An empty table merges as a plain insert. Same concurrency contract
    * as [[compact]]. `txnId` makes the merge EXACTLY-ONCE under replays
    * (the [[append]] token contract: a replayed token no-ops before any
    * data write via the cheap pre-check, and a token race lost after the
    * writes reclaims its own data dirs); returns None only on a token
    * replay.
    */
  def merge(updates: DataFrame, root: String, keyCol: String,
      statsFor: Option[Seq[String]] = None,
      txnId: Option[String] = None,
      bloomFor: Seq[String] = Seq.empty): Option[Long] =
    mergeKeys(updates, root, Seq(keyCol), statsFor, txnId, bloomFor)

  /** [[merge]] on a COMPOSITE key (r19 — real CDC keys are often
    * (tenant, doc_id)-shaped): every target row whose key TUPLE appears
    * in `updates` is replaced; tuples absent from the target insert.
    * SQL null semantics: a row with ANY null component never matches
    * (the join's null-unsafe equality on every column), so any-null
    * update rows land as pure inserts and any-null target rows always
    * survive. Stage-1 pruning INTERSECTS the per-component admissions
    * (integral components by [min, max] stats, string components by
    * keyImage blooms over a bounded distinct collect) — a file must
    * admit SOME value of EVERY component to stay a candidate, which is
    * superset-safe because the true matching tuples' components are
    * each individually present; the stage-2 exact probe and the
    * rewrite anti-join match on the full tuple. Mixed integral/string
    * components are fine — each prunes in its own domain. */
  def mergeComposite(updates: DataFrame, root: String, keyCols: Seq[String],
      statsFor: Option[Seq[String]] = None,
      txnId: Option[String] = None,
      bloomFor: Seq[String] = Seq.empty): Option[Long] = {
    require(keyCols.nonEmpty && keyCols.distinct.size == keyCols.size,
      s"mergeComposite needs distinct key columns, got $keyCols")
    mergeKeys(updates, root, keyCols, statsFor, txnId, bloomFor)
  }

  private def mergeKeys(updates: DataFrame, root: String, keyCols: Seq[String],
      statsFor: Option[Seq[String]],
      txnId: Option[String],
      bloomFor: Seq[String]): Option[Long] = {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    val s = updates.sparkSession
    if (txnId.exists(t => log(s, root).exists(e => e.txnId.contains(t) || e.txns.contains(t))))
      return None // replay: skip the probe and every data write
    // a STRING key component (r19) prunes through blooms, never long
    // stats — so its merges always BLOOM it (the long path's "always
    // stats its key column" rule, transposed), else every later
    // probe/merge on the table would read every file forever
    val stringOf: Map[String, Boolean] =
      keyCols.map(c => c -> requireKeyType(updates.schema, c, "merge")).toMap
    val stCols = statsFor.getOrElse(keyCols.filterNot(stringOf))
    // key-component blooms + every bloom column the table already
    // carries ([[carriedBloomCols]] — survivor rewrites and the inserts
    // beside them must not decay a maintained table's probe pruning)
    val blCols = (bloomFor ++ keyCols.filter(stringOf) ++
      carriedBloomCols(s, root)).distinct
    /** Commit helper: reclaims OUR data dirs if the token race is lost
      * after the writes (append's cleanup, for the multi-dir case). */
    def commit(add: Seq[String], removeAtHead: Seq[Commit] => Seq[String],
        rewrite: Seq[String] = Seq.empty, stats: Seq[FileStat] = Seq.empty,
        blooms: Seq[FileBloom] = Seq.empty): Option[Long] = {
      val committed = commitEntry(s, root, "merge", add, removeAtHead, txnId,
        stats, rewrite, blooms = blooms)
      if (committed.isEmpty && add.nonEmpty)
        add.map(_.takeWhile(_ != '/')).distinct.foreach(d =>
          fs(s, root).delete(new Path(s"$root/$d"), true))
      committed
    }
    /** Pure-insert commit: meta in the same ONE scan as the mutation path. */
    def commitInsert(written: Seq[String]): Option[Long] = {
      val (a, st, bl) = fileMeta(s, root, written, stCols, blCols, dropEmpty = false)
      commit(a, _ => Seq.empty, stats = st, blooms = bl)
    }
    val live = liveFiles(s, root)
    if (live.isEmpty) {
      return commitInsert(writeData(updates, root))
    }
    // guard the WHOLE live set, not just the probe candidates: tableCols
    // below anchors both the rewrite and the insert projection, so a
    // mixed table with uniform candidates would still silently drop the
    // other group's columns from the rewritten rows
    val tableSchema = requireUniformSchema(s, root, live, "merge")
    val tableCols = tableSchema.fieldNames
    // NAME AND TYPE: a name-only check would let an int-typed update
    // frame land next to long files and wedge the table into the very
    // mixed-schema state the guard exists to prevent (review finding)
    val tableTypes = tableSchema.fields.map(f => f.name -> f.dataType).sortBy(_._1).toSeq
    val updateTypes = updates.schema.fields.map(f => f.name -> f.dataType).sortBy(_._1).toSeq
    require(updateTypes == tableTypes,
      s"merge updates schema ${updateTypes.map(t => s"${t._1}:${t._2.sql}").mkString("[", ",", "]")} does not " +
        s"match table schema ${tableTypes.map(t => s"${t._1}:${t._2.sql}").mkString("[", ",", "]")} at $root — " +
        "evolve the table first, then merge")
    keyCols.foreach(c => requireKeyType(tableSchema, c, "merge"): Unit)
    // STAGE-1 file pruning, INTERSECTED across key components. Integral
    // component: the updates' [lo, hi] range against each file's
    // commit-embedded stats — two driver values collected, never keys.
    // String component: the distinct update keys (BOUNDED:
    // `graft.commitlog.maxProbeKeys`, default 100k — above it that
    // component admits every file and stage 2's exact probe alone
    // bounds the rewrites, the superset-safe fallback) against each
    // file's keyImage bloom.
    val cap = s.conf.getOption("graft.commitlog.maxProbeKeys")
      .map(_.toInt).getOrElse(100000)
    var candidateSet: Set[String] = live.toSet
    keyCols.foreach { kc =>
      val admitted: Option[Set[String]] =
        if (!stringOf(kc)) {
          val keyRange = updates.agg(
            min(col(kc).cast("long")), max(col(kc).cast("long"))).collect().head
          if (keyRange.isNullAt(0)) // this component is all-null: no
            return commitInsert(writeData(updates, root)) // tuple can match
          val (lo, hi) = (keyRange.getLong(0), keyRange.getLong(1))
          val stats = statFold(log(s, root), kc)
          Some(live.filter { f =>
            stats.get(f).forall(st => st.max >= lo && st.min <= hi)
          }.toSet)
        } else {
          val ks = updates.select(col(kc)).filter(col(kc).isNotNull)
            .distinct().limit(cap + 1).collect().map(_.getString(0))
          if (ks.isEmpty) // this component is all-null: no tuple can match
            return commitInsert(writeData(updates, root))
          if (ks.length > cap) None // over cap: this component prunes nothing
          else Some(probeFilesString(s, root, kc, ks.toSeq).toSet)
        }
      admitted.foreach(a => candidateSet = candidateSet.intersect(a))
    }
    val candidates: Seq[String] = live.filter(candidateSet)
    val keyColsC = keyCols.map(col)
    val updKeys = updates.select(keyColsC: _*).na.drop("any", keyCols).distinct()
    // exact probe: which candidate files actually hold an updated key
    // tuple — file NAMES to the driver, never rows (part-file names are
    // job-UUID-unique, the fileMeta mapping rule)
    val byName = candidates.map(p => p.split('/').last -> p).toMap
    val touched =
      if (candidates.isEmpty) Seq.empty[String]
      else s.read.parquet(candidates.map(p => dataPath(root, p)): _*)
        .select(keyColsC :+ input_file_name().as("f"): _*)
        .join(updKeys, keyCols, "left_semi")
        .select(col("f")).distinct()
        .collect().toSeq.flatMap(r => byName.get(r.getString(0).split('/').last))
    if (touched.isEmpty) return commitInsert(writeData(updates, root))
    val rewritten = s.read.parquet(touched.map(p => dataPath(root, p)): _*)
      .join(updKeys, keyCols, "left_anti")
      .select(tableCols.map(col): _*)
    // one metadata scan per written dir (survivors, inserts) — count,
    // stats and blooms together, empty survivors dropped
    val (rw, st1, bl1) = fileMeta(s, root, writeData(rewritten, root),
      stCols, blCols, dropEmpty = true)
    val (ins, st2, bl2) = fileMeta(s, root,
      writeData(updates.select(tableCols.map(col): _*), root),
      stCols, blCols, dropEmpty = true)
    commit(rw ++ ins, entries => {
      val liveNow = scala.collection.mutable.LinkedHashSet.empty[String]
      entries.foreach { c => c.remove.foreach(liveNow -= _); c.add.foreach(liveNow += _) }
      liveNow.toSeq.filter(touched.contains)
    }, rw, st1 ++ st2, bl1 ++ bl2)
  }

  /** RESTORE the table to an earlier version AS A NEW COMMIT — the
    * write-side half of time travel (asOf is the read-side half): the
    * commit's add/remove lists are exactly the file-set diff between the
    * target version and head, so the operation is metadata-only (no data
    * is copied or rewritten) and every intermediate version stays
    * readable. Fails LOUDLY if any file of the target version was
    * already vacuumed (a metadata restore cannot resurrect reclaimed
    * bytes — re-ingest or restore a retained version instead). Restoring
    * the current state is a no-op (returns the head version, commits
    * nothing). Re-added files count as data change for [[changesSince]]
    * consumers (their rows left the table and are coming back — a
    * consumer that processed them before the removal replays them, the
    * standard at-least-once restore trade in the public formats).
    * Destructive-op concurrency contract (the overwrite/compact rule):
    * one writer per table — a racing append's files are summarily
    * removed by the restore, which is the operation's meaning.
    */
  def restore(s: SparkSession, root: String, toVersion: Long): Long = {
    val target = liveFiles(s, root, asOf = toVersion)
    require(target.nonEmpty,
      s"nothing to restore at $root: version $toVersion has no live files")
    val head = liveFiles(s, root).toSet
    val add = target.filterNot(head)
    val remove = head.filterNot(target.toSet).toSeq
    if (add.isEmpty && remove.isEmpty)
      return headVersion(s, root) // already in the target state
    val f = fs(s, root)
    val missing = add.filterNot(p => f.exists(new Path(dataPath(root, p))))
    require(missing.isEmpty,
      s"restore to version $toVersion at $root needs vacuumed files " +
        s"${missing.take(3).mkString(", ")}${if (missing.size > 3) ", …" else ""} — " +
        "a metadata restore cannot resurrect reclaimed bytes")
    // stats for re-added files: the latest recorded stat per (file, col)
    // as of the TARGET version still describes those immutable files
    val stats = log(s, root, asOf = toVersion).flatMap(_.stats)
      .groupBy(st => (st.file, st.column)).map(_._2.last).toSeq
      .filter(st => add.contains(st.file))
      .sortBy(st => (st.file, st.column))
    commitEntry(s, root, "restore", add, entries => {
      val liveNow = scala.collection.mutable.LinkedHashSet.empty[String]
      entries.foreach { c => c.remove.foreach(liveNow -= _); c.add.foreach(liveNow += _) }
      liveNow.toSeq.filterNot(target.toSet) // re-derived at commit time
    }, None, stats).get
  }

  // ---------- reader-side schema evolution ----------

  /** Numeric widenings the evolved reader upcasts silently; anything
    * else across versions is an incompatible change and rejected loudly
    * — silent coercion (string→long, narrowing, decimal reshape) is how
    * a 100 TB table corrupts quietly. */
  private[graft] def widen(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    (a, b) match {
      case _ if a == b => Some(a)
      case (IntegerType, LongType) | (LongType, IntegerType) => Some(LongType)
      case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
      case _ => None
    }
  }

  /** Read a set of live files with the evolved-schema fold applied when
    * their per-dir schemas diverge (null-fill adds, numeric widening,
    * loud incompatible reject) — the shared reader behind
    * [[snapshotEvolved]] and the stats-skipping scans, so a range/box
    * scan over an evolved table never silently takes one group's schema
    * and drops the other's columns. Single-schema sets (the common
    * case) read in one plain parquet scan.
    */
  /** Also the read half of the SQL `changes` metadata table (the batch
    * CDC feed reads exactly the files its pruned versions added). */
  private[graft] def readChangedFiles(s: SparkSession, root: String,
      files: Seq[String]): DataFrame = readFilesEvolved(s, root, files)

  private def readFilesEvolved(s: SparkSession, root: String,
      files: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val groups = files.groupBy(dirKey).toSeq.sortBy(_._1)
    val frames = groups.map { case (_, fs) => s.read.parquet(fs.map(p => dataPath(root, p)): _*) }
    if (frames.map(_.schema).distinct.size == 1)
      return s.read.parquet(files.map(p => dataPath(root, p)): _*)
    // a RENAME is not a readable evolution: it shows up as two groups
    // with INCOMPARABLE column sets (one misses the old name, the other
    // the new), and the null-fill fold below would silently produce two
    // half-null columns. SEQUENTIAL additions always leave the groups'
    // column sets totally ordered by ⊆, so reject any incomparable pair
    // loudly, naming both sides' unique columns. A rename is structurally
    // indistinguishable from DIVERGENT independent additions (two writers
    // each adding a different column — also incomparable sets), so a
    // caller who intends the latter opts back into the union-null-fill
    // read with `graft.commitlog.allowDivergentColumns=true`; the default
    // stays loud because a silent half-null rename corrupts 100 TB
    // quietly while the divergent-writer pattern is rare and deliberate.
    val allowDivergent = s.conf
      .getOption("graft.commitlog.allowDivergentColumns").contains("true")
    val unified = unifiedSchemaOf(frames.map(_.schema), root, allowDivergent)
    frames.map { df =>
      val have = df.columns.toSet
      df.select(unified.fields.toSeq.map { f =>
        (if (have(f.name)) col(f.name).cast(f.dataType)
         else lit(null).cast(f.dataType)).as(f.name)
      }: _*)
    }.reduce(_ union _)
  }

  /** The widening fold over per-group footer schemas — the ONE definition
    * of what "readable schema evolution" means, shared by
    * [[readFilesEvolved]] (the API read) and [[evolvedSchema]] (the SQL
    * catalog's analysis-time schema): first-seen column order, later
    * additions append, int→long / float→double widen, anything else (or
    * incomparable column sets = a rename/drop+add) throws loudly. */
  private[graft] def unifiedSchemaOf(
      schemas: Seq[org.apache.spark.sql.types.StructType], root: String,
      allowDivergent: Boolean): org.apache.spark.sql.types.StructType = {
    if (!allowDivergent) {
      val colSets = schemas.map(_.fieldNames.toSet)
      for (i <- colSets.indices; j <- (i + 1) until colSets.size) {
        val (a, b) = (colSets(i), colSets(j))
        if (!a.subsetOf(b) && !b.subsetOf(a))
          throw new IllegalArgumentException(
            s"incompatible schema evolution at $root: file groups have " +
              s"incomparable column sets (only in one: ${(a -- b).toSeq.sorted.mkString(", ")}; " +
              s"only in the other: ${(b -- a).toSeq.sorted.mkString(", ")}) — " +
              "a rename/drop+add null-fills both halves and is rejected; " +
              "evolve by addition (add the new column, backfill, then stop " +
              "writing the old). If these really are independent ADDED " +
              "columns from divergent writers, set " +
              "graft.commitlog.allowDivergentColumns=true to read the " +
              "null-filled union")
      }
    }
    val unified = scala.collection.mutable.LinkedHashMap
      .empty[String, org.apache.spark.sql.types.DataType]
    schemas.foreach(_.fields.foreach { f =>
      unified.get(f.name) match {
        case None => unified(f.name) = f.dataType
        case Some(t) => unified(f.name) = widen(t, f.dataType).getOrElse(
          throw new IllegalArgumentException(
            s"incompatible schema evolution on column '${f.name}' at $root: " +
              s"$t vs ${f.dataType} — only additions and int→long / " +
              "float→double widenings are readable across versions"))
      }
    })
    org.apache.spark.sql.types.StructType(
      unified.toSeq.map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n, t, nullable = true) })
  }

  /** The [[snapshotEvolved]] read schema for a file set WITHOUT building
    * the frame — what a SQL catalog needs at analysis time. Footer reads
    * are memoized per immutable data dir ([[dirSchemaCache]]), so the
    * steady-state cost is O(new dirs), not O(dirs) per query. */
  private[graft] def evolvedSchema(s: SparkSession, root: String,
      files: Seq[String]): org.apache.spark.sql.types.StructType = {
    val schemas = files.groupBy(dirKey).toSeq.sortBy(_._1)
      .map { case (d, fs) =>
        dirSchemaCache.getOrElseUpdate((root, d))(
          s.read.parquet(fs.map(p => dataPath(root, p)): _*).schema)
      }
    // the single-schema fast path normalizes to nullable=true exactly like
    // the multi-schema unification fold — otherwise a table's SQL-visible
    // nullability would FLIP from the footer's the first time a second
    // schema group appears (catalog-reported schemas must be stable
    // across the evolution boundary; review finding r17)
    if (schemas.distinct.size == 1)
      org.apache.spark.sql.types.StructType(schemas.head.fields.map(f =>
        org.apache.spark.sql.types.StructField(f.name, f.dataType, nullable = true)))
    else unifiedSchemaOf(schemas, root, s.conf
      .getOption("graft.commitlog.allowDivergentColumns").contains("true"))
  }

  /** Snapshot read ACROSS schema versions — the contract a long-lived
    * table needs in month one: after a column is ADDED, old files
    * null-fill it; after a numeric type is WIDENED (int→long,
    * float→double), old files upcast; any other cross-version change
    * (renames, narrowings, type swaps) throws with the offending column
    * and both types. asOf semantics are unchanged — a pre-change version
    * resolves only its own files and therefore reads with its own (old)
    * schema.
    *
    * Mechanics: live files group by data directory (one d-<uuid> dir =
    * one write = one schema), each group contributes its footer schema,
    * and the unified schema is the per-column widening fold in
    * first-seen column order (later additions append). When every group
    * already agrees — the overwhelmingly common case — this is exactly
    * [[snapshot]] plus O(dirs) driver-side footer reads; executors never
    * do per-row work beyond the upcast projection. Plain [[snapshot]]
    * remains the fast path for tables that never evolved ([[merge]]
    * rejects mixed schemas, so only append-evolved tables need this
    * reader).
    */
  def snapshotEvolved(s: SparkSession, root: String,
      asOf: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val files = liveFiles(s, root, asOf)
    require(files.nonEmpty, s"commit-log table at $root has no live files (asOf=$asOf)")
    readFilesEvolved(s, root, files)
  }

  /** Reclaim data files no RETAINED version still needs. With the
    * default `retainLast = 0` that is every file REMOVED by some commit
    * (time travel below head stops working for them — vacuum's
    * documented trade everywhere); `retainLast = n` additionally
    * protects every file live at any of the last n versions before
    * head, so `snapshot(asOf ≥ head − n)` keeps working after the
    * reclaim — the retention window that lets slow readers and lagging
    * [[changesSince]] cursors drain before their files disappear (the
    * standard CDC-retention pairing). The horizon clamps at the OLDEST
    * entry the folded log resolves (the newest checkpoint's version,
    * when one exists): protection below the fold's base would need the
    * per-version states the checkpoint deliberately collapsed.
    * Unreferenced crash litter (data dirs no commit ever referenced) is
    * NOT touched: a concurrent writer may be about to commit it.
    * Returns the deleted relative paths. */
  /** SHALLOW CLONE — the zero-copy table fork (the public formats'
    * `CREATE TABLE ... SHALLOW CLONE`): `dstRoot` becomes an independent
    * commit-log table whose version-1 entry REFERENCES the source
    * snapshot's live files by ABSOLUTE path — no data bytes move, a
    * 100 TB table forks in one metadata commit. Writes to either table
    * never touch the other: every writer here produces root-local
    * files, so the clone's appends/deletes/merges/compactions land in
    * its own root and only ever REMOVE the foreign references (a
    * delete/merge rewrite copies the touched foreign files' survivors
    * clone-local — copy-on-write at file granularity). Carried
    * stats keep data skipping and delete/merge file pruning working on
    * the clone unchanged; `asOf` clones any time-travel version.
    *
    * Ownership rule (also the public formats'): cloned-in files belong
    * to the SOURCE — the clone's [[vacuum]] skips absolute paths, and a
    * SOURCE-side vacuum that reclaims files past the cloned version is
    * the one operation that can break a clone. Retention must be
    * coordinated across clones, exactly as Delta documents.
    */
  def cloneShallow(s: SparkSession, srcRoot: String, dstRoot: String,
      asOf: Long = Long.MaxValue): Long = {
    require(log(s, dstRoot).isEmpty,
      s"cloneShallow target $dstRoot must be an empty table")
    // Foreign references are recorded scheme-less (`/...`) and resolve
    // against the DEFAULT FileSystem at read time (dataPath's convention),
    // so a clone is only sound when the source lives ON the default FS —
    // a clone of an hdfs://-rooted table into a local table would record
    // references that silently resolve against the wrong filesystem
    // (r16 advice). Loud, not silent:
    val defaultFs = FileSystem.get(s.sparkContext.hadoopConfiguration).getUri
    val srcFs = fs(s, srcRoot).getUri
    require(srcFs == defaultFs,
      s"cloneShallow source $srcRoot lives on $srcFs, not the default " +
        s"filesystem $defaultFs — foreign references are recorded " +
        "scheme-less and would resolve against the wrong FS; clone " +
        "within one filesystem, or copy the data")
    val absRoot = fs(s, srcRoot).makeQualified(new Path(srcRoot)).toUri.getPath
    val live = liveFiles(s, srcRoot, asOf)
    require(live.nonEmpty,
      s"commit-log table at $srcRoot has no live files (asOf=$asOf)")
    // a clone of a clone keeps already-absolute references as-is
    val relToAbs = live.map(p =>
      p -> (if (p.startsWith("/")) p else s"$absRoot/$p")).toMap
    val stats = log(s, srcRoot, asOf).flatMap(_.stats)
      .groupBy(st => (st.file, st.column)).map(_._2.last).toSeq
      .filter(st => relToAbs.contains(st.file))
      .map(st => st.copy(file = relToAbs(st.file)))
      .sortBy(st => (st.file, st.column))
    commitEntry(s, dstRoot, "clone", live.map(relToAbs), _ => Seq.empty,
      None, stats).get
  }

  /** Table PROPERTIES — the small durable config a table carries beside
    * its log (`_graft_log/properties.json`): cluster keys
    * (`clusterBy`), default stats columns (`statsColumns`). Properties
    * are maintenance CONFIG, not versioned state: last write wins, they
    * ride no commit, and readers never depend on them for correctness
    * (a lost properties file costs layout quality, never rows). The
    * file name carries no version number so every log walk
    * ([[log]]/[[history]]/[[changedFilesByVersion]]) skips it via its
    * existing numeric-name parse. Encoded as parallel keys/vals arrays
    * so [[dec]]'s quote-aware array scanner reads it back. */
  def setProperties(s: SparkSession, root: String,
      props: Map[String, String]): Unit =
    rootLocks.computeIfAbsent(root, _ => new Object).synchronized {
      val f = fs(s, root)
      f.mkdirs(new Path(s"$root/$LogDir"))
      // an empty value REMOVES the key (ALTER TABLE UNSET's route in)
      val merged = (properties(s, root) ++ props).filter(_._2.nonEmpty)
      def arr(xs: Seq[String]) = xs.map(x =>
        "\"" + GraftSession.jsonEscape(x) + "\"").mkString("[", ",", "]")
      val ks = merged.keys.toSeq.sorted
      val body = s"""{"keys":${arr(ks)},"vals":${arr(ks.map(merged))}}"""
      val target = new Path(s"$root/$LogDir/properties.json")
      val staged = new Path(s"$root/$LogDir/.staging-props-${java.util.UUID.randomUUID()}.json")
      val out = f.create(staged, false)
      try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (f.exists(target)) f.delete(target, false)
      require(f.rename(staged, target), s"properties write at $root failed")
    }

  def properties(s: SparkSession, root: String): Map[String, String] = {
    val f = fs(s, root)
    val p = new Path(s"$root/$LogDir/properties.json")
    if (!f.exists(p)) return Map.empty
    val in = f.open(p)
    val body = try {
      val len = f.getFileStatus(p).getLen.toInt
      val b = new Array[Byte](len)
      in.readFully(0, b)
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    dec0(body)
  }

  /** keys/vals arrays → map, via the same quote-aware scan as [[dec]]. */
  private def dec0(json: String): Map[String, String] = {
    def field(name: String): Seq[String] = {
      val i = json.indexOf(s""""$name":[""")
      if (i < 0) return Seq.empty
      var j = json.indexOf('[', i) + 1
      val out = Seq.newBuilder[String]
      var done = false
      while (!done && j < json.length) {
        json.charAt(j) match {
          case ']' => done = true
          case '"' =>
            val sb = new java.lang.StringBuilder
            j += 1
            var inStr = true
            while (inStr && j < json.length) {
              json.charAt(j) match {
                case '\\' if j + 1 < json.length => j = unescapeAt(json, j, sb)
                case '"' => inStr = false; j += 1
                case ch => sb.append(ch); j += 1
              }
            }
            out += sb.toString
          case _ => j += 1
        }
      }
      out.result()
    }
    field("keys").zip(field("vals")).toMap
  }

  def vacuum(s: SparkSession, root: String, retainLast: Int = 0): Seq[String] = {
    val entries = log(s, root)
    if (entries.isEmpty) return Seq.empty
    val horizon = math.max(entries.last.version - math.max(retainLast, 0),
      entries.head.version)
    val protectedFiles = scala.collection.mutable.HashSet.empty[String]
    val fold = scala.collection.mutable.LinkedHashSet.empty[String]
    entries.foreach { c =>
      c.remove.foreach(fold -= _)
      c.add.foreach(fold += _)
      if (c.version >= horizon) protectedFiles ++= fold
    }
    // union of adds and removes: after a checkpoint, pre-checkpoint
    // corpses survive only in the checkpoint's cumulative remove list
    // cloned-in ABSOLUTE paths belong to the SOURCE table (the public
    // formats' shallow-clone ownership rule) — never ours to reclaim
    val everAdded = (entries.flatMap(_.add) ++ entries.flatMap(_.remove))
      .distinct.filterNot(_.startsWith("/"))
    val f = fs(s, root)
    // existence filter: a re-run must not re-report corpses an earlier
    // vacuum already reclaimed — the return is "deleted paths", honestly
    val dead = everAdded.filterNot(protectedFiles)
      .filter(p => f.exists(new Path(s"$root/$p")))
    dead.foreach(p => f.delete(new Path(s"$root/$p"), false))
    // drop now-empty data dirs (cosmetic; readers never list dirs)
    dead.map(_.takeWhile(_ != '/')).distinct.foreach { d =>
      val dir = new Path(s"$root/$d")
      if (f.exists(dir) && f.listStatus(dir).isEmpty) f.delete(dir, true)
    }
    dead
  }
}
