package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.CommitLog

/** `graft-changefeed` — a [[graft.CommitLog]] table AS A STREAM: the
  * read-side completion of the format's streaming story (s22/s23/s24
  * write through it; this reads the change feed continuously). Offsets
  * ARE commit versions, so the streaming engine's offset log and the
  * table's transaction log advance in lockstep: micro-batch n covers
  * exactly the table versions `(startOffset, endOffset]`, and the batch
  * contains precisely [[graft.CommitLog.changesSince]]'s rows for that
  * window — appends, overwrite content, merge UPDATE rows; never
  * compaction/checkpoint re-adds, never dataChange=false survivor
  * rewrites (a delete feeds a consumer NOTHING — retraction propagation
  * is the snapshot-diff/vacuum pairing, not the feed).
  *
  * Exactly-once downstream composes the usual way: the engine replays a
  * batch with the SAME (start, end] version window after a crash (the
  * offsets live in its checkpoint), and the window's file set is
  * deterministic — pair with a txn-token sink (s22's contract) for
  * end-to-end exactly-once. Retention: a restart whose checkpointed
  * offset predates a vacuum may reference reclaimed files and fails
  * LOUDLY on read (the standard CDC retention trade — `retainLast` your
  * vacuum no shallower than your slowest stream).
  *
  * Options: `path` (table root, required); `startingVersion` (default 0
  * = everything ever committed; set to `headVersion` at deploy time for
  * new-changes-only); `maxVersionsPerBatch` / `maxFilesPerBatch`
  * (backfill admission control — without them a stream started with
  * months of history puts the ENTIRE `(startingVersion, head]` window in
  * one giant first micro-batch; with them the offset advances in bounded
  * steps, each micro-batch ≤ maxVersionsPerBatch commit versions and,
  * version-greedily, ≤ maxFilesPerBatch files. A single version is the
  * atomic unit: one version whose commit alone exceeds maxFilesPerBatch
  * still lands whole — versions are never split, so replay stays
  * exactly-once). Schema: pinned to the current snapshot's at query
  * start (a stream cannot widen its schema mid-flight); an
  * empty-but-existing table pins from the newest committed file's
  * footer, or from an explicit `.schema(...)` when no data was ever
  * committed — the stream then starts idle and wakes on the first
  * commit. Batches spanning a table evolution ALIGN to the pin — widened
  * columns upcast, columns added after the pin are dropped until a
  * restart re-pins, pre-evolution files null-fill; any OTHER divergence
  * from the pin (type swap, a pinned column now wider than the pin)
  * fails the stream loudly, matching the batch evolved-reader's
  * contract — a silent cast would null or narrow 100 TB of CDC quietly.
  *
  * V1 `Source` deliberately: `getBatch` can hand the engine a plain
  * parquet scan over the window's files — the whole source is ~60 lines
  * of offset bookkeeping around [[graft.CommitLog.changedFiles]], and
  * executors read parquet through the same vectorized path as any batch
  * query (a DSv2 MicroBatchStream would need a hand-rolled per-file
  * PartitionReader for no gain).
  */
class ChangeFeedSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changefeed"

  private def root(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-changefeed requires option 'path'"))

  /** Schema pin at stream start: the live snapshot's when the table has
    * data; otherwise the newest committed file's footer among files that
    * STILL EXIST on disk — a fully-drained table is a legitimate stream
    * start (it idles until the next commit), and a drained-then-vacuumed
    * one must fall through to the actionable error below, not a raw
    * FileNotFoundException from a reclaimed path (review finding). Only
    * a table with no readable committed file needs an explicit schema. */
  private def pinSchema(sqlContext: SQLContext,
      parameters: Map[String, String]): StructType = {
    val spark = sqlContext.sparkSession
    val tableRoot = root(parameters)
    val fs = new org.apache.hadoop.fs.Path(tableRoot)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val live = CommitLog.liveFiles(spark, tableRoot)
    val candidates =
      if (live.nonEmpty) live.reverse
      else CommitLog.log(spark, tableRoot).flatMap(_.add).reverse
    candidates.find(p =>
        fs.exists(new org.apache.hadoop.fs.Path(s"$tableRoot/$p"))) match {
      case Some(f) => spark.read.parquet(s"$tableRoot/$f").schema
      case None => throw new IllegalArgumentException(
        s"graft-changefeed: table at $tableRoot has no readable committed " +
          "data file to pin a schema from (never written, or drained and " +
          "vacuumed) — pass an explicit .schema(...) to start the stream")
    }
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(pinSchema(sqlContext, parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val tableRoot = root(parameters)
    val starting = parameters.get("startingVersion").map(_.toLong).getOrElse(0L)
    def bound(name: String): Long = parameters.get(name).map(_.toLong) match {
      case Some(n) if n < 1 => throw new IllegalArgumentException(
        s"graft-changefeed: $name must be >= 1, got $n")
      case other => other.getOrElse(Long.MaxValue)
    }
    val resolved = schema.getOrElse(pinSchema(sqlContext, parameters))
    new ChangeFeedStreamSource(sqlContext, tableRoot, starting, resolved,
      bound("maxVersionsPerBatch"), bound("maxFilesPerBatch"), metadataPath)
  }
}

private[sources] class ChangeFeedStreamSource(sqlContext: SQLContext,
    root: String, startingVersion: Long, override val schema: StructType,
    maxVersionsPerBatch: Long, maxFilesPerBatch: Long, metadataPath: String)
    extends Source {

  private val spark = sqlContext.sparkSession

  private val metaFs = new org.apache.hadoop.fs.Path(metadataPath)
    .getFileSystem(spark.sessionState.newHadoopConf())
  private val cursorPath = new org.apache.hadoop.fs.Path(metadataPath, "graft-cursor")

  /** Newest version already handed to the engine through [[getBatch]]
    * (admission control's base), PERSISTED into the source's metadata
    * directory inside the stream checkpoint. Without persistence a
    * restart whose offset log was fully committed would reset the base
    * to startingVersion, and the engine's first post-restart call is
    * getOffset (never getBatch) — the stale bounded offset would then
    * REGRESS the engine's committed offset and replay already-delivered
    * versions (review finding: `committedOffsets ++= availableOffsets`
    * is an unconditional merge, so the engine happily commits backward).
    * The cursor file travels and dies with the checkpoint, exactly like
    * the offsets it protects. Staged-write + rename; a crash between
    * delete and rename falls back to the in-log offsets on restart (one
    * conservative re-bound, never data loss). */
  @volatile private var cursor: Long = {
    val persisted =
      if (metaFs.exists(cursorPath)) {
        val len = metaFs.getFileStatus(cursorPath).getLen.toInt
        val b = new Array[Byte](len)
        val in = metaFs.open(cursorPath)
        try in.readFully(0, b) finally in.close()
        new String(b, java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      } else startingVersion
    math.max(startingVersion, persisted)
  }

  private def persistCursor(v: Long): Unit = {
    val staged = new org.apache.hadoop.fs.Path(metadataPath,
      s".graft-cursor-${java.util.UUID.randomUUID()}")
    val out = metaFs.create(staged, true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    metaFs.delete(cursorPath, false) // HDFS rename won't replace
    if (!metaFs.rename(staged, cursorPath)) metaFs.delete(staged, false)
  }

  /** Available offset = head, admission-bounded: walk versions past the
    * cursor, version-greedy, until either bound trips; always admit at
    * least one version (the atomic unit — a version never splits across
    * batches, so checkpointed replay windows stay deterministic). A
    * missing log directory reads as head 0 (headVersion's own contract)
    * — but IO failures and corrupt log entries PROPAGATE and fail the
    * query loudly; a catch-all here would turn log corruption into a
    * silently idle "healthy" stream (review finding). */
  override def getOffset: Option[Offset] = {
    val base = math.max(cursor, startingVersion)
    val head = CommitLog.headVersion(spark, root)
    if (head <= base) return None
    if (maxVersionsPerBatch == Long.MaxValue && maxFilesPerBatch == Long.MaxValue)
      return Some(LongOffset(head))
    val hi = if (head - base > maxVersionsPerBatch) base + maxVersionsPerBatch else head
    // the walk is an ITERATOR over lazily-read commit entries: stopping
    // at the first non-fitting version also stops READING entries — a
    // files-only bound over a deep backfill would otherwise read every
    // commit file in (base, head] per trigger, O(history²) driver JSON
    // parses across the backfill (review finding). Stopping at the first
    // non-fitting version (never skipping past it) also keeps offsets
    // contiguous — admitting a later, smaller version would silently
    // drag the skipped version's files into the window.
    val (byVersion, _) = CommitLog.changedFilesByVersion(spark, root, base, hi)
    var end = base
    var files = 0L
    var full = false
    while (!full && byVersion.hasNext) {
      val (v, fs) = byVersion.next()
      if (end == base || files + fs.size <= maxFilesPerBatch) {
        end = v
        files += fs.size
      } else full = true
    }
    if (end > base) Some(LongOffset(end)) else None
  }

  /** One schema group = one immutable d-<uuid> dir; inferred footer
    * schema so the alignment below can CAST (a pinned userSpecified
    * schema would make the vectorized reader throw on a widened column
    * instead of upcasting — review finding). */
  private def groupFrame(files: Seq[String],
      pinned: Option[StructType]): DataFrame = {
    val relation = org.apache.spark.sql.execution.datasources.DataSource(
      spark,
      className = "parquet",
      paths = files.map(p => s"$root/$p"),
      userSpecifiedSchema = pinned).resolveRelation(checkFilesExist = false)
    // the FileStreamSource idiom: the relation wrapped in a
    // LogicalRelation MARKED streaming — the engine asserts
    // isStreaming=true on every v1 getBatch result (the flag propagates
    // through the projections/unions below), and executors still read
    // through the ordinary vectorized parquet path
    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
      org.apache.spark.sql.execution.datasources.LogicalRelation(
        relation, isStreaming = true))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val from = start.map(o => LongOffset(o.json().toLong).offset).getOrElse(startingVersion)
    val to = LongOffset(end.json().toLong).offset
    val advanced = math.max(cursor, math.max(from, to))
    if (advanced > cursor) { cursor = advanced; persistCursor(advanced) }
    val (files, _) = CommitLog.changedFiles(spark, root, from, to)
    if (files.isEmpty) return groupFrame(Seq.empty, Some(schema))
    // per-dir groups aligned to the PINNED schema (cast widened columns,
    // null-fill later additions, drop columns beyond the pin): a window
    // or restart spanning a schema evolution streams on instead of
    // throwing in the vectorized reader (the evolved fold's contract,
    // applied to the stream's fixed schema). The alignment is
    // widen-CHECKED per column, not a blind cast: a type the batch
    // evolved reader would reject (string→long swap, decimal reshape) or
    // a file column WIDER than the pin (long files under an int pin —
    // the cast would narrow) fails the stream loudly with both types.
    files.groupBy(_.takeWhile(_ != '/')).toSeq.sortBy(_._1)
      .map { case (_, fs) => groupFrame(fs, None) }
      .map { df =>
        val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
        df.select(schema.fields.toSeq.map { f =>
          have.get(f.name) match {
            case None => lit(null).cast(f.dataType).as(f.name)
            case Some(t) =>
              if (!CommitLog.widen(t, f.dataType).contains(f.dataType))
                throw new IllegalArgumentException(
                  s"graft-changefeed: column '${f.name}' at $root evolved " +
                    s"incompatibly mid-stream: files carry ${t.sql}, the " +
                    s"stream's pinned schema says ${f.dataType.sql} — only " +
                    "additions and int→long / float→double widenings into " +
                    "the pin are streamable; restart the stream to re-pin")
              col(f.name).cast(f.dataType).as(f.name)
          }
        }: _*)
      }
      .reduce(_ union _)
  }

  override def stop(): Unit = ()
}
