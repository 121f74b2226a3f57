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
  * new-changes-only). Schema: pinned to the current snapshot's at query
  * start (a stream cannot widen its schema mid-flight); batches spanning
  * a table evolution ALIGN to the pin — widened columns upcast, columns
  * added after the pin are dropped until a restart re-pins, pre-evolution
  * files null-fill (the evolved fold's contract, applied per batch).
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

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      CommitLog.snapshot(sqlContext.sparkSession, root(parameters)).schema))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val tableRoot = root(parameters)
    val starting = parameters.get("startingVersion").map(_.toLong).getOrElse(0L)
    val resolved = schema.getOrElse(
      CommitLog.snapshot(sqlContext.sparkSession, tableRoot).schema)
    new ChangeFeedStreamSource(sqlContext, tableRoot, starting, resolved)
  }
}

private[sources] class ChangeFeedStreamSource(sqlContext: SQLContext,
    root: String, startingVersion: Long, override val schema: StructType)
    extends Source {

  private val spark = sqlContext.sparkSession

  /** Newest committed version, as the stream's available offset; None
    * until the table has a commit past the starting point. A missing
    * log directory reads as head 0 (headVersion's own contract) — but
    * IO failures and corrupt log entries PROPAGATE and fail the query
    * loudly; a catch-all here would turn log corruption into a silently
    * idle "healthy" stream (review finding). */
  override def getOffset: Option[Offset] = {
    val head = CommitLog.headVersion(spark, root)
    if (head > startingVersion) Some(LongOffset(head)) else None
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
    val (files, _) = CommitLog.changedFiles(spark, root, from, to)
    if (files.isEmpty) return groupFrame(Seq.empty, Some(schema))
    // per-dir groups aligned to the PINNED schema (cast widened columns,
    // null-fill later additions, drop columns beyond the pin): a window
    // or restart spanning a schema evolution streams on instead of
    // throwing in the vectorized reader (the evolved fold's contract,
    // applied to the stream's fixed schema)
    files.groupBy(_.takeWhile(_ != '/')).toSeq.sortBy(_._1)
      .map { case (_, fs) => groupFrame(fs, None) }
      .map { df =>
        val have = df.columns.toSet
        df.select(schema.fields.toSeq.map { f =>
          (if (have(f.name)) col(f.name).cast(f.dataType)
           else lit(null).cast(f.dataType)).as(f.name)
        }: _*)
      }
      .reduce(_ union _)
  }

  override def stop(): Unit = ()
}
