package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, LessThan, LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Multimodal.PgmCodec

/** `graft-frames` — a DataSource V2 connector that reads multi-frame
  * binary-PGM container files (q101's media format) as a TABLE: one row
  * per frame with typed metadata and decoded features.
  *
  * This completes the repo's Spark-extension tour on the SOURCE axis
  * (expressions, aggregates, optimizer rule, planner strategy and exec
  * node already exist): a `TableProvider` whose scan decodes a media
  * format inside `PartitionReader`, with REAL column pruning — pixel
  * decode and aHash are skipped entirely when the query doesn't select
  * those columns (`SupportsPushDownRequiredColumns`), the media analogue
  * of parquet's ReadSchema pruning — and REAL filter pushdown
  * (`SupportsPushDownFilters`, parquet discipline: pushed AND re-applied,
  * so pruning can only skip work, never change results): `path`
  * equality/IN/prefix filters drop whole container files at planning
  * time, and `frame_idx` upper bounds stop the sequential frame walk
  * before later frames are ever decoded. Both asserted by
  * FrameSourceSpec (partition count for file pruning; a
  * corrupt-later-frame container that quarantines unfiltered but decodes
  * clean under the bound, proving the decode was skipped).
  *
  * Scale shape: one InputPartition per container file (media files are
  * the natural work unit; frames inside a file must be walked
  * sequentially because the container is a byte-concatenation), decoding
  * streams through executors with no driver involvement. Corrupt
  * containers follow the multimodal quarantine contract: the file yields
  * a single decode_ok=false row instead of failing the scan.
  *
  * Usage: `spark.read.format("graft-frames").load(containerDir)`.
  */
class FrameSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-frames"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FrameSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new FrameTable(properties.asScala.getOrElse("path", ""))
}

object FrameSource {
  /** Full table schema; `mean_pixel`/`ahash` are the expensive columns
    * whose computation the reader skips when pruned away.
    */
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("mean_pixel", DoubleType, nullable = true),
    StructField("ahash", LongType, nullable = true)))
}

private[sources] class FrameTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-frames(`$path`)"
  override def schema(): StructType = FrameSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FrameScanBuilder(options.asScala.getOrElse("path", path))
}

private[sources] class FrameScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = FrameSource.Schema
  private var pushed: Array[Filter] = Array.empty

  /** Column pruning lands HERE: the reader receives the pruned schema and
    * skips pixel work it doesn't need. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Filter pushdown, the parquet discipline (pushed AND re-applied):
    * every filter is returned as residual so Spark re-evaluates it —
    * the source exploits the usable subset purely to SKIP WORK, so a
    * pruning bug can never change results, only speed. Usable here:
    * `path` equality/IN/prefix filters drop whole container files at
    * PLANNING time (the partition-pruning analogue for media files),
    * and `frame_idx` upper bounds stop the sequential container walk
    * early — frames past the bound are never even decoded.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(FrameScan.usable)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new FrameScan(path, required, pushed)
}

private[sources] object FrameScan {
  private[sources] def usable(f: Filter): Boolean = f match {
    case EqualTo("path", _: String) => true
    case In("path", _) => true
    case StringStartsWith("path", _) => true
    case LessThan("frame_idx", _: Int) => true
    case LessThanOrEqual("frame_idx", _: Int) => true
    case EqualTo("frame_idx", _: Int) => true
    case _ => false
  }

  /** AND of the pushed path predicates over one candidate file. */
  private[sources] def keepFile(pushed: Array[Filter], file: String): Boolean =
    pushed.forall {
      case EqualTo("path", v: String) => file == v
      case In("path", vs) => vs.exists(v => v != null && file == v.toString)
      case StringStartsWith("path", p) => file.startsWith(p)
      case _ => true
    }

  /** Tightest frame_idx upper bound among the pushed filters. */
  private[sources] def maxFrameIdx(pushed: Array[Filter]): Int =
    pushed.foldLeft(Int.MaxValue) {
      case (acc, LessThan("frame_idx", n: Int)) => math.min(acc, n - 1)
      case (acc, LessThanOrEqual("frame_idx", n: Int)) => math.min(acc, n)
      case (acc, EqualTo("frame_idx", n: Int)) => math.min(acc, n)
      case (acc, _) => acc
    }
}

private[sources] class FrameScan(path: String, required: StructType,
    pushed: Array[Filter] = Array.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-frames scan of $path, ReadSchema: ${required.catalogString}" +
      (if (pushed.nonEmpty) s", PushedFilters: ${pushed.mkString("[", ", ", "]")}" else "")

  /** One partition per container file: the decode unit is the file. */
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val files: Seq[FileStatus] =
      if (fs.isDirectory(p)) fs.listStatus(p).toSeq.filter(_.isFile)
        .filterNot(st => st.getPath.getName.startsWith(".") ||
          st.getPath.getName.startsWith("_"))
      else {
        // globStatus returns NULL (not empty) for a nonexistent non-glob
        // path — surface a clean error instead of an executor NPE
        val matched = fs.globStatus(p)
        if (matched == null)
          throw new java.io.FileNotFoundException(s"graft-frames: path does not exist: $path")
        matched.toSeq.filter(_.isFile)
      }
    files.sortBy(_.getPath.toString)
      .filter(st => FrameScan.keepFile(pushed, st.getPath.toString))
      .map(st => FramePartition(st.getPath.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FrameReaderFactory(required, FrameScan.maxFrameIdx(pushed),
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))
}

private[sources] case class FramePartition(file: String) extends InputPartition

private[sources] class FrameReaderFactory(required: StructType, maxIdx: Int,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FrameReader(partition.asInstanceOf[FramePartition].file, required, maxIdx,
      conf.value)
}

/** Walks one container file frame-by-frame with the genuine PGM codec.
  * Feature columns are computed ONLY if the pruned schema asks for them.
  */
private[sources] class FrameReader(file: String, required: StructType,
    maxIdx: Int = Int.MaxValue,
    conf: org.apache.hadoop.conf.Configuration = new org.apache.hadoop.conf.Configuration())
    extends PartitionReader[InternalRow] {

  private val needMean = required.fieldNames.contains("mean_pixel")
  private val needHash = required.fieldNames.contains("ahash")

  /** Containers larger than this buffer in full — a media container past
    * it is out of this reader's contract and quarantines (a production
    * variant would stream-walk frames instead of slurping).
    */
  private val MaxBytes = 256L << 20

  // executor-side open with the SESSION's Hadoop conf, shipped via
  // SerializableConfiguration from the driver-side scan (a fresh
  // Configuration() would drop filesystem credentials/endpoints and
  // quarantine every file on s3a-style deployments).
  // None = unreadable/oversized → one quarantine row, never a failed scan.
  // IO failures (file deleted between planning and read, permission error,
  // transient FS fault) quarantine the same way as decode corruption — the
  // connector's corrupt-file contract is uniform across both failure kinds.
  private val bytes: Option[Array[Byte]] =
    try {
      val p = new Path(file)
      val fs = p.getFileSystem(conf)
      val len = fs.getFileStatus(p).getLen
      if (len > MaxBytes) None // .toInt would wrap negative past 2 GiB
      else {
        val in = fs.open(p)
        try {
          val buf = new Array[Byte](len.toInt)
          in.readFully(0, buf)
          Some(buf)
        } finally in.close()
      }
    } catch { case _: java.io.IOException => None }

  private var cursor = 0
  private var frameIdx = -1
  private var current: InternalRow = _
  private var corruptEmitted = false

  override def next(): Boolean = bytes match {
    case None =>
      if (corruptEmitted) false
      else { corruptEmitted = true; frameIdx += 1; current = row(ok = false, None); true }
    case Some(b) => nextFrom(b)
  }

  private def nextFrom(bytes: Array[Byte]): Boolean = {
    if (cursor >= bytes.length) return false
    // pushed frame_idx upper bound: frames past it are never decoded —
    // the sequential container can't seek, but it CAN stop early
    if (frameIdx + 1 > maxIdx) return false
    PgmCodec.decodeFrom(bytes, cursor) match {
      case Some((img, end)) =>
        cursor = end
        frameIdx += 1
        current = row(ok = true, Some(img))
        true
      case None =>
        // corrupt tail: one quarantine row for the file, then stop
        if (corruptEmitted) return false
        corruptEmitted = true
        cursor = bytes.length
        frameIdx += 1
        current = row(ok = false, None)
        true
    }
  }

  private def row(ok: Boolean, img: Option[PgmCodec.Image]): InternalRow = {
    val values = required.fields.map { f =>
      f.name match {
        case "path" => UTF8String.fromString(file)
        case "frame_idx" => frameIdx
        case "decode_ok" => ok
        case "width" => img.map(i => Integer.valueOf(i.width)).orNull
        case "height" => img.map(i => Integer.valueOf(i.height)).orNull
        case "mean_pixel" => img.filter(_ => needMean).map { i =>
          val s = i.pixels.foldLeft(0L)((a, b) => a + (b & 0xff))
          java.lang.Double.valueOf(
            math.round(s.toDouble / i.pixels.length * 10000).toDouble / 10000)
        }.orNull
        case "ahash" => img.filter(_ => needHash)
          .map(i => java.lang.Long.valueOf(PgmCodec.aHash(i))).orNull
        case other => throw new IllegalStateException(s"unknown column $other")
      }
    }
    InternalRow.fromSeq(values.toSeq)
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
