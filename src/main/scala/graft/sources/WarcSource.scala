package graft.sources

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In, LessThan, LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-warc` — a DataSource V2 connector reading WARC web-archive files
  * (ISO 28500 record framing, the CommonCrawl container format) as a
  * TABLE: one row per WARC record with header metadata, HTTP response
  * fields, and the charset-decoded body — the raw-crawl FRONT DOOR of an
  * LLM data pipeline, feeding q152's boilerplate extraction.
  *
  * Built on the graft-frames scaffold (FrameSource.scala) and keeping its
  * two disciplines:
  *
  *  - REAL column pruning (`SupportsPushDownRequiredColumns`): the HTTP
  *    block parse and the charset decode of the body are skipped entirely
  *    when no http / charset / body column is selected — a
  *    `SELECT warc_type, count(*)` never decodes a single payload byte
  *    (record framing still walks Content-Length, which is a cursor jump,
  *    not a parse).
  *  - Filter pushdown (`SupportsPushDownFilters`, parquet discipline:
  *    pushed AND returned as residual so Spark re-applies them — pruning
  *    can only skip work, never change results): `path`
  *    equality/IN/prefix drops whole archive files at planning time;
  *    `warc_type = '...'` skips non-matching records before any block
  *    parse (a response-only scan never parses request/metadata blocks);
  *    `record_idx` upper bounds stop the sequential record walk early.
  *
  * Record framing per ISO 28500: a `WARC/x.y` version line, CRLF-separated
  * named headers to a blank line, `Content-Length` octets of block, then
  * CRLFCRLF. `WARC-Type: response` blocks carrying
  * `Content-Type: application/http` are additionally split into HTTP
  * status line / headers / payload, with the payload decoded under the
  * HTTP `charset=` parameter (UTF-8 default, malformed input REPLACEd —
  * crawl payloads routinely lie about their encoding, and a quarantined
  * scan beats a failed one). Whole-file gzip (including the multi-member
  * per-record gzip CommonCrawl ships) is detected by magic and inflated
  * through the JDK's multi-member GZIPInputStream.
  *
  * Corruption contract (the multimodal quarantine rule): a record whose
  * framing is malformed yields ONE parse_ok=false row for the file tail
  * and the walk stops — records before it are preserved; unreadable or
  * over-cap files yield a single quarantine row, never a failed scan.
  *
  * Scale shape: one InputPartition per archive file (records inside one
  * file are a byte-concatenation — sequential by nature; CommonCrawl
  * shards crawls into ~1 GB files precisely so file-parallelism is the
  * work unit), decode streams on executors, no driver involvement.
  *
  * Usage: `spark.read.format("graft-warc").load(warcDir)`.
  */
class WarcSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new WarcTable(properties.asScala.getOrElse("path", ""))
}

object WarcSource {
  /** Full table schema. `body_text` (and the http_* trio it rides with)
    * are the expensive columns whose parse/decode the reader skips when
    * pruned away.
    */
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("record_idx", IntegerType, nullable = false),
    StructField("parse_ok", BooleanType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = true),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("charset", StringType, nullable = true),
    StructField("body_text", StringType, nullable = true)))
}

private[sources] class WarcTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-warc(`$path`)"
  override def schema(): StructType = WarcSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(options.asScala.getOrElse("path", path))
}

private[sources] class WarcScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = WarcSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(WarcScan.usable)
    filters // everything residual: pushdown skips work, Spark re-checks
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new WarcScan(path, required, pushed)
}

private[sources] object WarcScan {
  private[sources] def usable(f: Filter): Boolean = f match {
    case EqualTo("path", _: String) => true
    case In("path", _) => true
    case StringStartsWith("path", _) => true
    case EqualTo("warc_type", _: String) => true
    case In("warc_type", _) => true
    case LessThan("record_idx", _: Int) => true
    case LessThanOrEqual("record_idx", _: Int) => true
    case EqualTo("record_idx", _: Int) => true
    case _ => false
  }

  private[sources] def keepFile(pushed: Array[Filter], file: String): Boolean =
    pushed.forall {
      case EqualTo("path", v: String) => file == v
      case In("path", vs) => vs.exists(v => v != null && file == v.toString)
      case StringStartsWith("path", p) => file.startsWith(p)
      case _ => true
    }

  /** warc_type values the pushed filters admit; None = no type filter. */
  private[sources] def typeFilter(pushed: Array[Filter]): Option[Set[String]] = {
    val sets = pushed.collect {
      case EqualTo("warc_type", v: String) => Set(v)
      case In("warc_type", vs) => vs.collect { case v: String => v }.toSet
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  private[sources] def maxRecordIdx(pushed: Array[Filter]): Int =
    pushed.foldLeft(Int.MaxValue) {
      case (acc, LessThan("record_idx", n: Int)) => math.min(acc, n - 1)
      case (acc, LessThanOrEqual("record_idx", n: Int)) => math.min(acc, n)
      case (acc, EqualTo("record_idx", n: Int)) => math.min(acc, n)
      case (acc, _) => acc
    }
}

private[sources] class WarcScan(path: String, required: StructType,
    pushed: Array[Filter] = Array.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-warc scan of $path, ReadSchema: ${required.catalogString}" +
      (if (pushed.nonEmpty) s", PushedFilters: ${pushed.mkString("[", ", ", "]")}" else "")

  /** One partition per archive file: the record walk is sequential. */
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
        val matched = fs.globStatus(p)
        if (matched == null)
          throw new java.io.FileNotFoundException(s"graft-warc: path does not exist: $path")
        matched.toSeq.filter(_.isFile)
      }
    files.sortBy(_.getPath.toString)
      .filter(st => WarcScan.keepFile(pushed, st.getPath.toString))
      .map(st => WarcPartition(st.getPath.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, WarcScan.typeFilter(pushed),
      WarcScan.maxRecordIdx(pushed),
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))
}

private[sources] case class WarcPartition(file: String) extends InputPartition

private[sources] class WarcReaderFactory(required: StructType,
    typeFilter: Option[Set[String]], maxIdx: Int,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcReader(partition.asInstanceOf[WarcPartition].file, required,
      typeFilter, maxIdx, conf.value)
}

/** The record-framing walk itself, file-format logic only — unit-testable
  * without a Spark plan. */
private[graft] object WarcCodec {

  final case class WarcRecord(
      recordIdx: Int,
      parseOk: Boolean,
      warcType: Option[String] = None,
      targetUri: Option[String] = None,
      warcDate: Option[String] = None,
      recordId: Option[String] = None,
      contentType: Option[String] = None,
      contentLength: Option[Long] = None,
      httpStatus: Option[Int] = None,
      httpContentType: Option[String] = None,
      charset: Option[String] = None,
      bodyText: Option[String] = None)

  /** Read one CRLF- (or bare-LF-, which crawlers emit) terminated header
    * line starting at `from`; returns (line, cursorAfter). None = no
    * terminator before EOF.
    */
  private def line(b: Array[Byte], from: Int): Option[(String, Int)] = {
    var i = from
    while (i < b.length && b(i) != '\n') i += 1
    if (i >= b.length) None
    else {
      val end = if (i > from && b(i - 1) == '\r') i - 1 else i
      Some((new String(b, from, end - from, StandardCharsets.US_ASCII), i + 1))
    }
  }

  /** Parse `Name: value` headers up to the blank line. None = framing
    * broken (EOF inside headers). Names fold to lower case (RFC 9110 /
    * ISO 28500 header names are case-insensitive).
    */
  private def headers(b: Array[Byte], from: Int): Option[(Map[String, String], Int)] = {
    var cur = from
    val m = Map.newBuilder[String, String]
    var done = false
    while (!done) {
      line(b, cur) match {
        case None => return None
        case Some((l, next)) =>
          cur = next
          if (l.isEmpty) done = true
          else {
            val i = l.indexOf(':')
            if (i > 0) m += (l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
            // a header line without ':' is tolerated (skipped): crawl
            // archives contain them; framing integrity comes from
            // Content-Length, not header syntax
          }
      }
    }
    Some((m.result(), cur))
  }

  /** charset= parameter of a Content-Type value, lower-cased, unquoted. */
  private[graft] def charsetOf(contentType: String): Option[String] = {
    val lower = contentType.toLowerCase
    val i = lower.indexOf("charset=")
    if (i < 0) None
    else {
      val rest = lower.substring(i + 8).trim
      val v = rest.takeWhile(c => c != ';' && c != ' ').stripPrefix("\"").stripSuffix("\"")
      if (v.isEmpty) None else Some(v)
    }
  }

  /** Decode `bytes` under `name`, REPLACEing malformed input; unknown or
    * unsupported charsets fall back to UTF-8 (crawl payloads lie). */
  private[graft] def decode(bytes: Array[Byte], name: String): String = {
    val cs =
      try Charset.forName(name)
      catch { case _: Exception => StandardCharsets.UTF_8 }
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
  }

  /** Split an application/http response block into (status, content-type,
    * charset, decoded payload). None = not parseable as HTTP (the record
    * still emits, with http_* null — a malformed HTTP block inside a
    * well-framed WARC record is content, not corruption).
    */
  private def parseHttp(block: Array[Byte], wantBody: Boolean)
      : Option[(Int, Option[String], Option[String], Option[String])] = {
    line(block, 0) match {
      case Some((status, afterStatus)) if status.startsWith("HTTP/") =>
        val parts = status.split(" ")
        val code = if (parts.length >= 2) parts(1).toIntOption else None
        code.flatMap { c =>
          headers(block, afterStatus).map { case (hs, bodyStart) =>
            val ct = hs.get("content-type")
            val cs = ct.flatMap(charsetOf)
            val body = if (wantBody)
              Some(decode(java.util.Arrays.copyOfRange(block, bodyStart, block.length),
                cs.getOrElse("utf-8")))
            else None
            (c, ct, cs, body)
          }
        }
      case _ => None
    }
  }

  /** Walk every record of an (inflated) WARC byte buffer. `wantHttp`
    * gates the HTTP block split, `wantBody` the charset decode — the
    * column-pruning hooks. `keepType` skips non-matching records before
    * any block work. Malformed framing appends one parse_ok=false row
    * and stops (content before the corruption is preserved).
    */
  def walk(b: Array[Byte], wantHttp: Boolean, wantBody: Boolean,
      keepType: Option[Set[String]] = None,
      maxIdx: Int = Int.MaxValue): Seq[WarcRecord] = {
    val out = ArrayBuffer.empty[WarcRecord]
    var cursor = 0
    var idx = -1
    var halted = false
    while (!halted && cursor < b.length && idx < maxIdx) {
      // tolerate extra record separators / trailing CRLFs
      while (cursor < b.length && (b(cursor) == '\r' || b(cursor) == '\n')) cursor += 1
      if (cursor >= b.length) halted = true
      else {
        val rec = for {
          (version, afterVersion) <- line(b, cursor)
          if version.startsWith("WARC/")
          (hs, blockStart) <- headers(b, afterVersion)
          len <- hs.get("content-length").flatMap(_.toLongOption)
          // bound as `len <= remaining`, never `blockStart + len <= length`:
          // an adversarial Content-Length near Long.MaxValue overflows the
          // sum negative and would pass the guard into a negative cursor
          if len >= 0 && len <= (b.length - blockStart).toLong
        } yield {
          cursor = (blockStart + len).toInt
          idx += 1
          val wtype = hs.get("warc-type")
          if (keepType.exists(ks => !wtype.exists(ks.contains))) None
          else {
            val isHttpResponse = wtype.contains("response") &&
              hs.get("content-type").exists(_.toLowerCase.startsWith("application/http"))
            val http = if (wantHttp && isHttpResponse)
              parseHttp(java.util.Arrays.copyOfRange(b, blockStart, cursor), wantBody)
            else None
            Some(WarcRecord(idx, parseOk = true,
              warcType = wtype,
              targetUri = hs.get("warc-target-uri"),
              warcDate = hs.get("warc-date"),
              recordId = hs.get("warc-record-id"),
              contentType = hs.get("content-type"),
              contentLength = Some(len),
              httpStatus = http.map(_._1),
              httpContentType = http.flatMap(_._2),
              charset = http.flatMap(_._3),
              bodyText = http.flatMap(_._4)))
          }
        }
        rec match {
          case Some(Some(r)) => out += r
          case Some(None)    => () // type-filtered: framing consumed, no row
          case None =>
            // broken framing: quarantine the tail, stop the walk
            idx += 1
            out += WarcRecord(idx, parseOk = false)
            halted = true
        }
      }
    }
    out.toSeq
  }

  /** Inflate whole-file gzip (multi-member per ISO 28500 recommendation)
    * if the magic matches; cap the inflated size. None = over cap.
    */
  def inflate(raw: Array[Byte], cap: Long): Option[Array[Byte]] =
    if (raw.length < 2 || (raw(0) & 0xff) != 0x1f || (raw(1) & 0xff) != 0x8b) Some(raw)
    else {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(raw))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0 && out.size() <= cap) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      in.close()
      if (out.size() > cap) None else Some(out.toByteArray)
    }
}

/** Executor-side reader over one archive file (the FrameReader contract:
  * unreadable/oversized/corrupt → quarantine rows, never a failed scan).
  */
private[sources] class WarcReader(file: String, required: StructType,
    typeFilter: Option[Set[String]], maxIdx: Int,
    conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {

  private val needBody = required.fieldNames.contains("body_text")
  private val needHttp = needBody ||
    Seq("http_status", "http_content_type", "charset").exists(required.fieldNames.contains)

  private val MaxBytes = 256L << 20

  private val records: Iterator[WarcCodec.WarcRecord] = {
    val parsed: Seq[WarcCodec.WarcRecord] =
      try {
        val p = new Path(file)
        // the SESSION's Hadoop conf, shipped via SerializableConfiguration
        // from the driver-side scan: a fresh Configuration() here would
        // silently drop filesystem credentials/endpoints (s3a, the
        // realistic CommonCrawl home) and quarantine every file
        val fs = p.getFileSystem(conf)
        val len = fs.getFileStatus(p).getLen
        if (len > MaxBytes) Seq(WarcCodec.WarcRecord(0, parseOk = false))
        else {
          val raw = new Array[Byte](len.toInt)
          val in = fs.open(p)
          try in.readFully(0, raw) finally in.close()
          WarcCodec.inflate(raw, MaxBytes) match {
            case None => Seq(WarcCodec.WarcRecord(0, parseOk = false))
            case Some(b) => WarcCodec.walk(b, needHttp, needBody, typeFilter, maxIdx)
          }
        }
      } catch {
        case _: java.io.IOException => Seq(WarcCodec.WarcRecord(0, parseOk = false))
      }
    parsed.iterator
  }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (!records.hasNext) false
    else { current = row(records.next()); true }

  private def row(r: WarcCodec.WarcRecord): InternalRow = {
    def str(v: Option[String]) = v.map(UTF8String.fromString).orNull
    val values = required.fields.map { f =>
      f.name match {
        case "path" => UTF8String.fromString(file)
        case "record_idx" => r.recordIdx
        case "parse_ok" => r.parseOk
        case "warc_type" => str(r.warcType)
        case "target_uri" => str(r.targetUri)
        case "warc_date" => str(r.warcDate)
        case "record_id" => str(r.recordId)
        case "content_type" => str(r.contentType)
        case "content_length" => r.contentLength.map(java.lang.Long.valueOf).orNull
        case "http_status" => r.httpStatus.map(Integer.valueOf).orNull
        case "http_content_type" => str(r.httpContentType)
        case "charset" => str(r.charset)
        case "body_text" => str(r.bodyText)
        case other => throw new IllegalStateException(s"unknown column $other")
      }
    }
    InternalRow.fromSeq(values.toSeq)
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
