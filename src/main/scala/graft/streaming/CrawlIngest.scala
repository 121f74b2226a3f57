package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.sources.WarcCodec

/** s21: STREAMING crawl ingest — the continuous form of
  * `CorpusPipeline.fromWarc`: a watched landing directory of WARC
  * archives becomes a safety-gated documents stream. New archive files
  * are discovered by the binaryFile file-stream source (exactly-once
  * file tracking via the stream checkpoint), each file's records are
  * decoded EXECUTOR-SIDE with the same [[WarcCodec]] the batch DSv2
  * source uses (one task per archive file — the crawl's natural
  * parallel unit), HTTP-200 responses become the documents contract,
  * and every micro-batch lands through [[SafetyGate]]'s dual-root
  * atomic commit: clean docs publish, flagged docs quarantine with
  * reasons. Crash/replay safety is inherited twice over — the file
  * source replays unprocessed files from its checkpoint, and the gate's
  * per-batch generation commits make replayed batches no-ops.
  *
  * doc_id is the stable `xxhash64(path, record_idx)` — the EXACT
  * expression the batch `CorpusPipeline.fromWarc` uses, so a backfill
  * and a streamed re-ingest of the same archive produce identical ids
  * (spec-pinned) without any coordination.
  *
  * Framing-corrupt, gzip-torn or oversized archives contribute their
  * quarantine record only in the BATCH source (which reports per-file
  * parse_ok); here a framing tear yields the records before it, a gzip
  * tear yields zero records (caught per file), and an over-cap file is
  * skipped on its length metadata — corrupt-file MONITORING belongs to
  * the landing-zone audit, not the ingest hot path (run
  * `spark.read.format("graft-warc")` over the same dir and filter
  * `!parse_ok` for that report).
  */
object CrawlIngest {

  private val BinaryFileSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  private val MaxBytes = 256L << 20

  /** Decode one micro-batch of (path, content) archive files into the
    * documents contract — the executor-side record walk. Gzip-level
    * corruption (valid magic, torn stream — a file picked up mid-copy)
    * is caught PER FILE and yields zero records instead of killing the
    * query: the batch WarcReader applies the same swallow-and-quarantine
    * contract; here the landing-zone audit (the batch `graft-warc` read
    * over the same directory) owns corruption reporting.
    *
    * doc_id parity with the batch path: the id is computed as a COLUMN
    * (`xxhash64(path, record_idx)`) after the typed decode — the exact
    * expression [[graft.CorpusPipeline.fromWarc]] uses — so a backfilled
    * archive and its streamed re-ingest produce IDENTICAL ids
    * (spec-pinned), and the id space is the full 64-bit hash, not a
    * collision-prone 32-bit path pack.
    */
  private[graft] def decodeBatch(batch: DataFrame): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    batch.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, raw) =>
        try {
          WarcCodec.inflate(raw, MaxBytes).toSeq.flatMap { bytes =>
            WarcCodec.walk(bytes, wantHttp = true, wantBody = true,
                keepType = Some(Set("response")))
              .filter(r => r.parseOk && r.httpStatus.contains(200) && r.bodyText.nonEmpty)
              .map(r => (path, r.recordIdx, r.bodyText.get, r.targetUri.getOrElse(path)))
          }
        } catch {
          case scala.util.control.NonFatal(_) => Seq.empty // torn gzip etc.
        }
      }
      .toDF("path", "record_idx", "text", "source")
      .select(xxhash64(col("path"), col("record_idx")).as("doc_id"),
        col("text"), lit("und").as("lang"), col("source"))
  }

  /** The streaming entry: watch `warcDir` for new archives, decode, and
    * gate every batch through the s20 dual-root publish. */
  def ingestStream(s: SparkSession, warcDir: String, publishDir: String,
      quarantineDir: String, checkpointDir: String): StreamingQuery =
    s.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("pathGlobFilter", "*.warc*")
      .load(warcDir)
      // RAW-size bound BEFORE the content column materializes downstream:
      // the batch source quarantines oversized archives without reading a
      // byte (WarcReader's getLen check); the stream's equivalent is this
      // metadata filter — an over-cap file is skipped here, and surfaces
      // in the landing-zone audit, never as an executor OOM
      .filter(col("length") <= MaxBytes)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        SafetyGate.gateBatch(s, decodeBatch(batch.toDF()), batchId,
          publishDir, quarantineDir)
      }
      .start()
}
