package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** F-block: multimodal column plumbing — image/audio/video payloads as
  * opaque `binary` columns with typed metadata.
  *
  * The container has no media codecs, so the *decode* step is a
  * clearly-marked deterministic stub ([[FakeDecoder]]); everything around
  * it — binary schema, batched per-partition execution, typed feature
  * output — is the real pipeline shape a 100 TB media corpus would stream
  * through. Payloads are synthesized from `documents.text` bytes so the
  * whole path stays deterministic and oracle-checkable where possible.
  */
object Multimodal {

  /** q41: binary payload + metadata extraction (byte length, content hash,
    * magic-bytes prefix) — the catalog/stats pass of a media pipeline.
    */
  def q41BinaryMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("payload")).as("byte_len"),
        sha2(col("payload"), 256).as("content_sha"),
        // first 4 *characters* then UTF-8 bytes (not first 4 payload
        // bytes): keeps parity with the oracle on multibyte text
        lower(hex(encode(substring(col("text"), 1, 4), "UTF-8"))).as("head_hex"))

  // ---- q42: batched per-partition feature extraction ----

  /** Input record: opaque media payload. */
  case class DocPayload(doc_id: Long, payload: Array[Byte])

  /** Extracted features. `fake_width`/`fake_height` stand in for decoded
    * media dimensions.
    */
  case class DocFeatures(
      doc_id: Long, n_bytes: Int, mean_byte: Double,
      n_distinct_bytes: Int, fake_width: Int, fake_height: Int)

  /** STUB decoder: a real implementation would decode image/audio bytes
    * (e.g. via a JNI codec) — unavailable in this container. This fake is
    * deterministic in the payload so the pipeline stays testable; the
    * *shape* (bytes in → typed features out, amortized per partition) is
    * the real contract.
    */
  private[operators] object FakeDecoder {
    def decode(p: DocPayload): DocFeatures = {
      val bytes = p.payload
      var sum = 0L
      val seen = new java.util.BitSet(256)
      var i = 0
      while (i < bytes.length) {
        sum += bytes(i) & 0xff
        seen.set(bytes(i) & 0xff)
        i += 1
      }
      val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
      DocFeatures(
        doc_id = p.doc_id,
        n_bytes = bytes.length,
        mean_byte = math.round(mean * 10000).toDouble / 10000,
        n_distinct_bytes = seen.cardinality(),
        fake_width = 64 + (bytes.length % 512),
        fake_height = 64 + ((sum % 512)).toInt)
    }
  }

  /** q42: mapPartitions feature extraction — the iterator boundary is where
    * a real decoder would initialize its codec once per partition (the
    * Scala analogue of a batched pandas-UDF). No driver involvement; the
    * corpus streams through executors.
    */
  def q42FeatureExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[DocPayload]
      .mapPartitions { it =>
        // per-partition init of the (stubbed) decoder happens here
        it.map(FakeDecoder.decode)
      }
      .toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_binary_meta"     -> (q41BinaryMeta _),
    "q42_feature_extract" -> (q42FeatureExtract _))

  /** q42 is rows-only (the decode stub has no SQL mirror); q41's metadata
    * is fully SQL-expressible.
    */
  val oracles: Map[String, String] = Map(
    "q41_binary_meta" ->
      """SELECT doc_id,
                octet_length(encode(text)) AS byte_len,
                sha256(text) AS content_sha,
                lower(hex(encode(substring(text, 1, 4)))) AS head_hex
         FROM documents""")
}
