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

  // ---- q61: REAL image decode over a codec-free format (binary PGM) ----

  /** Minimal binary-PGM (netpbm P5) codec — a REAL image format parsed with
    * pure byte arithmetic, so the decode step needs no native codec at all.
    * This replaces the "decode is always a stub" caveat for the image path:
    * encode, header parse, pixel access, block-average resize and a 64-bit
    * average-hash (aHash) below are all genuine implementations. Formats
    * that require entropy coding (JPEG/audio/video) remain represented by
    * [[FakeDecoder]], stated as such.
    */
  private[graft] object PgmCodec {
    /** P5 header + raw 8-bit pixels. */
    def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
      require(pixels.length == width * height)
      val header = s"P5\n$width $height\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(pixels, 0, out, header.length, pixels.length)
      out
    }

    final case class Image(width: Int, height: Int, pixels: Array[Byte])

    /** Strict P5 parse; None for anything malformed (truncated payload,
      * bad magic, absurd dims) — corrupt media must quarantine, not kill
      * the job.
      */
    def decode(bytes: Array[Byte]): Option[Image] = {
      // header = magic, width, height, maxval as whitespace-separated
      // ASCII tokens; pixels follow the single whitespace after maxval
      var i = 0
      def skipWs(): Unit = while (i < bytes.length && bytes(i).toChar.isWhitespace) i += 1
      def token(): Option[String] = {
        skipWs()
        val start = i
        while (i < bytes.length && !bytes(i).toChar.isWhitespace) i += 1
        if (i > start) Some(new String(bytes, start, i - start, "US-ASCII")) else None
      }
      def intToken(): Option[Int] =
        token().flatMap(_.toIntOption).filter(v => v > 0 && v <= (1 << 20))
      for {
        magic <- token() if magic == "P5"
        w <- intToken()
        h <- intToken()
        // long arithmetic: w and h are individually bounded but w*h can
        // wrap Int (e.g. 65536×65536 → 0), turning a crafted header into a
        // crash or a bogus empty image instead of a quarantine
        npx = w.toLong * h.toLong if npx <= (1L << 26)
        maxv <- intToken() if maxv == 255
        _ = { i += 1 } // the single whitespace byte terminating the header
        px <- if (bytes.length.toLong - i >= npx)
                Some(java.util.Arrays.copyOfRange(bytes, i, i + npx.toInt))
              else None
      } yield Image(w, h, px)
    }

    /** Block-average resize to side×side (integer-exact accumulation). */
    def resize(img: Image, side: Int): Array[Int] = {
      val out = new Array[Int](side * side)
      var by = 0
      while (by < side) {
        var bx = 0
        while (bx < side) {
          val y0 = by * img.height / side; val y1 = math.max(y0 + 1, (by + 1) * img.height / side)
          val x0 = bx * img.width / side;  val x1 = math.max(x0 + 1, (bx + 1) * img.width / side)
          var sum = 0L; var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { sum += img.pixels(y * img.width + x) & 0xff; n += 1; x += 1 }
            y += 1
          }
          out(by * side + bx) = (sum / n).toInt
          bx += 1
        }
        by += 1
      }
      out
    }

    /** 64-bit average hash: 8×8 block-resize, bit b set iff cell > mean.
      * Integer-exact (cell*64 > total avoids float mean ties).
      */
    def aHash(img: Image): Long = {
      val cells = resize(img, 8)
      val total = cells.map(_.toLong).sum
      cells.zipWithIndex.foldLeft(0L) { case (h, (c, b)) =>
        if (c.toLong * 64 > total) h | (1L << b) else h
      }
    }
  }

  /** Features of a decoded image; `decode_ok=false` rows carry nulls and
    * count toward the quarantine, never fail the job.
    */
  case class ImageFeatures(
      doc_id: Long, decode_ok: Boolean, width: Option[Int], height: Option[Int],
      mean_pixel: Option[Double], ahash: Option[Long])

  /** q61: real image pipeline over synthesized PGM payloads — encode the
    * document's UTF-8 bytes as a genuine P5 image (deterministic synth,
    * side = 8 + doc_id % 25, bytes tiled to fill), then in the extractor
    * REALLY decode the header + pixels, block-average-resize to 8×8 and
    * emit a 64-bit perceptual aHash. Every 97th payload is deliberately
    * truncated mid-pixel-data to exercise the corrupt-media quarantine.
    * Same mapPartitions shape as q42 (codec init at the iterator
    * boundary); rows-only + MultimodalSpec round-trip/corruption
    * properties.
    */
  def q61ImageFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[DocPayload]
      .mapPartitions { it =>
        it.map { p =>
          val side = 8 + (p.doc_id % 25).toInt
          val px = new Array[Byte](side * side) // zeros if the payload is empty
          var i = 0
          while (p.payload.nonEmpty && i < px.length) {
            px(i) = p.payload(i % p.payload.length); i += 1
          }
          val img = PgmCodec.encode(side, side, px)
          val payload = if (p.doc_id % 97 == 0) java.util.Arrays.copyOf(img, img.length / 2)
                        else img
          PgmCodec.decode(payload) match {
            case Some(d) =>
              val mean = d.pixels.map(b => (b & 0xff).toLong).sum.toDouble / d.pixels.length
              ImageFeatures(p.doc_id, decode_ok = true, Some(d.width), Some(d.height),
                Some(math.round(mean * 10000).toDouble / 10000), Some(PgmCodec.aHash(d)))
            case None =>
              ImageFeatures(p.doc_id, decode_ok = false, None, None, None, None)
          }
        }
      }
      .toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_binary_meta"     -> (q41BinaryMeta _),
    "q42_feature_extract" -> (q42FeatureExtract _),
    "q61_image_features"  -> (q61ImageFeatures _))

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
