package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** F-block: multimodal column plumbing — image/audio/video payloads as
  * opaque `binary` columns with typed metadata.
  *
  * Every decode step here is a REAL codec implemented in-repo: baseline
  * JPEG ([[JpegCodec]], entropy-coded — Huffman + DCT + 4:2:0), binary PGM
  * ([[PgmCodec]]), RIFF/PCM WAV ([[WavCodec]]) and a multi-frame PGM
  * container (q101). Payloads are synthesized from `documents.text` bytes
  * so the whole path stays deterministic and oracle-checkable where
  * possible. Remaining out of scope (declared): entropy-coded AUDIO/VIDEO
  * formats (MP3/H.264) — their decode pipelines would follow q92/q101's
  * exact plumbing shape with a different per-payload codec.
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

  // ---- q42: REAL entropy-coded image decode (baseline JPEG) ----

  /** Input record: opaque media payload. */
  case class DocPayload(doc_id: Long, payload: Array[Byte])

  /** Features of a decoded JPEG; decode_ok=false rows quarantine with
    * nulls, never fail the job.
    */
  case class JpegFeatures(
      doc_id: Long, decode_ok: Boolean, jpeg_bytes: Int, width: Option[Int],
      height: Option[Int], mean_luma: Option[Double], mean_r: Option[Int],
      mean_g: Option[Int], mean_b: Option[Int], ahash: Option[Long])

  /** q42: the entropy-coded image pipeline, REAL end to end — each
    * document's bytes become a deterministic RGB image (three phase-shifted
    * byte ramps, side 16 + doc_id % 17), encoded as a genuine 4:2:0 baseline
    * JPEG by [[JpegCodec.encodeColor420]] (FDCT → quantize → Huffman → byte
    * stuffing), then decoded back by the production path
    * [[JpegCodec.decode]] (marker/DHT/DQT parse → Huffman → dequantize →
    * IDCT → upsample → YCbCr→RGB) for luma/chroma stats and a perceptual
    * aHash of the decoded luma plane. Every 97th payload is truncated
    * mid-entropy-data → quarantine. `mapPartitions` so codec state (tables)
    * amortizes per partition, not per row; the corpus streams through
    * executors with zero driver involvement. JpegSpec cross-checks the
    * codec both ways against the JDK's independent javax.imageio. At 100 TB
    * the decode is embarrassingly parallel — cost scales with payload
    * bytes/partition, and `spark.sql.files.maxPartitionBytes` is the lever
    * that keeps a partition's decode time bounded.
    */
  def q42FeatureExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[DocPayload]
      .mapPartitions { it =>
        it.map { p =>
          val side = 16 + (p.doc_id % 17).toInt
          val rgb = Array.tabulate(side * side) { i =>
            def byteAt(k: Int): Int =
              if (p.payload.isEmpty) 0 else p.payload(k % p.payload.length) & 0xff
            (byteAt(i) << 16) | (byteAt(i + 7) << 8) | byteAt(i + 13)
          }
          val jpeg = JpegCodec.encodeColor420(side, side, rgb, quality = 85)
          val payload = if (p.doc_id % 97 == 0) java.util.Arrays.copyOf(jpeg, jpeg.length * 3 / 4)
                        else jpeg
          JpegCodec.decode(payload) match {
            case Some(d) =>
              val n = d.width * d.height
              var sumY = 0L; var sumR = 0L; var sumG = 0L; var sumB = 0L
              var i = 0
              while (i < n) {
                sumY += d.gray(i) & 0xff
                val px = d.rgb.get(i)
                sumR += (px >> 16) & 0xff; sumG += (px >> 8) & 0xff; sumB += px & 0xff
                i += 1
              }
              JpegFeatures(p.doc_id, decode_ok = true, payload.length,
                Some(d.width), Some(d.height),
                Some(math.round(sumY.toDouble / n * 10000).toDouble / 10000),
                Some((sumR / n).toInt), Some((sumG / n).toInt), Some((sumB / n).toInt),
                Some(PgmCodec.aHash(PgmCodec.Image(d.width, d.height, d.gray))))
            case None =>
              JpegFeatures(p.doc_id, decode_ok = false, payload.length,
                None, None, None, None, None, None, None)
          }
        }
      }
      .toDF()
  }

  // ---- q61: REAL image decode over a codec-free format (binary PGM) ----

  /** Minimal binary-PGM (netpbm P5) codec — a REAL image format parsed with
    * pure byte arithmetic, so the decode step needs no native codec at all.
    * Encode, header parse, pixel access, block-average resize and a 64-bit
    * average-hash (aHash) below are all genuine implementations; the
    * entropy-coded image path is likewise real via [[JpegCodec]] (q42).
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
    def decode(bytes: Array[Byte]): Option[Image] = decodeFrom(bytes, 0).map(_._1)

    /** [[decode]] starting at `offset`, also returning the position one
      * past the frame's last pixel byte. Containers of back-to-back frames
      * (q101) MUST advance by this returned cursor, not by re-encoding the
      * frame: the parser's whitespace grammar is more lenient than the
      * canonical encoder output, so a legal-but-non-canonical header would
      * otherwise desynchronize the walk. No tail copies either — parsing
      * is O(container size) total.
      */
    def decodeFrom(bytes: Array[Byte], offset: Int): Option[(Image, Int)] = {
      // header = magic, width, height, maxval as whitespace-separated
      // ASCII tokens; pixels follow the single whitespace after maxval
      var i = offset
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
      } yield (Image(w, h, px), i + npx.toInt)
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

    /** 64-bit DCT perceptual hash (the classic pHash): 32×32
      * block-average resize, separable 2-D DCT-II (only the 8×8
      * low-frequency block is computed — 2·32·32·8 multiplies, not the
      * full transform), bit b (row-major AC cell b = 1..63) set iff its
      * coefficient exceeds the UPPER MEDIAN of the 63 AC coefficients;
      * the DC cell (overall brightness) is excluded and bit 0 stays 0.
      * Brightness shifts (DC-only) and exact positive contrast scaling
      * (all coefficients scale together, order statistics unchanged)
      * leave it bit-identical — both spec-pinned. Low-frequency-only
      * additionally damps small local edits on spectrally rich content;
      * on spectrally DEGENERATE images (most AC coefficients tied at the
      * median — synthetic ramps, flat fields) individual bits are
      * tie-sensitive, which is why q197's near-dup claim rests on the
      * banding being EXACT at hamming ≤ 3, not on per-bit stability.
      * Double arithmetic in fixed order — deterministic per engine;
      * engine-native (no SQL mirror), like every perceptual hash here.
      */
    /** The 32×32 DCT cosine table — constant, hoisted out of [[pHash]]
      * (1024 transcendental calls per IMAGE on the corpus-scale decode
      * projection otherwise; review finding). Computed once per JVM. */
    private val PhCosT: Array[Array[Double]] = Array.tabulate(32, 32)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / 64))

    def pHash(img: Image): Long = {
      val n = 32
      val cells = resize(img, n)
      val cosT = PhCosT
      // rows pass: tmp(y)(u) for u < 8
      val tmp = Array.ofDim[Double](n, 8)
      var y = 0
      while (y < n) {
        var u = 0
        while (u < 8) {
          var acc = 0.0; var x = 0
          while (x < n) { acc += cells(y * n + x) * cosT(u)(x); x += 1 }
          tmp(y)(u) = acc; u += 1
        }
        y += 1
      }
      // cols pass: coeff(v)(u) for v, u < 8
      val coeff = new Array[Double](64)
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          var acc = 0.0; var yy = 0
          while (yy < n) { acc += tmp(yy)(u) * cosT(v)(yy); yy += 1 }
          coeff(v * 8 + u) = acc; u += 1
        }
        v += 1
      }
      // snap to 1e-6 (the repo-wide discipline): float jitter from
      // analytically-zero cosine sums (a brightness shift perturbs AC
      // coefficients by ~1e-12, never truly) must not flip a bit whose
      // coefficient ties the median — exact-invariance is spec-pinned
      var b = 0
      while (b < 64) { coeff(b) = math.rint(coeff(b) * 1e6) / 1e6; b += 1 }
      val ac = coeff.drop(1).sorted
      val median = ac(31) // upper median of 63 — no averaging, no ties logic
      (1 until 64).foldLeft(0L) { (h, bit) =>
        if (coeff(bit) > median) h | (1L << bit) else h
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

  /** Per-doc 64-bit pHash over the same deterministic PGM synth as q61
    * (side = 8 + doc_id % 25, text bytes tiled, every 97th payload
    * truncated); corrupt payloads decode to None and are DROPPED here —
    * a near-dup pair search has nothing to say about undecodable media
    * (q61's quarantine is where they are counted). Every 101st doc is
    * the CLONE lane ([[cloneLaneGroup]]): its pixels synthesize from a
    * group-canonical byte string shared by exactly TWO doc_ids, so the
    * pair pipeline has deterministic true positives at every SF — the
    * protocol's rows>0 proof, with clique size capped at 2 (never a
    * corpus-scale n² bucket). */
  private[graft] def phashOf(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[DocPayload]
      .mapPartitions { it =>
        it.flatMap { p =>
          val clone = cloneLaneGroup(p.doc_id)
          val side = clone.fold(8 + (p.doc_id % 25).toInt)(g => 8 + (g % 25).toInt)
          val bytes = clone.fold(p.payload)(g => s"graft-clone-image-$g".getBytes("UTF-8"))
          val px = new Array[Byte](side * side)
          var i = 0
          while (bytes.nonEmpty && i < px.length) {
            px(i) = bytes(i % bytes.length); i += 1
          }
          val img = PgmCodec.encode(side, side, px)
          val payload = if (p.doc_id % 97 == 0) java.util.Arrays.copyOf(img, img.length / 2)
                        else img
          PgmCodec.decode(payload).map(d => (p.doc_id, PgmCodec.pHash(d)))
        }
      }
      .toDF("doc_id", "phash")
  }

  /** The multimodal synths' deterministic CLONE lane: every 101st doc
    * renders from a canonical payload keyed by `doc_id / 101 / 2`, so
    * consecutive lane members (202 and 303, 404 and 505, …) are
    * byte-identical media — planted true positives that make the
    * q197/q198 pair pipelines protocol-visible (>0 rows) at every SF.
    * The group key pairs docs in cliques of AT MOST 2: at 100 TB the
    * lane adds O(corpus/101) trivially-confirmed pairs, never a
    * quadratic same-hash bucket. 101 is coprime to the corrupt lanes
    * (89, 97), so only the rare intersection multiples lose their pair
    * to quarantine (doc 0 does — its partner 101 simply goes unpaired). */
  private def cloneLaneGroup(docId: Long): Option[Long] =
    if (docId % 101 == 0) Some(docId / 101 / 2) else None

  /** q197: IMAGE near-dup pairs — the multimodal half of the dedup
    * brief's "embedding-cosine near-dup" family, on pixels instead of
    * embeddings: DCT pHash per image ([[PgmCodec.pHash]]), then the
    * EXACT hamming-band pair pipeline shared verbatim with text simhash
    * ([[Dedup.hammingPairs]] — pigeonhole-exact at hamming ≤ 3, no
    * hot-bucket cap, exchange = confirmed pairs only). At 100 TB the
    * expensive half is the decode+DCT projection, which is
    * embarrassingly parallel and shuffle-free; the pair exchange carries
    * one (long, long) row per CONFIRMED near-dup image pair. Rows-only
    * (perceptual hash, no SQL mirror); MultimodalSpec pins the kernel's
    * invariances and a planted near-dup pair.
    */
  def q197ImagePhashPairs(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame =
    imagePhashPairsOf(s, Tables.documents(s, dir), maxHamming)

  /** q197's body for ANY (doc_id, text) frame — the spec's planted-pair seam. */
  private[graft] def imagePhashPairsOf(s: SparkSession, docs: DataFrame,
      maxHamming: Int): DataFrame =
    Dedup.hammingPairs(phashOf(s, docs), maxHamming)

  // ---- q92: REAL audio decode over a codec-free format (RIFF/PCM WAV) ----

  /** Minimal RIFF/WAVE PCM codec — like [[PgmCodec]] for audio: 16-bit
    * mono PCM WAV is a pure byte-layout format (no entropy coding), so
    * encode, chunk-walking header parse and sample access below are all
    * genuine implementations. With this, image (PGM + baseline JPEG via
    * [[JpegCodec]]) and audio (WAV) all have REAL decode paths; only
    * entropy-coded audio/video (MP3/H.264) remains out of scope, declared.
    */
  private[graft] object WavCodec {
    private def u16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def u32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    /** Canonical 44-byte-header mono 16-bit PCM WAV — the total size is
      * known up front, so this writes straight into a fixed array. */
    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataSize = samples.length * 2
      val out = new Array[Byte](44 + dataSize)
      var i = 0
      def put(bs: Array[Byte]): Unit = { bs.foreach { b => out(i) = b; i += 1 } }
      put("RIFF".getBytes("US-ASCII")); put(u32(36 + dataSize))
      put("WAVE".getBytes("US-ASCII"))
      put("fmt ".getBytes("US-ASCII")); put(u32(16))
      put(u16(1) /* PCM */); put(u16(1) /* mono */)
      put(u32(sampleRate)); put(u32(sampleRate * 2))
      put(u16(2) /* block align */); put(u16(16) /* bits */)
      put("data".getBytes("US-ASCII")); put(u32(dataSize))
      samples.foreach { s => put(u16(s & 0xffff)) }
      out
    }

    final case class Audio(sampleRate: Int, samples: Array[Short])

    /** Chunk-walking parse: RIFF/WAVE container, then fmt and data chunks
      * in any order with unknown chunks skipped (real WAV files carry LIST/
      * INFO chunks). None for anything malformed or truncated — corrupt
      * media quarantines, never kills the job. Only PCM mono 16-bit is
      * accepted (the format this pipeline publishes).
      */
    def decode(bytes: Array[Byte]): Option[Audio] = {
      def rU16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
      def rU32(i: Int): Long =
        (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
          ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
      def tag(i: Int): String =
        if (i + 4 <= bytes.length) new String(bytes, i, 4, "US-ASCII") else ""
      if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var i = 12
      var fmtOk = false
      var sampleRate = 0
      var data: Option[Array[Short]] = None
      while (i + 8 <= bytes.length && (data.isEmpty || !fmtOk)) {
        val id = tag(i)
        val size = rU32(i + 4)
        if (size < 0 || size > Int.MaxValue || i + 8 + size > bytes.length)
          return None // truncated or lying chunk header
        val body = i + 8
        id match {
          case "fmt " =>
            if (size < 16) return None
            val (fmt, ch, bits) = (rU16(body), rU16(body + 2), rU16(body + 14))
            if (fmt != 1 || ch != 1 || bits != 16) return None
            val rate = rU32(body + 4)
            if (rate <= 0 || rate > 1000000) return None
            sampleRate = rate.toInt; fmtOk = true
          case "data" =>
            val n = (size / 2).toInt
            val out = new Array[Short](n)
            var j = 0
            while (j < n) { out(j) = rU16(body + 2 * j).toShort; j += 1 }
            data = Some(out)
          case _ => // skip unknown chunk (LIST, INFO, fact, ...)
        }
        i = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      if (fmtOk) data.map(Audio(sampleRate, _)) else None
    }

    /** Zero crossings: sign flips between consecutive samples (0 counts as
      * non-negative) — integer-exact. */
    def zeroCrossings(samples: Array[Short]): Int = {
      var n = 0; var i = 1
      while (i < samples.length) {
        if ((samples(i) < 0) != (samples(i - 1) < 0)) n += 1
        i += 1
      }
      n
    }
  }

  /** Decoded-audio features; decode_ok=false rows quarantine with nulls. */
  case class AudioFeatures(
      doc_id: Long, decode_ok: Boolean, sample_rate: Option[Int],
      n_samples: Option[Int], duration_ms: Option[Long], peak: Option[Int],
      rms_milli: Option[Long], zero_crossings: Option[Int])

  /** q92: real audio pipeline over synthesized PCM WAV payloads — the
    * document's UTF-8 bytes become a deterministic 16-bit mono waveform
    * (800 + doc_id % 800 samples at 8 kHz), RIFF-encoded, then REALLY
    * chunk-parsed back: duration, peak, RMS (millis, from an exact integer
    * Σs²) and zero-crossing count. Every 89th payload is truncated
    * mid-data to exercise the quarantine, and every 113th gets a LIST
    * chunk injected before `data` to prove the chunk walker skips foreign
    * chunks like real-world WAV tooling emits. Same mapPartitions shape as
    * q42/q61. Rows-only + MultimodalSpec codec properties.
    */
  /** 64-bit audio fingerprint — the Haitsma–Kalker energy-difference
    * family: the sample stream is cut into 65 equal windows, per-window
    * energy e(w) = Σ s² (exact int64), and bit b (0..63) is set iff
    * e(b) > e(b+1). The SIGN of consecutive energy differences is what
    * survives volume changes: an exact positive amplitude scale
    * multiplies every energy by the same factor, so every comparison —
    * and therefore the whole fingerprint — is bit-identical
    * (spec-pinned), while reordered/replaced content flips the
    * difference pattern. Integer-only, no FFT needed: the window-energy
    * envelope is the coarse spectral feature. Streams shorter than 65
    * samples fingerprint to 0 (no evidence), like q196's short docs.
    */
  private[graft] def audioFingerprint(samples: Array[Short]): Long = {
    val w = 65
    if (samples.length < w) return 0L
    val e = new Array[Long](w)
    var i = 0
    while (i < w) {
      // long multiply: i * length overflows Int32 past ~33M samples
      // (a one-hour 48 kHz mono stream is 172M) and the negative bound
      // would silently zero whole windows
      val lo = (i.toLong * samples.length / w).toInt
      val hi = ((i + 1).toLong * samples.length / w).toInt
      var acc = 0L; var j = lo
      while (j < hi) { acc += samples(j).toLong * samples(j).toLong; j += 1 }
      e(i) = acc; i += 1
    }
    (0 until 64).foldLeft(0L) { (h, b) => if (e(b) > e(b + 1)) h | (1L << b) else h }
  }

  /** Per-doc audio fingerprints over q92's deterministic WAV synth
    * (800 + doc_id % 800 samples from tiled text bytes; the q92 corrupt
    * lanes truncate/splice). Undecodable payloads DROP (q92's quarantine
    * counts them — a pair search has nothing to say about them). Every
    * 101st doc is the CLONE lane ([[cloneLaneGroup]]): waveform
    * synthesized from a group-canonical byte string shared by exactly
    * two doc_ids — deterministic protocol-visible pairs at every SF. */
  private[graft] def audioFingerprintsOf(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[DocPayload]
      .mapPartitions { it =>
        it.flatMap { p =>
          val clone = cloneLaneGroup(p.doc_id)
          val n = clone.fold(800 + (p.doc_id % 800).toInt)(g => 800 + (g % 800).toInt)
          val bytes = clone.fold(p.payload)(g => s"graft-clone-audio-$g".getBytes("UTF-8"))
          val samples = new Array[Short](n)
          var i = 0
          while (bytes.nonEmpty && i < n) {
            samples(i) = (((bytes(i % bytes.length) & 0xff) - 128) * 256).toShort
            i += 1
          }
          val wav = WavCodec.encode(8000, samples)
          val payload =
            if (p.doc_id % 89 == 0) java.util.Arrays.copyOf(wav, wav.length / 2)
            else wav
          WavCodec.decode(payload).map(a => (p.doc_id, audioFingerprint(a.samples)))
        }
      }
      .toDF("doc_id", "afp")
  }

  /** q198: AUDIO near-dup pairs — the third leg of the multimodal dedup
    * trio (text simhash q69, image pHash q197, audio here), through the
    * SAME exact hamming-band pair pipeline ([[Dedup.hammingPairs]],
    * pigeonhole-exact at hamming ≤ 3). Decode + fingerprint is a
    * shuffle-free projection; the exchange carries confirmed pairs only.
    * Rows-only (perceptual fingerprint; MultimodalSpec pins the kernel
    * invariances and a planted identical-synth pair).
    */
  def q198AudioFingerprintPairs(s: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame =
    audioPairsOf(s, Tables.documents(s, dir), maxHamming)

  /** q198's body for ANY (doc_id, text) frame — the spec's planted-pair seam. */
  private[graft] def audioPairsOf(s: SparkSession, docs: DataFrame,
      maxHamming: Int): DataFrame =
    Dedup.hammingPairs(audioFingerprintsOf(s, docs), maxHamming)

  def q92AudioFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[DocPayload]
      .mapPartitions { it =>
        it.map { p =>
          val n = 800 + (p.doc_id % 800).toInt
          val samples = new Array[Short](n)
          var i = 0
          while (p.payload.nonEmpty && i < n) {
            samples(i) = (((p.payload(i % p.payload.length) & 0xff) - 128) * 256).toShort
            i += 1
          }
          val wav = WavCodec.encode(8000, samples)
          val payload =
            if (p.doc_id % 89 == 0) java.util.Arrays.copyOf(wav, wav.length / 2)
            else if (p.doc_id % 113 == 0) {
              // splice a LIST chunk between fmt and data (offset 36)
              val list = "LIST".getBytes("US-ASCII") ++
                Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
              val out = new Array[Byte](wav.length + list.length)
              System.arraycopy(wav, 0, out, 0, 36)
              System.arraycopy(list, 0, out, 36, list.length)
              System.arraycopy(wav, 36, out, 36 + list.length, wav.length - 36)
              // patch the RIFF size field for the extra bytes
              val newSize = (wav.length - 8) + list.length
              out(4) = (newSize & 0xff).toByte; out(5) = ((newSize >> 8) & 0xff).toByte
              out(6) = ((newSize >> 16) & 0xff).toByte; out(7) = ((newSize >> 24) & 0xff).toByte
              out
            } else wav
          WavCodec.decode(payload) match {
            case Some(a) =>
              var sumSq = 0L
              a.samples.foreach(s0 => sumSq += s0.toLong * s0.toLong)
              val rms = if (a.samples.isEmpty) 0L
                else math.round(math.sqrt(sumSq.toDouble / a.samples.length) * 1000)
              AudioFeatures(p.doc_id, decode_ok = true, Some(a.sampleRate),
                Some(a.samples.length),
                Some(a.samples.length * 1000L / a.sampleRate),
                Some(a.samples.foldLeft(0)((m, s0) => math.max(m, math.abs(s0.toInt)))),
                Some(rms), Some(WavCodec.zeroCrossings(a.samples)))
            case None =>
              AudioFeatures(p.doc_id, decode_ok = false, None, None, None, None, None, None)
          }
        }
      }
      .toDF()
  }

  // ---- q150: entropy-coded LOSSLESS audio (FLAC subset) ----

  /** Decoded-FLAC features; decode_ok=false rows quarantine with nulls. */
  case class FlacFeatures(
      doc_id: Long, decode_ok: Boolean, md5_ok: Option[Boolean],
      sample_rate: Option[Int], n_samples: Option[Int], peak: Option[Int],
      zero_crossings: Option[Int], compression_bp: Option[Long])

  /** q150: the entropy-coded audio pipeline, REAL end to end — the
    * document's bytes become a deterministic 16-bit waveform (q92's synth,
    * smoothed so fixed predictors bite), compressed to a genuine FLAC
    * stream by [[FlacCodec.encode]] (fixed linear predictors +
    * Rice-coded residuals, CRC-8/16, STREAMINFO MD5) and decoded back by
    * the production path [[FlacCodec.decode]] — which, FLAC being
    * lossless, must reproduce every sample BIT-EXACTLY and re-verify the
    * stream's own MD5 (`md5_ok`). Every 83rd payload is truncated
    * mid-frame → quarantine. `compression_bp` records the achieved ratio
    * in basis points of raw PCM. With q42 (JPEG) this closes entropy-coded
    * decode for image AND audio; only perceptual-transform codecs
    * (MP3/H.264) stay declared out of scope. Same mapPartitions shape and
    * 100 TB scaling argument as q42/q92.
    */
  def q150FlacAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[DocPayload]
      .mapPartitions { it =>
        it.map { p =>
          val n = 1000 + (p.doc_id % 1000).toInt
          val samples = new Array[Short](n)
          var acc = 0
          var i = 0
          while (p.payload.nonEmpty && i < n) {
            // integrate the byte stream: a smooth-ish signal with real
            // structure, so prediction + rice coding actually compress
            acc += (p.payload(i % p.payload.length) & 0xff) - 128
            samples(i) = math.max(Short.MinValue, math.min(Short.MaxValue, acc * 7)).toShort
            i += 1
          }
          val flac = FlacCodec.encode(8000, samples)
          val payload = if (p.doc_id % 83 == 0) java.util.Arrays.copyOf(flac, flac.length * 2 / 3)
                        else flac
          FlacCodec.decode(payload) match {
            case Some(a) =>
              FlacFeatures(p.doc_id, decode_ok = true, Some(a.md5Ok),
                Some(a.sampleRate), Some(a.samples.length),
                Some(a.samples.foldLeft(0)((m, s0) => math.max(m, math.abs(s0.toInt)))),
                Some(WavCodec.zeroCrossings(a.samples)),
                Some(payload.length.toLong * 10000 / math.max(1, a.samples.length * 2)))
            case None =>
              FlacFeatures(p.doc_id, decode_ok = false, None, None, None, None, None, None)
          }
        }
      }
      .toDF()
  }

  // ---- q101: video-style frame sampling over a multi-frame container ----

  /** Features of a sampled frame sequence; decode_ok=false quarantines. */
  case class FrameFeatures(
      doc_id: Long, decode_ok: Boolean, n_frames: Option[Int],
      n_sampled: Option[Int], first_ahash: Option[Long],
      mean_frame_diff_milli: Option[Long], n_scene_changes: Option[Int])

  /** Parse a container of back-to-back P5 frames: repeatedly decode one
    * PGM at the cursor and advance to the position the PARSER consumed
    * (not a re-encoded canonical length — see [[PgmCodec.decodeFrom]]).
    * Any malformed frame fails the whole payload (quarantine, not partial
    * results). */
  private[graft] def parseFrames(bytes: Array[Byte]): Option[Vector[PgmCodec.Image]] = {
    var i = 0
    val out = Vector.newBuilder[PgmCodec.Image]
    var n = 0
    while (i < bytes.length) {
      PgmCodec.decodeFrom(bytes, i) match {
        case Some((img, end)) =>
          out += img
          n += 1
          i = end
        case None => return None
      }
    }
    if (n > 0) Some(out.result()) else None
  }

  /** q101: frame sampling — the video half of the multimodal brief: each
    * payload is a REAL multi-frame container (3–12 concatenated binary-PGM
    * frames synthesized from the document bytes, with a hard scene cut at
    * the midpoint: second-half frames shift brightness by exactly 128 mod
    * 256, so the cross-cut per-pixel delta is exactly 128 and within-scene
    * deltas are 0), parsed frame-by-frame with the genuine PGM codec. The
    * extractor samples every 2nd frame (the decode-cost lever of any video
    * pipeline: sampled frames are the only ones whose pixels are touched
    * downstream), emits the first sampled frame's aHash, the mean
    * inter-sampled-frame pixel delta (millis) and a scene-change count
    * (delta > 32) — exactly 1 by construction, which the spec asserts.
    * Every 101st payload is truncated mid-frame → whole-payload
    * quarantine. Same mapPartitions shape as q42/q61/q92; rows-only +
    * MultimodalSpec container/sampling specs.
    */
  def q101FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sampleEvery = 2
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[DocPayload]
      .mapPartitions { it =>
        it.map { p =>
          val nFrames = 3 + (p.doc_id % 10).toInt
          val side = 8 + (p.doc_id % 9).toInt
          val frames = (0 until nFrames).map { f =>
            val px = new Array[Byte](side * side)
            var i = 0
            while (i < px.length) {
              val base = if (p.payload.isEmpty) 0 else p.payload(i % p.payload.length) & 0xff
              // scene cut: |((b+128) mod 256) − b| = 128 for every byte
              val shift = if (f >= nFrames / 2) 128 else 0
              px(i) = (((base + shift) % 256) & 0xff).toByte
              i += 1
            }
            PgmCodec.encode(side, side, px)
          }
          val container = frames.flatten.toArray
          val payload =
            if (p.doc_id % 101 == 0) java.util.Arrays.copyOf(container, container.length - side)
            else container
          parseFrames(payload) match {
            case Some(fs) =>
              val sampled = fs.zipWithIndex.collect {
                case (f, i) if i % sampleEvery == 0 => f
              }
              val diffs = sampled.sliding(2).collect { case Seq(a, b) =>
                val len = math.min(a.pixels.length, b.pixels.length)
                var sum = 0L
                var i = 0
                while (i < len) {
                  sum += math.abs((a.pixels(i) & 0xff) - (b.pixels(i) & 0xff)); i += 1
                }
                sum * 1000 / len
              }.toSeq
              FrameFeatures(p.doc_id, decode_ok = true, Some(fs.length),
                Some(sampled.length), Some(PgmCodec.aHash(sampled.head)),
                Some(if (diffs.isEmpty) 0L else diffs.sum / diffs.length),
                Some(diffs.count(_ > 32000)))
            case None =>
              FrameFeatures(p.doc_id, decode_ok = false, None, None, None, None, None)
          }
        }
      }
      .toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q197_image_phash_pairs" -> ((s: SparkSession, d: String) => q197ImagePhashPairs(s, d)),
    "q198_audio_fp_pairs" -> ((s: SparkSession, d: String) => q198AudioFingerprintPairs(s, d)),
    "q41_binary_meta"     -> (q41BinaryMeta _),
    "q42_feature_extract" -> (q42FeatureExtract _),
    "q61_image_features"  -> (q61ImageFeatures _),
    "q92_audio_features"  -> (q92AudioFeatures _),
    "q101_frame_sample"   -> (q101FrameSample _),
    "q150_flac_audio"     -> (q150FlacAudio _))

  /** q42 is rows-only because the real JPEG codec pipeline (JpegCodec
    * encode → decode → pixel features) has no SQL mirror; q41's metadata
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
