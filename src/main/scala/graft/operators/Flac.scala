package graft.operators

/** FLAC subset codec (xiph.org's public format spec) in pure Scala — the
  * entropy-coded AUDIO companion of [[JpegCodec]]: Rice/Golomb residual
  * coding under fixed linear predictors, big-endian bitstream, UTF-8-style
  * frame numbering, CRC-8 header / CRC-16 frame integrity, STREAMINFO with
  * the decoded-audio MD5. Unlike JPEG the codec is LOSSLESS, so the spec
  * can assert BIT-EXACT sample round-trips (and the STREAMINFO MD5 gives
  * an objective in-format integrity anchor: the decoder recomputes it from
  * decoded samples).
  *
  * Scope: 16-bit mono streams. Encoder emits fixed predictors (order 0–2,
  * chosen per frame by residual magnitude) with single-partition Rice
  * residuals; the decoder additionally handles verbatim/constant
  * subframes, fixed orders 0–4, LPC subframes, multi-partition residuals,
  * Rice escapes and wasted bits — i.e. a superset of what our encoder
  * emits, per the format spec. Violated CRCs, bad sync or out-of-scope
  * shapes (stereo, non-16-bit) → None, the multimodal quarantine contract.
  */
private[graft] object FlacCodec {

  // ---- CRCs (format-specified polynomials) ----

  private val Crc8Tab: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var b = 0
      while (b < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; b += 1 }
      t(i) = c
      i += 1
    }
    t
  }

  private val Crc16Tab: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var b = 0
      while (b < 8) {
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff
        b += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc8Tab(c ^ (bytes(i) & 0xff)); i += 1 }
    c
  }

  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = (Crc16Tab(((c >> 8) ^ (bytes(i) & 0xff)) & 0xff) ^ (c << 8)) & 0xffff; i += 1 }
    c
  }

  // ---- big-endian bit I/O ----

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var n = 0
    def bits(v: Long, width: Int): Unit = {
      acc = (acc << width) | (v & ((1L << width) - 1))
      n += width
      while (n >= 8) { out.write(((acc >>> (n - 8)) & 0xff).toInt); n -= 8 }
      acc &= (1L << n) - 1
    }
    def unary(q: Int): Unit = { var i = 0; while (i < q) { bits(0, 1); i += 1 }; bits(1, 1) }
    def align(): Unit = if (n > 0) bits(0, 8 - n)
    def toArray: Array[Byte] = { align(); out.toByteArray }
  }

  private final class CorruptFlac extends RuntimeException(null, null, false, false)
  private def corrupt(): Nothing = throw new CorruptFlac

  private final class BitReader(bytes: Array[Byte], var bytePos: Int) {
    private var bitPos = 0
    def atByteBoundary: Boolean = bitPos == 0
    def pos: Int = bytePos
    def bit(): Int = {
      if (bytePos >= bytes.length) corrupt()
      val b = (bytes(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }
    def bits(width: Int): Long = {
      var v = 0L
      var i = 0
      while (i < width) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def signedBits(width: Int): Int = {
      val v = bits(width)
      val sign = 1L << (width - 1)
      (if ((v & sign) != 0) v - (1L << width) else v).toInt
    }
    def unary(): Int = {
      var q = 0
      while (bit() == 0) { q += 1; if (q > (1 << 24)) corrupt() }
      q
    }
    def align(): Unit = while (bitPos != 0) bit(): Unit
  }

  // ---- encoder ----

  private def wU16be(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }
  private def wU24be(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 16) & 0xff); wU16be(o, v & 0xffff)
  }

  /** UTF-8-style coded number (the frame-number coding; ≤ 3 bytes covers
    * the frame counts this library synthesizes; format allows up to 7). */
  private def codedNumber(bw: BitWriter, v: Long): Unit =
    if (v < 0x80) bw.bits(v, 8)
    else if (v < 0x800) { bw.bits(0xc0 | (v >> 6), 8); bw.bits(0x80 | (v & 0x3f), 8) }
    else { bw.bits(0xe0 | (v >> 12), 8); bw.bits(0x80 | ((v >> 6) & 0x3f), 8); bw.bits(0x80 | (v & 0x3f), 8) }

  private val BlockSize = 4096

  /** Encode 16-bit mono PCM as a FLAC stream: fLaC magic, STREAMINFO (with
    * the spec's MD5 of the little-endian sample bytes), then fixed-
    * blocksize frames with the best fixed predictor (order 0–2) and
    * single-partition Rice residuals.
    */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20))
    val o = new java.io.ByteArrayOutputStream()
    o.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO: last-metadata-block, type 0, 34 bytes
    o.write(0x80); wU24be(o, 34)
    val si = new BitWriter
    si.bits(BlockSize, 16); si.bits(BlockSize, 16) // min/max blocksize
    si.bits(0, 24); si.bits(0, 24)                 // min/max framesize (unknown)
    si.bits(sampleRate, 20)
    si.bits(0, 3)  // channels - 1 (mono)
    si.bits(15, 5) // bits per sample - 1
    si.bits(samples.length.toLong, 36)
    val md5 = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val le = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        le(2 * i) = (samples(i) & 0xff).toByte
        le(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      d.digest(le)
    }
    val siBytes = si.toArray
    o.write(siBytes, 0, siBytes.length)
    o.write(md5, 0, 16)
    // zero samples → zero frames (STREAMINFO already says total=0)
    var frameNo = 0L
    var off = 0
    while (off < samples.length) {
      val n = math.min(BlockSize, samples.length - off)
      encodeFrame(o, sampleRate, samples, off, n, frameNo)
      off += n
      frameNo += 1
    }
    o.toByteArray
  }

  private def encodeFrame(o: java.io.ByteArrayOutputStream, sampleRate: Int,
      samples: Array[Short], off: Int, n: Int, frameNo: Long): Unit = {
    val bw = new BitWriter
    bw.bits(0x3ffe, 14) // sync
    bw.bits(0, 1)  // reserved
    bw.bits(0, 1)  // fixed blocksize strategy
    bw.bits(0x7, 4)   // blocksize: 16-bit value-1 at header end
    bw.bits(0x0, 4)   // sample rate: from STREAMINFO
    bw.bits(0x0, 4)   // channel assignment: mono
    bw.bits(0x4, 3)   // sample size: 16 bits
    bw.bits(0, 1)  // reserved
    codedNumber(bw, frameNo)
    bw.bits((n - 1).toLong, 16)
    val headerSoFar = bw.toArray // align() is a no-op: all fields byte-aligned here
    val head = new java.io.ByteArrayOutputStream()
    head.write(headerSoFar, 0, headerSoFar.length)
    head.write(crc8(headerSoFar, 0, headerSoFar.length))
    // ---- subframe: best fixed predictor of order 0..2 ----
    val x = new Array[Int](n)
    var i = 0
    while (i < n) { x(i) = samples(off + i).toInt; i += 1 }
    def residual(order: Int): Array[Int] = {
      val r = new Array[Int](n - order)
      var j = order
      while (j < n) {
        r(j - order) = order match {
          case 0 => x(j)
          case 1 => x(j) - x(j - 1)
          case 2 => x(j) - 2 * x(j - 1) + x(j - 2)
        }
        j += 1
      }
      r
    }
    val candidates = (0 to math.min(2, n - 1)).map(ord => ord -> residual(ord))
    val (order, res) = candidates.minBy { case (_, r) => r.foldLeft(0L)((a, v) => a + math.abs(v.toLong)) }
    val sub = new BitWriter
    sub.bits(0, 1)                     // zero pad
    sub.bits(0x08L | order.toLong, 6)  // fixed subframe, order
    sub.bits(0, 1)                     // no wasted bits
    var w = 0
    while (w < order) { sub.bits(x(w).toLong & 0xffff, 16); w += 1 } // warmup (signed 16)
    // residual: rice method 0, partition order 0, one parameter
    sub.bits(0, 2)
    sub.bits(0, 4)
    val k = bestRiceParam(res)
    sub.bits(k.toLong, 4)
    res.foreach { v =>
      val u = (v << 1) ^ (v >> 31) // zigzag
      sub.unary(u >>> k)
      if (k > 0) sub.bits(u.toLong & ((1L << k) - 1), k)
    }
    val subBytes = sub.toArray // align-padded to byte per spec
    head.write(subBytes, 0, subBytes.length)
    val frameBytes = head.toByteArray
    o.write(frameBytes, 0, frameBytes.length)
    wU16be(o, crc16(frameBytes, 0, frameBytes.length))
  }

  private def bestRiceParam(res: Array[Int]): Int = {
    var best = 0
    var bestBits = Long.MaxValue
    var k = 0
    while (k <= 14) {
      var total = 0L
      var i = 0
      while (i < res.length) {
        val u = ((res(i) << 1) ^ (res(i) >> 31)) & 0xffffffffL
        total += (u >>> k) + 1 + k
        i += 1
      }
      if (total < bestBits) { bestBits = total; best = k }
      k += 1
    }
    best
  }

  // ---- decoder ----

  final case class Audio(sampleRate: Int, samples: Array[Short], md5Ok: Boolean)

  /** Decode a 16-bit mono FLAC stream; None for anything malformed,
    * CRC-violating or out of scope. The returned `md5Ok` compares the
    * STREAMINFO MD5 against the decoded audio — the format's own
    * end-to-end integrity check.
    */
  def decode(bytes: Array[Byte]): Option[Audio] =
    try decodeOrThrow(bytes)
    catch { case _: CorruptFlac | _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None }

  private def decodeOrThrow(bytes: Array[Byte]): Option[Audio] = {
    if (bytes.length < 42 || new String(bytes, 0, 4, "US-ASCII") != "fLaC") return None
    var p = 4
    var sampleRate = 0
    var totalSamples = 0L
    var streamMd5: Array[Byte] = null
    var last = false
    var sawStreamInfo = false
    while (!last) {
      if (p + 4 > bytes.length) corrupt()
      last = (bytes(p) & 0x80) != 0
      val tpe = bytes(p) & 0x7f
      val len = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      p += 4
      if (p + len > bytes.length) corrupt()
      if (tpe == 0) {
        if (len != 34) corrupt()
        val r = new BitReader(bytes, p)
        r.bits(16); r.bits(16); r.bits(24); r.bits(24)
        sampleRate = r.bits(20).toInt
        val channels = r.bits(3).toInt + 1
        val bps = r.bits(5).toInt + 1
        if (channels != 1 || bps != 16) return None // out of scope, declared
        totalSamples = r.bits(36)
        streamMd5 = java.util.Arrays.copyOfRange(bytes, p + 18, p + 34)
        sawStreamInfo = true
      }
      p += len
    }
    if (!sawStreamInfo || sampleRate == 0) corrupt()
    if (totalSamples > (1L << 26)) corrupt() // bound the allocation
    val out = new Array[Short](totalSamples.toInt)
    var got = 0
    while (got < totalSamples) {
      val (cnt, nextP) = decodeFrame(bytes, p, sampleRate, out, got)
      got += cnt
      p = nextP
    }
    val md5 = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val le = new Array[Byte](out.length * 2)
      var i = 0
      while (i < out.length) {
        le(2 * i) = (out(i) & 0xff).toByte
        le(2 * i + 1) = ((out(i) >> 8) & 0xff).toByte
        i += 1
      }
      d.digest(le)
    }
    Some(Audio(sampleRate, out, java.util.Arrays.equals(md5, streamMd5)))
  }

  /** One frame → (samples decoded, next byte position). */
  private def decodeFrame(bytes: Array[Byte], start: Int, siRate: Int,
      out: Array[Short], outOff: Int): (Int, Int) = {
    val r = new BitReader(bytes, start)
    if (r.bits(14) != 0x3ffe) corrupt()
    r.bits(1) // reserved
    r.bits(1) // blocking strategy
    val bsCode = r.bits(4).toInt
    val srCode = r.bits(4).toInt
    val chan = r.bits(4).toInt
    val ssCode = r.bits(3).toInt
    r.bits(1)
    if (chan != 0) corrupt()            // mono only
    if (ssCode != 0x4) corrupt()        // 16-bit only
    // coded frame/sample number: UTF-8-style, up to 7 bytes
    val first = r.bits(8).toInt
    val extra = if (first < 0x80) 0
      else if ((first & 0xe0) == 0xc0) 1
      else if ((first & 0xf0) == 0xe0) 2
      else if ((first & 0xf8) == 0xf0) 3
      else if ((first & 0xfc) == 0xf8) 4
      else if ((first & 0xfe) == 0xfc) 5
      else if (first == 0xfe) 6
      else corrupt()
    var e = 0
    while (e < extra) { if ((r.bits(8).toInt & 0xc0) != 0x80) corrupt(); e += 1 }
    val blockSize = bsCode match {
      case 0x0 => corrupt()
      case 0x1 => 192
      case c if c >= 0x2 && c <= 0x5 => 576 << (c - 2)
      case 0x6 => r.bits(8).toInt + 1
      case 0x7 => r.bits(16).toInt + 1
      case c => 256 << (c - 8)
    }
    srCode match {
      case 0x0 => () // from STREAMINFO
      case 0xc => r.bits(8): Unit   // kHz
      case 0xd | 0xe => r.bits(16): Unit
      case 0xf => corrupt()
      case _ => () // table codes carry no extra bits
    }
    // CRC-8 over the header bytes (we're byte-aligned here by construction)
    if (!r.atByteBoundary) corrupt()
    val headerEnd = r.pos
    val expectedCrc8 = r.bits(8).toInt
    if (crc8(bytes, start, headerEnd) != expectedCrc8) corrupt()
    if (outOff + blockSize > out.length) corrupt()
    decodeSubframe(r, blockSize, out, outOff)
    r.align()
    val frameEnd = r.pos
    val expectedCrc16 = r.bits(16).toInt
    if (crc16(bytes, start, frameEnd) != expectedCrc16) corrupt()
    (blockSize, r.pos)
  }

  private def decodeSubframe(r: BitReader, n: Int, out: Array[Short], off: Int): Unit = {
    if (r.bit() != 0) corrupt() // padding bit
    val tpe = r.bits(6).toInt
    val wastedFlag = r.bit()
    val wasted = if (wastedFlag == 1) r.unary() + 1 else 0
    val bps = 16 - wasted
    val x = new Array[Int](n)
    tpe match {
      case 0x00 => // constant
        val v = r.signedBits(bps)
        java.util.Arrays.fill(x, v)
      case 0x01 => // verbatim
        var i = 0
        while (i < n) { x(i) = r.signedBits(bps); i += 1 }
      case t if (t & 0x38) == 0x08 && (t & 0x07) <= 4 => // fixed, order 0..4
        val order = t & 0x07
        var i = 0
        while (i < order) { x(i) = r.signedBits(bps); i += 1 }
        val res = readResidual(r, n, order)
        i = order
        while (i < n) {
          val pred = order match {
            case 0 => 0
            case 1 => x(i - 1)
            case 2 => 2 * x(i - 1) - x(i - 2)
            case 3 => 3 * x(i - 1) - 3 * x(i - 2) + x(i - 3)
            case 4 => 4 * x(i - 1) - 6 * x(i - 2) + 4 * x(i - 3) - x(i - 4)
          }
          x(i) = res(i - order) + pred
          i += 1
        }
      case t if (t & 0x20) == 0x20 => // LPC, order 1..32
        val order = (t & 0x1f) + 1
        var i = 0
        while (i < order) { x(i) = r.signedBits(bps); i += 1 }
        val precision = r.bits(4).toInt + 1
        if (precision == 16) corrupt() // 0b1111 is invalid per spec
        val shift = r.signedBits(5)
        if (shift < 0) corrupt()
        val coefs = Array.fill(order)(r.signedBits(precision))
        val res = readResidual(r, n, order)
        i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * x(i - 1 - j); j += 1 }
          x(i) = res(i - order) + (acc >> shift).toInt
          i += 1
        }
      case _ => corrupt()
    }
    var i = 0
    while (i < n) {
      val v = x(i) << wasted
      if (v < Short.MinValue || v > Short.MaxValue) corrupt()
      out(off + i) = v.toShort
      i += 1
    }
  }

  private def readResidual(r: BitReader, blockSize: Int, order: Int): Array[Int] = {
    val method = r.bits(2).toInt
    if (method > 1) corrupt()
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    val partOrder = r.bits(4).toInt
    val parts = 1 << partOrder
    if (blockSize % parts != 0) corrupt()
    val res = new Array[Int](blockSize - order)
    var idx = 0
    var pi = 0
    while (pi < parts) {
      val count = (blockSize >> partOrder) - (if (pi == 0) order else 0)
      if (count < 0) corrupt()
      val param = r.bits(paramBits).toInt
      if (param == escape) {
        val raw = r.bits(5).toInt
        var i = 0
        while (i < count) { res(idx) = if (raw == 0) 0 else r.signedBits(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary()
          val u = ((q.toLong << param) | r.bits(param)) & 0xffffffffL
          res(idx) = ((u >>> 1) ^ -(u & 1L)).toInt
          idx += 1
          i += 1
        }
      }
      pi += 1
    }
    res
  }
}
