package graft.operators

/** Baseline JPEG codec (ITU-T T.81) in pure Scala — no native libraries.
  *
  * This closes the one declared stub in the multimodal block: entropy-coded
  * image decode. Everything here is implemented from the public standard:
  * canonical Huffman coding (Annex C/F), the zig-zag order and Annex K
  * quantization/Huffman tables, separable 8×8 DCT-II/III, 4:2:0 chroma
  * subsampling with box downsample / replication upsample, byte stuffing and
  * DRI/RSTn restart markers. The encoder exists so tests and the q42 pipeline
  * can synthesize REAL JPEG payloads deterministically; the decoder is the
  * production path. `JpegSpec` cross-checks both directions against the JDK's
  * independent `javax.imageio` codec (our encode → ImageIO decode, ImageIO
  * encode → our decode), so this is not a codec that merely round-trips with
  * itself.
  *
  * Scope: baseline sequential DCT (SOF0), 8-bit precision, 1 (grayscale) or
  * 3 (YCbCr) components, any sampling factors on decode (1×1 … 2×2 tested),
  * grayscale + 4:2:0 on encode. Progressive (SOF2) and arithmetic coding are
  * rejected → quarantine, like every other malformed payload: `decode`
  * returns None, it never throws.
  */
private[graft] object JpegCodec {

  /** Natural (row-major) index at each zig-zag position (T.81 Figure 5). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ---- Annex K.1 base quantization tables (natural order) ----

  private val BaseQuantLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val BaseQuantChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** IJG quality scaling: 1..100 → scaled table, each entry clamped to
    * [1, 255] (8-bit DQT precision).
    */
  private def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  // ---- Annex K.3 typical Huffman tables (encoder side only: the decoder
  // always builds its tables from the DHT segments in the stream) ----

  private val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).map(_.toByte).toArray
  private val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).map(_.toByte).toArray

  private val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcLumaVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)
  private val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private val AcChromaVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)

  // ---- canonical Huffman code construction (T.81 Annex C) ----

  /** Encoder table: code word + length per symbol value. `bits` is 1-based
    * (bits(l) = number of codes of length l, l ∈ 1..16).
    */
  private final class HuffEncTable(bits: Array[Int], vals: Array[Byte]) {
    val code = new Array[Int](256)
    val size = new Array[Int](256)
    locally {
      var c = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l)) {
          val sym = vals(k) & 0xff
          code(sym) = c
          size(sym) = l
          c += 1; k += 1; i += 1
        }
        c <<= 1
        l += 1
      }
    }
  }

  /** Decoder table: mincode/maxcode/valptr per length (T.81 F.2.2.3). */
  private final class HuffDecTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    val values: Array[Byte] = vals
    locally {
      var c = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valPtr(l) = k
          minCode(l) = c
          c += bits(l); k += bits(l)
          maxCode(l) = c - 1
        } else maxCode(l) = -1
        c <<= 1
        l += 1
      }
    }
  }

  /** Corrupt-stream signal: caught at the decode() boundary → None. */
  private final class CorruptJpeg extends RuntimeException(null, null, false, false)
  private def corrupt(): Nothing = throw new CorruptJpeg

  // ---- DCT (separable double-precision DCT-II / DCT-III) ----

  private val CosTab: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) { t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16); u += 1 }
      x += 1
    }
    t
  }
  private val C0 = 1.0 / math.sqrt(2.0)

  /** Forward DCT of one level-shifted 8×8 block (in natural order), with the
    * 1/4 C(u)C(v) normalization folded in. Separable: rows then columns.
    */
  private def fdct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // transform rows
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += block(y * 8 + x) * CosTab(x * 8 + u); x += 1 }
        tmp(y * 8 + u) = s * (if (u == 0) C0 else 1.0) / 2
        u += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) { // transform columns
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * CosTab(yy * 8 + v); yy += 1 }
        out(v * 8 + u) = s * (if (v == 0) C0 else 1.0) / 2
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse DCT of one dequantized 8×8 block (natural order) → spatial
    * samples still centered on 0 (caller adds the +128 level shift).
    */
  private def idct(coef: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) { // inverse-transform columns
      var y = 0
      while (y < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += (if (v == 0) C0 else 1.0) * coef(v * 8 + u) * CosTab(y * 8 + v); v += 1 }
        tmp(y * 8 + u) = s / 2
        y += 1
      }
      u += 1
    }
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) { // inverse-transform rows
      var x = 0
      while (x < 8) {
        var s = 0.0
        var uu = 0
        while (uu < 8) { s += (if (uu == 0) C0 else 1.0) * tmp(y * 8 + uu) * CosTab(x * 8 + uu); uu += 1 }
        out(y * 8 + x) = s / 2
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- bit I/O with byte stuffing ----

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def writeBits(code: Int, size: Int): Unit = {
      acc = (acc << size) | (code & ((1 << size) - 1))
      nBits += size
      while (nBits >= 8) {
        val b = (acc >>> (nBits - 8)) & 0xff
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nBits -= 8
      }
      acc &= (1 << nBits) - 1
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (nBits > 0) writeBits((1 << (8 - nBits)) - 1, 8 - nBits)
    def writeRawByte(b: Int): Unit = { flush(); out.write(b & 0xff) }
    def toArray: Array[Byte] = out.toByteArray
  }

  /** Entropy-segment reader: un-stuffs FF00, stops at any real marker.
    * Running past the end of data or into a marker mid-symbol → corrupt.
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    private var atMarker = false
    private def fill(): Unit = {
      if (atMarker || pos >= bytes.length) corrupt()
      val b = bytes(pos) & 0xff
      if (b == 0xff) {
        if (pos + 1 >= bytes.length) corrupt()
        val nxt = bytes(pos + 1) & 0xff
        if (nxt == 0x00) { pos += 2; acc = (acc << 8) | 0xff; nBits += 8 }
        else { atMarker = true; corrupt() } // marker mid-symbol: truncated MCU data
      } else { pos += 1; acc = (acc << 8) | b; nBits += 8 }
    }
    def readBit(): Int = {
      if (nBits == 0) fill()
      nBits -= 1
      (acc >>> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def decodeHuff(t: HuffDecTable): Int = {
      var code = readBit()
      var l = 1
      while (t.maxCode(l) < code || t.maxCode(l) == -1) {
        l += 1
        if (l > 16) corrupt()
        code = (code << 1) | readBit()
      }
      t.values(t.valPtr(l) + code - t.minCode(l)) & 0xff
    }
    /** Byte-align and consume the expected RSTn marker (T.81 E.2.4). */
    def restart(expected: Int): Unit = {
      nBits = 0; acc = 0
      if (pos + 1 >= bytes.length || (bytes(pos) & 0xff) != 0xff ||
        (bytes(pos + 1) & 0xff) != (0xd0 + expected)) corrupt()
      pos += 2
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  // =====================================================================
  // Encoder
  // =====================================================================

  /** One component plane prepared for encoding (already padded to full
    * blocks by edge replication).
    */
  private def toBlocks(plane: Array[Int], w: Int, h: Int): (Int, Int, Array[Array[Double]]) = {
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    val blocks = new Array[Array[Double]](bw * bh)
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val blk = new Array[Double](64)
        var y = 0
        while (y < 8) {
          val sy = math.min(h - 1, by * 8 + y)
          var x = 0
          while (x < 8) {
            val sx = math.min(w - 1, bx * 8 + x)
            blk(y * 8 + x) = (plane(sy * w + sx) & 0xff) - 128.0
            x += 1
          }
          y += 1
        }
        blocks(by * bw + bx) = blk
        bx += 1
      }
      by += 1
    }
    (bw, bh, blocks)
  }

  /** FDCT + quantize one block → zig-zag-ordered integer coefficients. */
  private def quantize(block: Array[Double], qzz: Array[Int]): Array[Int] = {
    val f = fdct(block)
    val out = new Array[Int](64)
    var k = 0
    while (k < 64) {
      out(k) = math.round(f(Zigzag(k)) / qzz(k)).toInt
      k += 1
    }
    out
  }

  /** Huffman-encode one quantized block (zig-zag order). Returns new DC
    * predictor.
    */
  private def encodeBlock(bw: BitWriter, zz: Array[Int], pred: Int,
      dc: HuffEncTable, ac: HuffEncTable): Int = {
    val diff = zz(0) - pred
    val t = category(diff)
    bw.writeBits(dc.code(t), dc.size(t))
    if (t > 0) bw.writeBits(if (diff < 0) diff + (1 << t) - 1 else diff, t)
    var run = 0
    var k = 1
    while (k < 64) {
      val v = zz(k)
      if (v == 0) run += 1
      else {
        while (run > 15) { bw.writeBits(ac.code(0xf0), ac.size(0xf0)); run -= 16 } // ZRL
        val s = category(v)
        val rs = (run << 4) | s
        bw.writeBits(ac.code(rs), ac.size(rs))
        bw.writeBits(if (v < 0) v + (1 << s) - 1 else v, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.writeBits(ac.code(0x00), ac.size(0x00)) // EOB
    zz(0)
  }

  private def wU16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }

  private def writeDqt(o: java.io.ByteArrayOutputStream, id: Int, qzz: Array[Int]): Unit = {
    o.write(0xff); o.write(0xdb); wU16(o, 2 + 1 + 64)
    o.write(id)
    qzz.foreach(o.write)
  }

  private def writeDht(o: java.io.ByteArrayOutputStream, tcth: Int, bits: Array[Int],
      vals: Array[Byte]): Unit = {
    o.write(0xff); o.write(0xc4); wU16(o, 2 + 1 + 16 + vals.length)
    o.write(tcth)
    var l = 1
    while (l <= 16) { o.write(bits(l)); l += 1 }
    o.write(vals, 0, vals.length)
  }

  /** Encode a grayscale image as a single-component baseline JPEG.
    * `restartInterval` > 0 emits DRI + RSTn markers every that many MCUs.
    */
  def encodeGray(w: Int, h: Int, pixels: Array[Byte], quality: Int,
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h)
    val qzz = {
      val nat = scaledQuant(BaseQuantLuma, quality)
      Array.tabulate(64)(k => nat(Zigzag(k)))
    }
    val dcT = new HuffEncTable(DcLumaBits, DcLumaVals)
    val acT = new HuffEncTable(AcLumaBits, AcLumaVals)
    val o = new java.io.ByteArrayOutputStream()
    o.write(0xff); o.write(0xd8) // SOI
    writeDqt(o, 0, qzz)
    // SOF0: 8-bit, 1 component, sampling 1×1, quant table 0
    o.write(0xff); o.write(0xc0); wU16(o, 2 + 6 + 3)
    o.write(8); wU16(o, h); wU16(o, w); o.write(1)
    o.write(1); o.write(0x11); o.write(0)
    writeDht(o, 0x00, DcLumaBits, DcLumaVals)
    writeDht(o, 0x10, AcLumaBits, AcLumaVals)
    if (restartInterval > 0) { o.write(0xff); o.write(0xdd); wU16(o, 4); wU16(o, restartInterval) }
    // SOS
    o.write(0xff); o.write(0xda); wU16(o, 2 + 1 + 2 + 3)
    o.write(1); o.write(1); o.write(0x00); o.write(0); o.write(63); o.write(0)
    val plane = pixels.map(_ & 0xff)
    val (bw0, bh0, blocks) = toBlocks(plane, w, h)
    val bw = new BitWriter
    var pred = 0
    var mcu = 0
    var rst = 0
    var i = 0
    while (i < bw0 * bh0) {
      if (restartInterval > 0 && mcu == restartInterval) {
        bw.flush(); bw.writeRawByte(0xff); bw.writeRawByte(0xd0 + rst)
        rst = (rst + 1) & 7; mcu = 0; pred = 0
      }
      pred = encodeBlock(bw, quantize(blocks(i), qzz), pred, dcT, acT)
      mcu += 1; i += 1
    }
    bw.flush()
    val ent = bw.toArray
    o.write(ent, 0, ent.length)
    o.write(0xff); o.write(0xd9) // EOI
    o.toByteArray
  }

  /** Encode an RGB image as a 3-component YCbCr baseline JPEG with 4:2:0
    * chroma subsampling (the common production layout). `rgb` is packed
    * 0xRRGGBB, row-major.
    */
  def encodeColor420(w: Int, h: Int, rgb: Array[Int], quality: Int): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h)
    // RGB → YCbCr (BT.601 full-range, the JFIF convention)
    val yP = new Array[Int](w * h)
    val cbF = new Array[Double](w * h)
    val crF = new Array[Double](w * h)
    var i = 0
    while (i < w * h) {
      val r = (rgb(i) >> 16) & 0xff; val g = (rgb(i) >> 8) & 0xff; val b = rgb(i) & 0xff
      val y = 0.299 * r + 0.587 * g + 0.114 * b
      yP(i) = math.max(0, math.min(255, math.round(y).toInt))
      cbF(i) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
      crF(i) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
      i += 1
    }
    // 2×2 box downsample of the chroma planes
    val cw = (w + 1) / 2
    val ch = (h + 1) / 2
    val cbP = new Array[Int](cw * ch)
    val crP = new Array[Int](cw * ch)
    var cy = 0
    while (cy < ch) {
      var cx = 0
      while (cx < cw) {
        var sCb = 0.0; var sCr = 0.0; var n = 0
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val sy = cy * 2 + dy; val sx = cx * 2 + dx
            if (sy < h && sx < w) { sCb += cbF(sy * w + sx); sCr += crF(sy * w + sx); n += 1 }
            dx += 1
          }
          dy += 1
        }
        cbP(cy * cw + cx) = math.max(0, math.min(255, math.round(sCb / n).toInt))
        crP(cy * cw + cx) = math.max(0, math.min(255, math.round(sCr / n).toInt))
        cx += 1
      }
      cy += 1
    }
    val qLzz = { val nat = scaledQuant(BaseQuantLuma, quality); Array.tabulate(64)(k => nat(Zigzag(k))) }
    val qCzz = { val nat = scaledQuant(BaseQuantChroma, quality); Array.tabulate(64)(k => nat(Zigzag(k))) }
    val dcL = new HuffEncTable(DcLumaBits, DcLumaVals)
    val acL = new HuffEncTable(AcLumaBits, AcLumaVals)
    val dcC = new HuffEncTable(DcChromaBits, DcChromaVals)
    val acC = new HuffEncTable(AcChromaBits, AcChromaVals)
    val o = new java.io.ByteArrayOutputStream()
    o.write(0xff); o.write(0xd8)
    writeDqt(o, 0, qLzz); writeDqt(o, 1, qCzz)
    // SOF0: Y 2×2 q0, Cb 1×1 q1, Cr 1×1 q1
    o.write(0xff); o.write(0xc0); wU16(o, 2 + 6 + 3 * 3)
    o.write(8); wU16(o, h); wU16(o, w); o.write(3)
    o.write(1); o.write(0x22); o.write(0)
    o.write(2); o.write(0x11); o.write(1)
    o.write(3); o.write(0x11); o.write(1)
    writeDht(o, 0x00, DcLumaBits, DcLumaVals); writeDht(o, 0x10, AcLumaBits, AcLumaVals)
    writeDht(o, 0x01, DcChromaBits, DcChromaVals); writeDht(o, 0x11, AcChromaBits, AcChromaVals)
    o.write(0xff); o.write(0xda); wU16(o, 2 + 1 + 6 + 3)
    o.write(3)
    o.write(1); o.write(0x00)
    o.write(2); o.write(0x11)
    o.write(3); o.write(0x11)
    o.write(0); o.write(63); o.write(0)
    // MCU = 16×16: 4 Y blocks (2×2), 1 Cb, 1 Cr. Pad planes to MCU multiples.
    val mcusX = (w + 15) / 16
    val mcusY = (h + 15) / 16
    def blockAt(plane: Array[Int], pw: Int, ph: Int, x0: Int, y0: Int): Array[Double] = {
      val blk = new Array[Double](64)
      var y = 0
      while (y < 8) {
        val sy = math.min(ph - 1, y0 + y)
        var x = 0
        while (x < 8) {
          blk(y * 8 + x) = (plane(sy * pw + math.min(pw - 1, x0 + x)) & 0xff) - 128.0
          x += 1
        }
        y += 1
      }
      blk
    }
    val bw = new BitWriter
    var pY = 0; var pCb = 0; var pCr = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            pY = encodeBlock(bw,
              quantize(blockAt(yP, w, h, mx * 16 + bx * 8, my * 16 + by * 8), qLzz), pY, dcL, acL)
            bx += 1
          }
          by += 1
        }
        pCb = encodeBlock(bw, quantize(blockAt(cbP, cw, ch, mx * 8, my * 8), qCzz), pCb, dcC, acC)
        pCr = encodeBlock(bw, quantize(blockAt(crP, cw, ch, mx * 8, my * 8), qCzz), pCr, dcC, acC)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    val ent = bw.toArray
    o.write(ent, 0, ent.length)
    o.write(0xff); o.write(0xd9)
    o.toByteArray
  }

  // =====================================================================
  // Decoder
  // =====================================================================

  /** Decoded image: per-pixel luma plane always present; rgb only for
    * 3-component streams (packed 0xRRGGBB).
    */
  final case class Decoded(width: Int, height: Int, gray: Array[Byte], rgb: Option[Array[Int]])

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var td: Int = 0
    var ta: Int = 0
  }

  /** Baseline decode. None for anything malformed, truncated, progressive,
    * arithmetic-coded, 12-bit, or otherwise out of scope — corrupt media
    * quarantines, it never throws (same contract as [[Multimodal.PgmCodec]]).
    */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    try decodeOrThrow(bytes)
    catch { case _: CorruptJpeg | _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None }

  private def decodeOrThrow(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    var i = 2
    val quant = new Array[Array[Int]](4) // zig-zag order, as stored in DQT
    val dcTabs = new Array[HuffDecTable](4)
    val acTabs = new Array[HuffDecTable](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    def u16(p: Int): Int = {
      if (p + 1 >= bytes.length) corrupt()
      ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    }
    while (true) {
      // seek the next marker (skip fill bytes)
      if (i + 1 >= bytes.length) corrupt()
      if ((bytes(i) & 0xff) != 0xff) corrupt()
      while (i < bytes.length && (bytes(i) & 0xff) == 0xff) i += 1
      if (i >= bytes.length) corrupt()
      val marker = bytes(i) & 0xff
      i += 1
      marker match {
        case 0xd9 => return None // EOI before any scan
        case 0xdb => // DQT
          val len = u16(i)
          val end = i + len
          var p = i + 2
          while (p < end) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            if (tq > 3 || pq > 1) corrupt()
            p += 1
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) {
              if (pq == 1) { t(k) = u16(p); p += 2 } else { t(k) = bytes(p) & 0xff; p += 1 }
              k += 1
            }
            quant(tq) = t
          }
          i = end
        case 0xc4 => // DHT
          val len = u16(i)
          val end = i + len
          var p = i + 2
          while (p < end) {
            val tc = (bytes(p) & 0xff) >> 4
            val th = bytes(p) & 0x0f
            if (tc > 1 || th > 3) corrupt()
            p += 1
            val bits = new Array[Int](17)
            var n = 0
            var l = 1
            while (l <= 16) { bits(l) = bytes(p) & 0xff; n += bits(l); p += 1; l += 1 }
            if (n > 256 || p + n > end) corrupt()
            val vals = java.util.Arrays.copyOfRange(bytes, p, p + n)
            p += n
            val tab = new HuffDecTable(bits, vals)
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
          }
          i = end
        case 0xc0 => // SOF0 baseline
          val len = u16(i)
          if (bytes(i + 2) != 8) corrupt() // 8-bit precision only
          height = u16(i + 3); width = u16(i + 5)
          val nc = bytes(i + 7) & 0xff
          if (width == 0 || height == 0 || width > (1 << 14) || height > (1 << 14)) corrupt()
          if (nc != 1 && nc != 3) corrupt()
          comps = Array.tabulate(nc) { c =>
            val base = i + 8 + c * 3
            val hv = bytes(base + 1) & 0xff
            val comp = Component(bytes(base) & 0xff, hv >> 4, hv & 0x0f, bytes(base + 2) & 0x0f)
            if (comp.h < 1 || comp.h > 4 || comp.v < 1 || comp.v > 4) corrupt()
            comp
          }
          i += len
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // progressive / extended / arithmetic: out of scope → quarantine
        case 0xdd => // DRI
          restartInterval = u16(i + 2)
          i += u16(i)
        case 0xda => // SOS — entropy-coded data follows
          if (comps == null) corrupt()
          val len = u16(i)
          val ns = bytes(i + 2) & 0xff
          if (ns != comps.length) corrupt()
          var p = i + 3
          var c = 0
          while (c < ns) {
            val id = bytes(p) & 0xff
            val comp = comps.find(_.id == id).getOrElse(corrupt())
            comp.td = (bytes(p + 1) & 0xff) >> 4
            comp.ta = bytes(p + 1) & 0x0f
            p += 2; c += 1
          }
          i += len
          return Some(decodeScan(bytes, i, width, height, comps, quant, dcTabs, acTabs, restartInterval))
        case m if m >= 0xe0 && m <= 0xef => i += u16(i) // APPn
        case 0xfe => i += u16(i) // COM
        case _ => corrupt()
      }
    }
    None // unreachable
  }

  private def decodeScan(bytes: Array[Byte], start: Int, width: Int, height: Int,
      comps: Array[Component], quant: Array[Array[Int]],
      dcTabs: Array[HuffDecTable], acTabs: Array[HuffDecTable],
      restartInterval: Int): Decoded = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    // padded per-component planes (whole blocks)
    val planes = comps.map { c => new Array[Byte]((mcusX * 8 * c.h) * (mcusY * 8 * c.v)) }
    comps.foreach { c =>
      if (quant(c.tq) == null || dcTabs(c.td) == null || acTabs(c.ta) == null) corrupt()
    }
    val preds = new Array[Int](comps.length)
    val r = new BitReader(bytes, start)
    var mcuCount = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuCount == restartInterval) {
          r.restart(rstIdx)
          rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(preds, 0)
          mcuCount = 0
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val qt = quant(c.tq)
          val dcT = dcTabs(c.td)
          val acT = acTabs(c.ta)
          val planeW = mcusX * 8 * c.h
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              // --- decode one block ---
              val coef = new Array[Double](64)
              val t = r.decodeHuff(dcT)
              if (t > 11) corrupt()
              preds(ci) += extend(r.receive(t), t)
              coef(0) = preds(ci).toDouble * qt(0)
              var k = 1
              var done = false
              while (!done && k < 64) {
                val rs = r.decodeHuff(acT)
                val run = rs >> 4
                val s = rs & 0x0f
                if (s == 0) {
                  if (run == 15) k += 16 else done = true // ZRL vs EOB
                } else {
                  k += run
                  if (k > 63) corrupt()
                  coef(Zigzag(k)) = extend(r.receive(s), s).toDouble * qt(k)
                  k += 1
                }
              }
              val px = idct(coef)
              val x0 = (mx * c.h + bx) * 8
              val y0 = (my * c.v + by) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  val v = math.round(px(y * 8 + x) + 128.0).toInt
                  planes(ci)((y0 + y) * planeW + (x0 + x)) =
                    math.max(0, math.min(255, v)).toByte
                  x += 1
                }
                y += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcuCount += 1
        mx += 1
      }
      my += 1
    }
    // crop + upsample (pixel replication) to full resolution
    def sampleAt(ci: Int, x: Int, y: Int): Int = {
      val c = comps(ci)
      val planeW = mcusX * 8 * c.h
      planes(ci)((y * c.v / maxV) * planeW + (x * c.h / maxH)) & 0xff
    }
    if (comps.length == 1) {
      val gray = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { gray(y * width + x) = sampleAt(0, x, y).toByte; x += 1 }
        y += 1
      }
      Decoded(width, height, gray, None)
    } else {
      val gray = new Array[Byte](width * height)
      val rgb = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = sampleAt(0, x, y)
          val cb = sampleAt(1, x, y) - 128
          val cr = sampleAt(2, x, y) - 128
          def clamp(d: Double): Int = math.max(0, math.min(255, math.round(d).toInt))
          val r0 = clamp(yy + 1.402 * cr)
          val g0 = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          val b0 = clamp(yy + 1.772 * cb)
          gray(y * width + x) = yy.toByte
          rgb(y * width + x) = (r0 << 16) | (g0 << 8) | b0
          x += 1
        }
        y += 1
      }
      Decoded(width, height, gray, Some(rgb))
    }
  }
}
