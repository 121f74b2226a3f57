package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.JpegCodec

/** The JPEG codec is NOT verified only against itself: both directions are
  * cross-checked against the JDK's independent `javax.imageio` JPEG codec
  * (our encode → ImageIO decode, ImageIO encode → our decode), plus exactness
  * properties the standard guarantees (uniform blocks survive quantization
  * bit-exactly) and corruption fuzzing for the quarantine contract.
  */
class JpegSpec extends AnyFunSuite {

  /** Deterministic smooth grayscale test image (low-frequency content so
    * lossy error bounds are tight and meaningful).
    */
  private def gradient(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (40 + (x * 140 / math.max(1, w - 1)) + (y * 60 / math.max(1, h - 1))).toByte
    }

  private def maxAbsErr(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length)
    a.indices.foldLeft(0)((m, i) => math.max(m, math.abs((a(i) & 0xff) - (b(i) & 0xff))))
  }

  test("uniform image round-trips bit-exactly (DC-only blocks quantize to zero error)") {
    for (v <- Seq(0, 64, 128, 200, 255); (w, h) <- Seq((8, 8), (24, 16), (17, 9))) {
      val px = Array.fill(w * h)(v.toByte)
      val dec = JpegCodec.decode(JpegCodec.encodeGray(w, h, px, quality = 90))
      assert(dec.isDefined, s"uniform $v @ ${w}x$h failed to decode")
      assert(dec.get.width == w && dec.get.height == h)
      // a flat block level-shifts to a single DC coefficient whose
      // dequantized value is exact whenever (v-128)*8 is a multiple of the
      // DC quant step times... in general round-trip error ≤ 1; v=128 is 0
      assert(maxAbsErr(dec.get.gray, px) <= 1, s"uniform $v err > 1")
    }
    // the 128 case is exactly representable: all coefficients are zero
    val px128 = Array.fill(32 * 32)(128.toByte)
    val d = JpegCodec.decode(JpegCodec.encodeGray(32, 32, px128, quality = 75)).get
    assert(d.gray.toSeq == px128.toSeq)
  }

  test("smooth gradient round-trips within a tight lossy bound at q90") {
    val (w, h) = (48, 33) // non-multiple-of-8 dims exercise edge padding
    val px = gradient(w, h)
    val dec = JpegCodec.decode(JpegCodec.encodeGray(w, h, px, quality = 90))
    assert(dec.isDefined)
    assert(dec.get.width == w && dec.get.height == h)
    assert(maxAbsErr(dec.get.gray, px) <= 8, s"gradient err ${maxAbsErr(dec.get.gray, px)}")
  }

  test("our grayscale encode is readable by the independent javax.imageio decoder") {
    val (w, h) = (40, 24)
    val px = gradient(w, h)
    val jpeg = JpegCodec.encodeGray(w, h, px, quality = 90)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    assert(img != null, "ImageIO could not parse our JPEG")
    assert(img.getWidth == w && img.getHeight == h)
    val ours = JpegCodec.decode(jpeg).get.gray
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val theirs = img.getRaster.getSample(x, y, 0)
      worst = math.max(worst, math.abs(theirs - (ours(y * w + x) & 0xff)))
    }
    // two independent IDCT implementations of the same coefficients: ≤ 1
    assert(worst <= 1, s"our decode vs ImageIO decode differ by $worst")
  }

  test("javax.imageio-encoded grayscale JPEG decodes with our decoder") {
    val (w, h) = (32, 32)
    val px = gradient(w, h)
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) bi.getRaster.setSample(x, y, 0, px(y * w + x) & 0xff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", bos))
    val dec = JpegCodec.decode(bos.toByteArray)
    assert(dec.isDefined, "our decoder rejected an ImageIO-written JPEG")
    assert(dec.get.width == w && dec.get.height == h)
    assert(maxAbsErr(dec.get.gray, px) <= 10,
      s"ImageIO-encoded → our decode err ${maxAbsErr(dec.get.gray, px)}")
  }

  test("4:2:0 color round-trip: luma tight, chroma bounded by subsampling") {
    val (w, h) = (34, 22) // odd-ish dims exercise chroma plane rounding
    val rgb = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val r = 30 + x * 5; val g = 200 - y * 4; val b = 60 + x * 2 + y * 2
      (math.min(255, r) << 16) | (math.min(255, math.max(0, g)) << 8) | math.min(255, b)
    }
    val dec = JpegCodec.decode(JpegCodec.encodeColor420(w, h, rgb, quality = 90))
    assert(dec.isDefined && dec.get.rgb.isDefined)
    assert(dec.get.width == w && dec.get.height == h)
    var worstChan = 0
    for (i <- 0 until w * h; shift <- Seq(16, 8, 0)) {
      val a = (rgb(i) >> shift) & 0xff
      val b = (dec.get.rgb.get(i) >> shift) & 0xff
      worstChan = math.max(worstChan, math.abs(a - b))
    }
    // 2×2 chroma box-averaging over a smooth ramp costs a few LSBs on top
    // of quantization; this bound fails loudly if up/downsampling misaligns
    assert(worstChan <= 24, s"4:2:0 round-trip channel err $worstChan")
  }

  test("our 4:2:0 color encode agrees with ImageIO's decode of it") {
    val (w, h) = (32, 16)
    val rgb = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((40 + x * 6) << 16) | ((220 - x * 5) << 8) | (80 + y * 8)
    }
    val jpeg = JpegCodec.encodeColor420(w, h, rgb, quality = 90)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    assert(img != null)
    assert(img.getWidth == w && img.getHeight == h)
    val ours = JpegCodec.decode(jpeg).get.rgb.get
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val t = img.getRGB(x, y)
      for (shift <- Seq(16, 8, 0)) {
        val a = (t >> shift) & 0xff
        val b = (ours(y * w + x) >> shift) & 0xff
        worst = math.max(worst, math.abs(a - b))
      }
    }
    // same coefficients, two decoders; ImageIO may use smoothed chroma
    // upsampling where we use replication, so allow a small gap
    assert(worst <= 8, s"our color decode vs ImageIO differ by $worst")
  }

  test("ImageIO-encoded RGB JPEG (its own subsampling choice) decodes with our decoder") {
    val (w, h) = (48, 32)
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      bi.setRGB(x, y, ((50 + x * 3) << 16) | ((60 + y * 4) << 8) | (200 - x * 2))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", bos))
    val dec = JpegCodec.decode(bos.toByteArray)
    assert(dec.isDefined, "our decoder rejected an ImageIO-written color JPEG")
    assert(dec.get.width == w && dec.get.height == h && dec.get.rgb.isDefined)
    var worst = 0
    for (y <- 0 until h; x <- 0 until w; shift <- Seq(16, 8, 0)) {
      val a = (bi.getRGB(x, y) >> shift) & 0xff
      val b = (dec.get.rgb.get(y * w + x) >> shift) & 0xff
      worst = math.max(worst, math.abs(a - b))
    }
    assert(worst <= 16, s"ImageIO-encoded color → our decode err $worst")
  }

  test("restart markers (DRI/RSTn) decode identically to the unsegmented stream") {
    val (w, h) = (64, 40) // 8×5 = 40 MCUs → several RST boundaries at ri=7
    val px = gradient(w, h)
    val plain = JpegCodec.decode(JpegCodec.encodeGray(w, h, px, quality = 85)).get
    val withRst = JpegCodec.decode(
      JpegCodec.encodeGray(w, h, px, quality = 85, restartInterval = 7)).get
    assert(plain.gray.toSeq == withRst.gray.toSeq)
    // and ImageIO agrees the restart-marker stream is valid JPEG
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      JpegCodec.encodeGray(w, h, px, quality = 85, restartInterval = 7)))
    assert(img != null && img.getWidth == w)
  }

  test("corrupt payloads quarantine (None), never throw") {
    val good = JpegCodec.encodeGray(32, 32, gradient(32, 32), quality = 80)
    // truncations at every stage of the stream: header, tables, mid-entropy
    for (cut <- Seq(1, 2, 3, 10, 20, good.length / 4, good.length / 2, good.length - 40))
      assert(JpegCodec.decode(java.util.Arrays.copyOf(good, cut)).isEmpty, s"cut=$cut")
    // losing ONLY the trailing EOI marker leaves a complete scan — tolerant
    // decode succeeds (the contract is per-MCU completeness, not EOI)
    assert(JpegCodec.decode(java.util.Arrays.copyOf(good, good.length - 2)).isDefined)
    // single-byte corruption sweep must never throw (may still decode —
    // entropy bits are not checksummed — but structural damage → None)
    for (i <- good.indices by 7) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x5a).toByte
      JpegCodec.decode(bad) // asserts nothing: the contract is "no throw"
    }
    assert(JpegCodec.decode(Array.emptyByteArray).isEmpty)
    assert(JpegCodec.decode("not a jpeg at all".getBytes).isEmpty)
    // progressive JPEG (SOF2) is declared out of scope → quarantine: build
    // one by patching the SOF marker, decoder must reject it cleanly
    val sof = {
      var i = 2
      var at = -1
      while (at < 0 && i + 1 < good.length) {
        if ((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0) at = i else i += 1
      }
      at
    }
    assert(sof > 0)
    val prog = good.clone()
    prog(sof + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isEmpty)
  }

  test("q42 runs the real JPEG pipeline end-to-end with quarantine accounting") {
    import TestSpark._
    val df = graft.operators.Multimodal.q42FeatureExtract(spark, TestSpark.sf).cache()
    val n = df.count()
    assert(n > 0)
    val bad = df.filter(!org.apache.spark.sql.functions.col("decode_ok")).count()
    val good = df.filter(org.apache.spark.sql.functions.col("decode_ok"))
    // every 97th doc is deliberately truncated mid-stream → quarantined
    assert(bad > 0 && bad < n)
    assert(good.filter(org.apache.spark.sql.functions.col("width").isNull).count() == 0)
    df.unpersist()
  }
}
