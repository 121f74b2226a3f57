package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.{PgmCodec, WavCodec}

/** Real-image-path properties: the PGM codec is a genuine decoder, so the
  * round trip, resize, perceptual hash and corruption handling are all
  * directly assertable.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("q150 FLAC pipeline: exact quarantine set, md5-verified lossless decode, real compression") {
    val df = Multimodal.q150FlacAudio(spark, sf).cache()
    val n = df.count()
    assert(n > 0)
    // exactly the truncated payloads (doc_id % 83 == 0) quarantine
    assert(df.filter((col("doc_id") % 83 === 0) =!= !col("decode_ok")).count() == 0)
    val good = df.filter(col("decode_ok"))
    // losslessness witnessed in-format: every surviving stream's MD5 of
    // the DECODED samples matches the STREAMINFO MD5 of the encoded input
    assert(good.filter(!col("md5_ok")).count() == 0)
    assert(good.filter(col("sample_rate") =!= 8000).count() == 0)
    // structured signals must compress below raw PCM (10000 bp)
    import org.apache.spark.sql.functions.avg
    val meanBp = good.agg(avg(col("compression_bp"))).head().getDouble(0)
    assert(meanBp < 9000, s"mean compression $meanBp bp — barely compressing")
    df.unpersist()
  }

  test("PGM codec round-trips pixels exactly") {
    val px = Array.tabulate(12 * 7)(i => (i * 37 % 256).toByte)
    val img = PgmCodec.decode(PgmCodec.encode(12, 7, px))
    assert(img.isDefined)
    assert(img.get.width == 12 && img.get.height == 7)
    assert(img.get.pixels.toSeq == px.toSeq)
  }

  test("PGM decode rejects corrupt payloads instead of throwing") {
    val good = PgmCodec.encode(8, 8, new Array[Byte](64))
    assert(PgmCodec.decode(java.util.Arrays.copyOf(good, good.length - 1)).isEmpty) // truncated
    assert(PgmCodec.decode("P6\n8 8\n255\n".getBytes ++ new Array[Byte](64)).isEmpty) // wrong magic
    assert(PgmCodec.decode("P5\n0 8\n255\n".getBytes).isEmpty) // zero dim
    assert(PgmCodec.decode(Array.emptyByteArray).isEmpty)
    // crafted dims whose product wraps Int must quarantine, not crash:
    // 65536*65536 wraps to exactly 0, 50000*50000 wraps negative
    assert(PgmCodec.decode("P5\n65536 65536\n255\n".getBytes ++ new Array[Byte](64)).isEmpty)
    assert(PgmCodec.decode("P5\n50000 50000\n255\n".getBytes ++ new Array[Byte](64)).isEmpty)
  }

  test("block-average resize and aHash behave on known images") {
    // uniform image → all cells equal → no bit can exceed the mean → hash 0
    val flat = PgmCodec.Image(16, 16, Array.fill(256)(100.toByte))
    assert(PgmCodec.resize(flat, 8).forall(_ == 100))
    assert(PgmCodec.aHash(flat) == 0L)
    // left-half dark / right-half bright → exactly the 4 right columns of
    // each 8x8 row exceed the mean → 32 bits set
    val split = PgmCodec.Image(16, 16,
      Array.tabulate(256)(i => if (i % 16 < 8) 0.toByte else 200.toByte))
    val h = PgmCodec.aHash(split)
    assert(java.lang.Long.bitCount(h) == 32)
    // hash is a function of content: same pixels → same hash
    assert(h == PgmCodec.aHash(PgmCodec.Image(16, 16, split.pixels.clone())))
  }

  test("q61 decodes synthesized images, quarantines the corrupted ones") {
    val out = Multimodal.q61ImageFeatures(spark, sf).cache()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.count() == nDocs)
    // exactly the deliberately-truncated payloads fail decode
    assert(out.filter(!col("decode_ok")).select(col("doc_id"))
      .collect().map(_.getLong(0)).forall(_ % 97 == 0))
    assert(out.filter(!col("decode_ok")).count() ==
      out.filter(col("doc_id") % 97 === 0).count())
    // decoded dims match the synth geometry; hashes/means present
    val bad = out.filter(col("decode_ok") &&
      (col("width") =!= lit(8) + col("doc_id") % 25 ||
       col("height") =!= col("width") ||
       col("mean_pixel").isNull || col("ahash").isNull)).count()
    assert(bad == 0)
    // deterministic across runs
    val again = Multimodal.q61ImageFeatures(spark, sf)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
  }

  test("WAV codec round-trips samples exactly and skips foreign chunks") {
    val samples = Array.tabulate[Short](1000)(i => ((i * 131) % 30000 - 15000).toShort)
    val wav = WavCodec.encode(8000, samples)
    val back = WavCodec.decode(wav)
    assert(back.isDefined)
    assert(back.get.sampleRate == 8000)
    assert(back.get.samples.toSeq == samples.toSeq)
    // foreign chunk between fmt and data (the q92 LIST splice) is skipped
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = new Array[Byte](wav.length + list.length)
    System.arraycopy(wav, 0, spliced, 0, 36)
    System.arraycopy(list, 0, spliced, 36, list.length)
    System.arraycopy(wav, 36, spliced, 36 + list.length, wav.length - 36)
    val s2 = WavCodec.decode(spliced)
    assert(s2.isDefined && s2.get.samples.toSeq == samples.toSeq)
  }

  test("WAV decode rejects corrupt payloads instead of throwing") {
    val good = WavCodec.encode(8000, Array.tabulate[Short](100)(_.toShort))
    assert(WavCodec.decode(java.util.Arrays.copyOf(good, good.length / 2)).isEmpty) // truncated data
    assert(WavCodec.decode(java.util.Arrays.copyOf(good, 20)).isEmpty) // header only
    assert(WavCodec.decode("RIFX".getBytes ++ good.drop(4)).isEmpty) // wrong magic
    assert(WavCodec.decode(Array.emptyByteArray).isEmpty)
    // stereo / non-PCM / 8-bit all rejected (pipeline publishes mono PCM16)
    val stereo = good.clone(); stereo(22) = 2 // channels field
    assert(WavCodec.decode(stereo).isEmpty)
    val nonPcm = good.clone(); nonPcm(20) = 3 // format = IEEE float
    assert(WavCodec.decode(nonPcm).isEmpty)
    // a chunk whose declared size overruns the payload must not read past
    val lying = good.clone()
    lying(40) = -1; lying(41) = -1; lying(42) = -1; lying(43) = 127 // data size huge
    assert(WavCodec.decode(lying).isEmpty)
  }

  test("WAV features are exact on a known square wave") {
    // +1000 for 4 samples, -1000 for 4 samples, repeated: peak 1000,
    // RMS exactly 1000, one crossing per half-period boundary
    val n = 800
    val sq = Array.tabulate[Short](n)(i => if ((i / 4) % 2 == 0) 1000 else -1000)
    val a = WavCodec.decode(WavCodec.encode(8000, sq)).get
    assert(WavCodec.zeroCrossings(a.samples) == n / 4 - 1)
    var sumSq = 0L
    a.samples.foreach(s0 => sumSq += s0.toLong * s0.toLong)
    assert(math.round(math.sqrt(sumSq.toDouble / n) * 1000) == 1000000L)
    assert(a.samples.length * 1000L / a.sampleRate == 100L) // 800 / 8kHz = 100 ms
  }

  test("multi-frame container parses frame-by-frame and rejects truncation") {
    val f1 = Array.tabulate(6 * 4)(i => (i * 11 % 256).toByte)
    val f2 = Array.tabulate(6 * 4)(i => (255 - i % 256).toByte)
    val f3 = Array.fill(6 * 4)(7.toByte)
    val container =
      PgmCodec.encode(6, 4, f1) ++ PgmCodec.encode(6, 4, f2) ++ PgmCodec.encode(6, 4, f3)
    val frames = Multimodal.parseFrames(container)
    assert(frames.isDefined && frames.get.length == 3)
    assert(frames.get(0).pixels.toSeq == f1.toSeq)
    assert(frames.get(1).pixels.toSeq == f2.toSeq)
    assert(frames.get(2).pixels.toSeq == f3.toSeq)
    // truncating the LAST frame's pixels poisons the whole container
    assert(Multimodal.parseFrames(
      java.util.Arrays.copyOf(container, container.length - 3)).isEmpty)
    assert(Multimodal.parseFrames(Array.emptyByteArray).isEmpty)
    // a legal-but-non-canonical header (extra whitespace) must not
    // desynchronize the walk: the cursor advances by what the PARSER
    // consumed, not by a re-encoded canonical length
    val nonCanonical = "P5\n  6  4\r\n255\n".getBytes("US-ASCII") ++ f1 ++
      PgmCodec.encode(6, 4, f2)
    val nc = Multimodal.parseFrames(nonCanonical)
    assert(nc.isDefined && nc.get.length == 2)
    assert(nc.get(0).pixels.toSeq == f1.toSeq && nc.get(1).pixels.toSeq == f2.toSeq)
  }

  test("q101 samples frames, finds exactly one scene cut, quarantines truncated clips") {
    val out = Multimodal.q101FrameSample(spark, sf).cache()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.count() == nDocs)
    assert(out.filter(!col("decode_ok")).count() ==
      out.filter(col("doc_id") % 101 === 0).count())
    assert(out.filter(!col("decode_ok")).select(col("doc_id"))
      .collect().map(_.getLong(0)).forall(_ % 101 == 0))
    // geometry: n_frames = 3 + doc_id % 10, every 2nd frame sampled
    val bad = out.filter(col("decode_ok") &&
      (col("n_frames") =!= lit(3) + col("doc_id") % 10 ||
       col("n_sampled") =!= expr("(n_frames + 1) div 2") ||
       col("first_ahash").isNull)).count()
    assert(bad == 0)
    // the synthesized cut is the ONLY scene change: within-scene sampled
    // deltas are 0, the one cross-cut delta is exactly 128000 milli
    assert(out.filter(col("decode_ok") && col("n_scene_changes") =!= 1).count() == 0)
    assert(out.filter(col("decode_ok") &&
      col("mean_frame_diff_milli") =!= expr("128000 div (n_sampled - 1)")).count() == 0)
    out.unpersist()
  }

  test("q92 decodes synthesized audio, quarantines truncated payloads, skips LIST docs") {
    val out = Multimodal.q92AudioFeatures(spark, sf).cache()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.count() == nDocs)
    // exactly the deliberately-truncated payloads fail decode
    assert(out.filter(!col("decode_ok")).count() ==
      out.filter(col("doc_id") % 89 === 0).count())
    assert(out.filter(!col("decode_ok")).select(col("doc_id"))
      .collect().map(_.getLong(0)).forall(_ % 89 == 0))
    // decoded geometry matches the synth: n = 800 + doc_id % 800 at 8 kHz,
    // and the LIST-spliced docs (doc_id % 113 == 0) decode fine
    val bad = out.filter(col("decode_ok") &&
      (col("n_samples") =!= lit(800) + col("doc_id") % 800 ||
       col("sample_rate") =!= 8000 ||
       col("duration_ms") =!= expr("n_samples * 1000 div 8000") ||
       col("rms_milli").isNull || col("zero_crossings").isNull)).count()
    assert(bad == 0)
    assert(out.filter(col("doc_id") % 113 === 0 && col("doc_id") % 89 =!= 0)
      .filter(!col("decode_ok")).count() == 0)
    out.unpersist()
  }

  test("pHash: deterministic, DC bit clear, brightness/contrast invariant, structure-sensitive") {
    // side == 32 makes the 32×32 resize the identity, so the pixel
    // transforms below are EXACT coefficient transforms (with resize
    // averaging in play, integer division would quantize the shift/scale
    // and the invariance claim would only hold approximately)
    val side = 32
    // spectrally RICH low-frequency base (several distinct DCT modes with
    // both signs): pixels in [11, 109], so +40 (≤ 149) and ×2 (≤ 218)
    // both stay clip-free and integer-exact
    def cosm(k: Int, t: Int) = math.cos((2 * t + 1) * k * math.Pi / 64)
    val px = Array.tabulate(side * side) { i =>
      val x = i % side; val y = i / side
      val v = 60 + 20 * cosm(1, x) - 14 * cosm(1, y) +
        9 * cosm(2, x) * cosm(1, y) - 6 * cosm(3, y)
      math.rint(v).toInt.toByte
    }
    val img = PgmCodec.Image(side, side, px)
    val h = PgmCodec.pHash(img)
    assert(h == PgmCodec.pHash(img))
    assert((h & 1L) == 0L) // DC cell excluded, bit 0 always clear
    // brightness SHIFT (no clipping: max 120+40) moves only the DC
    // coefficient — the 63 AC bits are unchanged
    val brighter = PgmCodec.Image(side, side, px.map(b => ((b & 0xff) + 40).toByte))
    assert(PgmCodec.pHash(brighter) == h)
    // exact positive contrast SCALING (×2, max 240 — no clip, no integer
    // loss) scales every coefficient together: order statistics unchanged
    val scaled = PgmCodec.Image(side, side, px.map(b => ((b & 0xff) * 2).toByte))
    assert(PgmCodec.pHash(scaled) == h)
    // a structurally different image must not collide
    val other = PgmCodec.Image(side, side,
      Array.tabulate(side * side)(i => (if ((i / side) % 2 == 0) 30 else 220).toByte))
    assert(java.lang.Long.bitCount(PgmCodec.pHash(other) ^ h) > 3)
  }

  test("q197 image pHash pairs: planted identical-synth docs pair at hamming 0") {
    import TestSpark.spark.implicits._
    // same text AND doc_id ≡ (mod 25): identical side + identical tiled
    // payload → identical pHash → an exact hamming-0 pair; the third doc
    // is unrelated. ids avoid % 97 == 0 (the corruption lane).
    val docs = Seq((1L, "shared body of text for the planted image pair"),
                   (26L, "shared body of text for the planted image pair"),
                   (3L, "completely different content for the other image"))
      .toDF("doc_id", "text")
    val pairs = Multimodal.imagePhashPairsOf(TestSpark.spark, docs, 3).collect()
    assert(pairs.exists(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 26L && r.getAs[Long]("hamming") == 0L), pairs.toSeq)
    assert(!pairs.exists(r => r.getAs[Long]("doc_b") == 3L || r.getAs[Long]("doc_a") == 3L))
    // the full corpus query is protocol-visible: the clone lane plants a
    // deterministic identical pair (202, 303 share clone group 1)
    val live = Multimodal.q197ImagePhashPairs(TestSpark.spark, TestSpark.sf)
    assert(live.columns.toSeq == Seq("doc_a", "doc_b", "hamming"))
    val liveRows = live.collect()
    liveRows.foreach(r => assert(r.getAs[Long]("hamming") <= 3))
    assert(liveRows.exists(r => r.getAs[Long]("doc_a") == 202L &&
      r.getAs[Long]("doc_b") == 303L && r.getAs[Long]("hamming") == 0L),
      s"clone-lane pair missing from corpus run: ${liveRows.toSeq}")
  }

  test("audio fingerprint: deterministic, volume-scale invariant, content-sensitive, short=0") {
    val rnd = new scala.util.Random(13)
    val samples = Array.fill(2000)((rnd.nextInt(16000) - 8000).toShort)
    val f = Multimodal.audioFingerprint(samples)
    assert(f == Multimodal.audioFingerprint(samples))
    // exact positive amplitude scaling multiplies every window energy by
    // the same factor: every e(b) > e(b+1) comparison is unchanged
    val louder = samples.map(s0 => (s0 * 3).toShort)
    assert(louder.forall(s0 => math.abs(s0.toInt) < 32768)) // no overflow in the premise
    assert(Multimodal.audioFingerprint(louder) == f)
    // different content must not collide
    val other = Array.tabulate(2000)(i => (if (i % 50 < 25) 8000 else -3000).toShort)
    assert(java.lang.Long.bitCount(Multimodal.audioFingerprint(other) ^ f) > 3)
    assert(Multimodal.audioFingerprint(Array.fill(64)(100.toShort)) == 0L)
  }

  test("audio fingerprint window bounds survive >33M samples (Int32 i*length overflow)") {
    // 34M samples: i * length overflows Int32 from window 63 up — the
    // overflowed (negative) bounds would silently zero the tail windows.
    // Monotone DECREASING energy envelope → every e(b) > e(b+1) → all 64
    // bits set; the overflow bug instead zeroes late windows and clears
    // high bits.
    val n = 34_000_000
    val down = Array.tabulate(n)(j => ((n - 1 - j) / 524288 + 1).toShort)
    assert(Multimodal.audioFingerprint(down) == -1L)
    // monotone INCREASING envelope → no bit set
    val up = Array.tabulate(n)(j => (j / 524288 + 1).toShort)
    assert(Multimodal.audioFingerprint(up) == 0L)
  }

  test("q198 audio pairs: planted identical-synth docs pair at hamming 0; corrupt lane drops") {
    import TestSpark.spark.implicits._
    // same text AND doc_id ≡ (mod 800): identical sample count + content;
    // ids avoid the % 89 truncation lane. 4889 % 89 == ? ensure not 0.
    val docs = Seq((2L, "the same audio body text"),
                   (802L, "the same audio body text"),
                   (5L, "entirely different sound content here"),
                   (89L, "the same audio body text")) // corrupt lane: truncated → dropped
      .toDF("doc_id", "text")
    val fps = Multimodal.audioFingerprintsOf(TestSpark.spark, docs).collect()
    assert(!fps.map(_.getLong(0)).contains(89L), "truncated payload must drop")
    val pairs = Multimodal.audioPairsOf(TestSpark.spark, docs, 3).collect()
    assert(pairs.exists(r => r.getAs[Long]("doc_a") == 2L &&
      r.getAs[Long]("doc_b") == 802L && r.getAs[Long]("hamming") == 0L), pairs.toSeq)
    assert(!pairs.exists(r => r.getAs[Long]("doc_a") == 5L || r.getAs[Long]("doc_b") == 5L))
    val live = Multimodal.q198AudioFingerprintPairs(TestSpark.spark, TestSpark.sf)
    assert(live.columns.toSeq == Seq("doc_a", "doc_b", "hamming"))
    // protocol-visible: the clone lane's (202, 303) identical pair
    assert(live.collect().exists(r => r.getAs[Long]("doc_a") == 202L &&
      r.getAs[Long]("doc_b") == 303L && r.getAs[Long]("hamming") == 0L))
  }
}
