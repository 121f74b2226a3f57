package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.PgmCodec

/** Real-image-path properties: the PGM codec is a genuine decoder, so the
  * round trip, resize, perceptual hash and corruption handling are all
  * directly assertable.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

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
}
