package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Dedup
import graft.operators.Multimodal.{PgmCodec, WavCodec}

/** Property-based hardening of the hand-rolled kernels: the PGM codec and
  * resize (pure JVM — true generator sweeps), the rolling hash against an
  * independent BigInt reference (batched through one Spark job), and
  * connected components against a driver-side union-find on random graphs.
  * Uses scalacheck Gen directly with a fixed seed (the scalatest bridge
  * artifact isn't in the offline cache) so failures are reproducible.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  private def forAllSamples[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    // count executed cases: a generator that starts returning None (e.g. a
    // future suchThat) must fail the property, not green-light vacuously
    val executed = (0 until n).count { i =>
      val s = g.apply(Gen.Parameters.default, Seed(i.toLong))
      s.foreach(f)
      s.isDefined
    }
    assert(executed >= n * 8 / 10, s"only $executed/$n generator samples executed")
  }

  test("PGM encode/decode round-trips arbitrary dims and pixel bytes") {
    val genImg = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
      px <- Gen.containerOfN[Array, Byte](w * h, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (w, h, px)
    forAllSamples(genImg) { case (w, h, px) =>
      val img = PgmCodec.decode(PgmCodec.encode(w, h, px))
      assert(img.exists(i => i.width == w && i.height == h && i.pixels.toSeq == px.toSeq))
    }
  }

  test("WAV encode/decode round-trips arbitrary rates and samples") {
    val genWav = for {
      rate <- Gen.choose(1, 192000)
      n <- Gen.choose(0, 2000)
      samples <- Gen.containerOfN[Array, Short](n,
        Gen.choose(Short.MinValue, Short.MaxValue))
    } yield (rate, samples)
    forAllSamples(genWav) { case (rate, samples) =>
      val a = WavCodec.decode(WavCodec.encode(rate, samples))
      assert(a.exists(x => x.sampleRate == rate && x.samples.toSeq == samples.toSeq))
    }
  }

  test("WAV decode never throws on arbitrary byte garbage (incl. RIFF-prefixed)") {
    val genBytes = Gen.oneOf(
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue)),
      // garbage AFTER a valid RIFF/WAVE preamble exercises the chunk walker
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(tail => "RIFFxxxxWAVE".getBytes("US-ASCII") ++ tail))
    forAllSamples(genBytes) { bytes =>
      WavCodec.decode(bytes) // may be Some or None; must not throw
      assert(true)
    }
  }

  test("PGM decode never throws on arbitrary byte garbage") {
    forAllSamples(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      PgmCodec.decode(bytes) // may be Some or None; must not throw
      assert(true)
    }
  }

  test("block-average resize of a constant image is constant, any dims") {
    forAllSamples(Gen.zip(Gen.choose(8, 64), Gen.choose(8, 64), Gen.choose(0, 255))) { case (w, h, v) =>
      val img = PgmCodec.Image(w, h, Array.fill(w * h)(v.toByte))
      assert(PgmCodec.resize(img, 8).forall(_ == v))
      assert(PgmCodec.aHash(img) == 0L)
    }
  }

  test("rolling hash matches an independent BigInt reference on random unicode text") {
    // one Spark job for the whole sample: per-case jobs would be O(N) jobs
    // alphabet spans ASCII, BMP multibyte AND astral (surrogate-pair) code
    // points — an implementation iterating UTF-16 chars instead of code
    // points would only be caught by the astral cases
    val astral = Gen.listOf(Gen.choose(0x10000, 0x1FFFF))
      .map(_.flatMap(cp => Character.toChars(cp).toSeq).mkString)
    val strings = Gen.listOfN(300, Gen.oneOf(
      Gen.asciiPrintableStr,
      astral,
      Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('的', '是', 'ß', 'é', ' '))).map(_.mkString)))
      .apply(Gen.Parameters.default, Seed(7L)).getOrElse(Nil).distinct
    assert(strings.size > 100)
    assert(strings.exists(_.exists(Character.isHighSurrogate)), "no astral case generated")
    def reference(s: String): Long = {
      var h = BigInt(0)
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31 + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      h.toLong
    }
    import spark.implicits._
    val got = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
      .select(col("id"), graft.functions.RollingHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    strings.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) == reference(s), s"mismatch on ${s.take(40).toList}")
    }
  }

  test("connected components agree with a driver-side union-find on random graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 4) {
      val n = 30
      val edges = (1 to 40).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // reference: union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v.toInt).toLong).toMap
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
    }
  }
}
