package graft

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input contract for the media codecs: for ANY byte string,
  * `decode` either returns a well-formed result or throws
  * `IllegalArgumentException` — never an index error, negative-size
  * allocation, zip internal, OOM, or hang. At 100 TB the binary columns are
  * crawled bytes; the decode stage meeting a malformed file must fail as a
  * per-row data error a pipeline can quarantine ([[graft.ops.DqOps]]), not
  * kill the executor.
  *
  * Deterministic fuzz (fixed-seed PRNG): systematic truncations, single-byte
  * flips across the structural header region, random flips over the whole
  * file, and declared-length tampering (the int-overflow and
  * decompression-bomb cases that motivated the codecs' long-math bounds).
  */
class MediaFuzzSpec extends AnyFunSuite {

  private def wellFormedOrIae[A](tag: String)(body: => A): Unit =
    try { body; () } catch {
      case _: IllegalArgumentException => ()
      case t: Throwable => fail(s"$tag: leaked ${t.getClass.getName}: ${t.getMessage}")
    }

  private val pngBytes: Array[Byte] = {
    val w = 13; val h = 11; val ch = 3
    graft.media.Png.encode(w, h, ch,
      Array.tabulate(w * h * ch)(i => (i * 31 + 7) % 256), y => y % 5)
  }

  private val wavBytes: Array[Byte] =
    graft.media.Wav.encode(16000, 2, Array.tabulate(64)(i => (i * 911 % 65536) - 32768))

  test("png: every truncation either decodes or throws IAE") {
    (0 until pngBytes.length).foreach { n =>
      wellFormedOrIae(s"png truncated to $n")(graft.media.Png.decode(pngBytes.take(n)))
    }
  }

  test("wav: every truncation either decodes or throws IAE") {
    (0 until wavBytes.length).foreach { n =>
      wellFormedOrIae(s"wav truncated to $n")(graft.media.Wav.decode(wavBytes.take(n)))
    }
  }

  test("png/wav: single-byte corruption never leaks a non-IAE failure") {
    val rnd = new scala.util.Random(42)
    def flipEach(bytes: Array[Byte], tag: String,
                 dec: Array[Byte] => Any): Unit = {
      // exhaustive over the structural prefix, sampled over the payload
      val positions = (0 until math.min(64, bytes.length)) ++
        Seq.fill(256)(rnd.nextInt(bytes.length))
      positions.foreach { p =>
        val mutated = bytes.clone()
        mutated(p) = (mutated(p) ^ (1 << rnd.nextInt(8))).toByte
        wellFormedOrIae(s"$tag flip@$p")(dec(mutated))
      }
    }
    flipEach(pngBytes, "png", graft.media.Png.decode)
    flipEach(wavBytes, "wav", graft.media.Wav.decode)
  }

  test("png/wav: hostile declared chunk lengths (int overflow) throw IAE") {
    // PNG: IHDR length field lives at offset 8; plant 0x7fffffff
    val p = pngBytes.clone()
    p(8) = 0x7f.toByte; p(9) = 0xff.toByte; p(10) = 0xff.toByte; p(11) = 0xff.toByte
    intercept[IllegalArgumentException](graft.media.Png.decode(p))
    // WAV: fmt chunk length field lives at offset 16
    val v = wavBytes.clone()
    v(16) = 0xff.toByte; v(17) = 0xff.toByte; v(18) = 0xff.toByte; v(19) = 0x7f.toByte
    intercept[IllegalArgumentException](graft.media.Wav.decode(v))
    // WAV: fmt chunk declaring fewer bytes than its 16 PCM fields
    val s = wavBytes.clone()
    s(16) = 4; s(17) = 0; s(18) = 0; s(19) = 0
    intercept[IllegalArgumentException](graft.media.Wav.decode(s))
  }

  test("png: a 33-byte decompression bomb is refused before allocation") {
    // hand-rolled PNG declaring 20000x20000 RGBA (1.6 GiB decoded) with a
    // valid CRC — must die on the declared-size guard, not on allocation
    val out = new java.io.ByteArrayOutputStream
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(20000).putInt(20000)
    ihdr.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val data = ihdr.array()
    out.write(Array[Byte](0, 0, 0, 13))
    val t = "IHDR".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(data)
    out.write(t); out.write(data)
    val cv = crc.getValue
    out.write(Array((cv >>> 24).toByte, (cv >>> 16).toByte, (cv >>> 8).toByte, cv.toByte))
    val iend = "IEND".getBytes("US-ASCII")
    val crc2 = new java.util.zip.CRC32
    crc2.update(iend)
    out.write(Array[Byte](0, 0, 0, 0)); out.write(iend)
    val cv2 = crc2.getValue
    out.write(Array((cv2 >>> 24).toByte, (cv2 >>> 16).toByte, (cv2 >>> 8).toByte, cv2.toByte))
    val e = intercept[IllegalArgumentException](graft.media.Png.decode(out.toByteArray))
    assert(e.getMessage.contains("bomb"), s"wrong failure: ${e.getMessage}")
  }

  test("fuzzed inputs that DO decode still decode identically to the original") {
    // sanity: the contract tests above must not be vacuous — the pristine
    // files decode and round-trip
    val img = graft.media.Png.decode(pngBytes)
    assert(img.width == 13 && img.height == 11 && img.channels == 3)
    val au = graft.media.Wav.decode(wavBytes)
    assert(au.sampleRate == 16000 && au.channels == 2 && au.samples.length == 64)
  }
}
