package graft.media

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec — REAL format logic, no external libraries: chunk
  * framing + CRC32, zlib inflate/deflate via `java.util.zip`, and the five
  * scanline filters (None/Sub/Up/Average/Paeth) in both directions. Supports
  * the 8-bit-depth color types a training pipeline actually meets in bulk:
  * greyscale (0), truecolor RGB (2) and RGBA (6), non-interlaced.
  *
  * Format facts follow the public PNG specification (RFC 2083 / W3C PNG):
  * 8-byte signature, length+type+data+CRC chunk layout, IHDR field order,
  * IDAT = zlib stream of filter-byte-prefixed scanlines, Paeth predictor.
  *
  * The encoder exists so the engine can synthesize REAL decodable media in
  * tests and fixtures (the sandbox testdata ships no media); the decoder is
  * the production path. MultimodalSpec cross-validates both against the
  * JDK's independent ImageIO codec on identical bytes.
  */
object Png {

  final case class Image(width: Int, height: Int, channels: Int, samples: Array[Int])

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // greyscale
    case 2 => 3 // truecolor
    case 6 => 4 // truecolor + alpha
    case t => throw new IllegalArgumentException(s"unsupported PNG color type $t")
  }

  private def colorTypeOf(channels: Int): Int = channels match {
    case 1 => 0
    case 3 => 2
    case 4 => 6
    case c => throw new IllegalArgumentException(s"unsupported channel count $c")
  }

  /** a = left, b = above, c = upper-left — the spec's predictor. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ---------------------------------------------------------------- encode

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = data.length
    out.write(Array((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte))
    val t = typ.getBytes("US-ASCII")
    val crc = new CRC32
    crc.update(t); crc.update(data)
    out.write(t); out.write(data)
    val v = crc.getValue
    out.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
  }

  /** Encode 8-bit samples (row-major, `channels` per pixel, each 0..255) as
    * a valid PNG. `filterForRow` picks the scanline filter type (0-4) per
    * row, so tests can force every filter through the decoder. */
  def encode(width: Int, height: Int, channels: Int, samples: Array[Int],
             filterForRow: Int => Int = _ => 0): Array[Byte] = {
    require(samples.length == width * height * channels,
      s"expected ${width * height * channels} samples, got ${samples.length}")
    val bpp = channels
    val stride = width * channels
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val f = filterForRow(y)
      require(f >= 0 && f <= 4, s"filter $f")
      raw(y * (1 + stride)) = f.toByte
      var i = 0
      while (i < stride) {
        val cur = samples(y * stride + i)
        val left = if (i >= bpp) samples(y * stride + i - bpp) else 0
        val up = if (y > 0) samples((y - 1) * stride + i) else 0
        val upLeft = if (y > 0 && i >= bpp) samples((y - 1) * stride + i - bpp) else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 => cur - paeth(left, up, upLeft)
        }
        raw(y * (1 + stride) + 1 + i) = (filtered & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val zipped = new java.io.ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zipped.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream
    out.write(Signature)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte).put(colorTypeOf(channels).toByte) // bit depth 8
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte)       // deflate, adaptive, no interlace
    chunk(out, "IHDR", ihdr.array())
    chunk(out, "IDAT", zipped.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  /** Encode with ancillary tEXt metadata chunks (RFC 2083 §4.2.3: Latin-1
    * keyword, NUL separator, Latin-1 text), spliced between IHDR and IDAT —
    * the standard position, and what [[textChunks]] and any compliant
    * viewer expect. Keywords per spec: 1–79 bytes, no NUL. */
  def encodeWithText(width: Int, height: Int, channels: Int, samples: Array[Int],
                     texts: Seq[(String, String)]): Array[Byte] = {
    val base = encode(width, height, channels, samples)
    if (texts.isEmpty) base
    else {
      val cut = 8 + 12 + 13 // signature + complete IHDR chunk (len+type+13+crc)
      val out = new java.io.ByteArrayOutputStream
      out.write(base, 0, cut)
      texts.foreach { case (k, v) =>
        require(k.nonEmpty && k.length <= 79 && !k.contains('\u0000') && !v.contains('\u0000'),
          s"invalid tEXt keyword/value: '$k'")
        chunk(out, "tEXt", (k + "\u0000" + v).getBytes("ISO-8859-1"))
      }
      out.write(base, cut, base.length - cut)
      out.toByteArray
    }
  }

  /** Walk the chunk stream and return every tEXt (keyword, value) pair in
    * file order — metadata extraction WITHOUT decoding the image payload
    * (the 100 TB routing read: chunk headers + text bytes only, the IDAT
    * body is skipped over, never inflated). Same hostile-bytes hardening
    * as [[decode]]: signature check, long-math chunk bounds, per-chunk
    * CRC32 verification. */
  def textChunks(png: Array[Byte]): Seq[(String, String)] = {
    require(png.length > 8 && Signature.indices.forall(i => png(i) == Signature(i)),
      "not a PNG: bad signature")
    val res = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var pos = 8
    var sawEnd = false
    while (pos + 8 <= png.length && !sawEnd) {
      val len = beInt(png, pos)
      val typ = new String(png, pos + 4, 4, "US-ASCII")
      require(len >= 0 && pos.toLong + 12L + len <= png.length, s"truncated chunk $typ")
      val crc = new CRC32
      crc.update(png, pos + 4, 4 + len)
      require(crc.getValue == (beInt(png, pos + 8 + len).toLong & 0xffffffffL),
        s"CRC mismatch in $typ")
      if (typ == "tEXt") {
        val data = new String(png, pos + 8, len, "ISO-8859-1")
        val sep = data.indexOf('\u0000')
        require(sep > 0, "tEXt chunk missing NUL keyword separator")
        res += ((data.substring(0, sep), data.substring(sep + 1)))
      }
      if (typ == "IEND") sawEnd = true
      pos += 12 + len
    }
    require(sawEnd, "no IEND chunk")
    res.toSeq
  }

  /** Re-emit `png` with every ANCILLARY chunk removed — the image analog of
    * a PII scrub before publishing/training: tEXt/zTXt/tIME/eXIf and friends
    * carry provenance, timestamps, and free-form text; the pixel payload
    * must survive byte-identically. Per the PNG spec a chunk is ancillary
    * iff bit 5 of the FIRST type byte is set (lowercase first letter), so
    * the walk needs no chunk-name whitelist and strips metadata chunks it
    * has never heard of — exactly what a privacy scrub wants. Critical
    * chunks (IHDR/PLTE/IDAT/IEND) are copied through byte-identically (CRCs
    * are per-chunk — carried chunks need no recompute). Same hostile-bytes
    * hardening as [[decode]]: signature check, long-math chunk bounds,
    * per-chunk CRC32 verification BEFORE a chunk is carried or dropped. */
  def stripAncillary(png: Array[Byte]): Array[Byte] = {
    require(png.length > 8 && Signature.indices.forall(i => png(i) == Signature(i)),
      "not a PNG: bad signature")
    val out = new java.io.ByteArrayOutputStream(png.length)
    out.write(png, 0, 8)
    var pos = 8
    var sawEnd = false
    while (pos + 8 <= png.length && !sawEnd) {
      val len = beInt(png, pos)
      val typ = new String(png, pos + 4, 4, "US-ASCII")
      require(len >= 0 && pos.toLong + 12L + len <= png.length, s"truncated chunk $typ")
      val crc = new CRC32
      crc.update(png, pos + 4, 4 + len)
      require(crc.getValue == (beInt(png, pos + 8 + len).toLong & 0xffffffffL),
        s"CRC mismatch in $typ")
      val ancillary = (png(pos + 4) & 0x20) != 0
      if (!ancillary) out.write(png, pos, 12 + len)
      if (typ == "IEND") sawEnd = true
      pos += 12 + len
    }
    require(sawEnd, "no IEND chunk")
    out.toByteArray
  }

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Decode a PNG (8-bit depth, color type 0/2/6, non-interlaced). Walks the
    * chunk stream verifying CRCs, inflates the concatenated IDAT zlib
    * stream, and reverses the per-scanline filter. */
  def decode(png: Array[Byte]): Image = {
    require(png.length > 8 && Signature.indices.forall(i => png(i) == Signature(i)),
      "not a PNG: bad signature")
    var pos = 8
    var width = -1; var height = -1; var channels = -1
    val idat = new java.io.ByteArrayOutputStream
    var sawEnd = false
    while (pos + 8 <= png.length && !sawEnd) {
      val len = beInt(png, pos)
      val typ = new String(png, pos + 4, 4, "US-ASCII")
      // long math: a hostile length near Int.MaxValue would wrap `pos+12+len`
      // negative and sail past an int-math bound straight into CRC32/array
      // reads — the classic parser overflow
      require(len >= 0 && pos.toLong + 12L + len <= png.length, s"truncated chunk $typ")
      val crc = new CRC32
      crc.update(png, pos + 4, 4 + len)
      require(crc.getValue == (beInt(png, pos + 8 + len).toLong & 0xffffffffL),
        s"CRC mismatch in $typ")
      typ match {
        case "IHDR" =>
          width = beInt(png, pos + 8); height = beInt(png, pos + 12)
          val bitDepth = png(pos + 16) & 0xff
          require(bitDepth == 8, s"unsupported bit depth $bitDepth")
          channels = channelsOf(png(pos + 17) & 0xff)
          require((png(pos + 20) & 0xff) == 0, "interlaced PNG unsupported")
        case "IDAT" => idat.write(png, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunk — skip
      }
      pos += 12 + len
    }
    require(width > 0 && height > 0 && channels > 0, "missing IHDR")
    require(sawEnd, "missing IEND")
    val bpp = channels
    // Decompression-bomb guard: IHDR dimensions are attacker-controlled and
    // a 33-byte file can declare a multi-GiB pixel buffer. Bound the DECODED
    // size (checked in long math before any allocation); 1 GiB of samples is
    // far above any fixture and far below heap-killing territory.
    val rawLenL = height.toLong * (1L + width.toLong * channels)
    require(rawLenL <= (1L << 30),
      s"refusing ${rawLenL}B decoded pixel buffer (decompression-bomb guard)")
    val stride = width * channels
    val raw = new Array[Byte](rawLenL.toInt)
    val inflater = new Inflater
    inflater.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        require(n > 0 || inflater.finished(), "truncated IDAT stream")
        off += n
      }
    } catch {
      // malformed zlib must surface as the same contract violation as any
      // other corrupt input, not a checked zip internal
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"corrupt IDAT zlib stream: ${e.getMessage}")
    } finally inflater.end()
    require(off == raw.length, s"short pixel data: $off of ${raw.length}")
    val samples = new Array[Int](height * stride)
    var y = 0
    while (y < height) {
      val f = raw(y * (1 + stride)) & 0xff
      var i = 0
      while (i < stride) {
        val x = raw(y * (1 + stride) + 1 + i) & 0xff
        val left = if (i >= bpp) samples(y * stride + i - bpp) else 0
        val up = if (y > 0) samples((y - 1) * stride + i) else 0
        val upLeft = if (y > 0 && i >= bpp) samples((y - 1) * stride + i - bpp) else 0
        val recon = f match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + ((left + up) >> 1)
          case 4 => x + paeth(left, up, upLeft)
          case other => throw new IllegalArgumentException(s"bad filter $other in row $y")
        }
        samples(y * stride + i) = recon & 0xff
        i += 1
      }
      y += 1
    }
    Image(width, height, channels, samples)
  }
}
