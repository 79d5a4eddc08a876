package graft.media

/** Pure-JVM WAV (RIFF/PCM) codec — the audio leg of the multimodal surface.
  * Real format logic: RIFF container walk (chunk id + little-endian u32
  * size, word-aligned), fmt chunk field extraction (audio format, channel
  * count, sample rate, bits per sample), and 16-bit signed little-endian
  * PCM sample decode. Format facts follow the public RIFF/WAVE
  * specification (Microsoft/IBM multimedia file format).
  *
  * Like [[Png]]: the encoder synthesizes REAL decodable media for fixtures
  * (the sandbox ships no audio files); the decoder is the production path.
  * MultimodalSpec cross-validates both against the JDK's independent
  * `javax.sound.sampled.AudioSystem` reader on identical bytes.
  */
object Wav {

  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Int])

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)).toShort.toInt

  private def ascii(b: Array[Byte], off: Int): String = new String(b, off, 4, "US-ASCII")

  /** Encode 16-bit signed PCM samples (interleaved if multi-channel, each in
    * [-32768, 32767]) as a canonical RIFF/WAVE file. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Int]): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0, "partial frame")
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                                   // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2)             // byte rate
      .putShort((channels * 2).toShort)              // block align
      .putShort(16)                                  // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach { s =>
      require(s >= Short.MinValue && s <= Short.MaxValue, s"sample $s out of s16 range")
      buf.putShort(s.toShort)
    }
    buf.array()
  }

  /** Decode a PCM16 RIFF/WAVE file by walking the chunk stream — unknown
    * chunks are skipped by their declared size (word-aligned), so files with
    * LIST/INFO metadata between fmt and data parse correctly. */
  def decode(wav: Array[Byte]): Audio = {
    require(wav.length >= 12 && ascii(wav, 0) == "RIFF" && ascii(wav, 8) == "WAVE",
      "not a RIFF/WAVE file")
    val riffLen = leInt(wav, 4)
    require(riffLen >= 4 && riffLen.toLong + 8L <= wav.length, "truncated RIFF payload")
    var pos = 12
    var sampleRate = -1; var channels = -1; var bits = -1; var fmt = -1
    var samples: Array[Int] = null
    while (pos + 8 <= riffLen + 8 && (samples == null || sampleRate < 0)) {
      val id = ascii(wav, pos)
      val len = leInt(wav, pos + 4)
      // long math: a declared length near Int.MaxValue would wrap the int
      // bound negative and pass, then index past the array below
      require(len >= 0 && pos.toLong + 8L + len <= wav.length, s"truncated chunk $id")
      id match {
        case "fmt " =>
          // the PCM fmt payload is 16 bytes; a shorter declared chunk would
          // let the field reads below run past the chunk into whatever
          // follows (or off the end of the file)
          require(len >= 16, s"fmt chunk too short: $len")
          fmt = leShort(wav, pos + 8)
          channels = leShort(wav, pos + 10)
          sampleRate = leInt(wav, pos + 12)
          bits = leShort(wav, pos + 22)
          require(fmt == 1, s"unsupported audio format $fmt (PCM only)")
          require(bits == 16, s"unsupported bit depth $bits")
        case "data" =>
          require(fmt == 1, "data chunk before fmt")
          require(len % 2 == 0, "odd PCM16 data length")
          samples = Array.tabulate(len / 2)(i => leShort(wav, pos + 8 + i * 2))
        case _ => () // ancillary chunk (LIST, fact, ...) — skip
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && channels > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    require(samples.length % channels == 0, "partial trailing frame")
    Audio(sampleRate, channels, samples)
  }
}
