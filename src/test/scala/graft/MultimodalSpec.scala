package graft

import graft.ops.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal path runs a REAL codec ([[graft.media.Png]]): round-trip
  * per filter/color-type, cross-validation against the JDK's independent
  * ImageIO decoder, corruption rejection, and frame-sampling alignment. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def testImage(w: Int, h: Int, ch: Int): Array[Int] = {
    val px = new Array[Int](w * h * ch)
    var i = 0
    while (i < px.length) { px(i) = (i * 37 + (i * i) % 251) % 256; i += 1 }
    px
  }

  test("png codec: encode/decode round-trips every filter type and color type") {
    for (ch <- Seq(1, 3, 4); f <- 0 to 4) {
      val (w, h) = (13, 7) // deliberately asymmetric, not byte-aligned to 4
      val px = testImage(w, h, ch)
      val bytes = graft.media.Png.encode(w, h, ch, px, _ => f)
      val img = graft.media.Png.decode(bytes)
      assert((img.width, img.height, img.channels) == ((w, h, ch)), s"ch=$ch f=$f")
      assert(img.samples.sameElements(px), s"pixel mismatch ch=$ch filter=$f")
    }
  }

  test("png codec: agrees byte-for-byte with the JDK's independent ImageIO decoder") {
    val (w, h, ch) = (11, 9, 3)
    val px = testImage(w, h, ch)
    val bytes = graft.media.Png.encode(w, h, ch, px, y => y % 5) // all filters in one file
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(jdk != null, "ImageIO must accept our encoder's output as a valid PNG")
    assert((jdk.getWidth, jdk.getHeight) == ((w, h)))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = jdk.getRGB(x, y)
      val expected = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      val got = (px((y * w + x) * ch), px((y * w + x) * ch + 1), px((y * w + x) * ch + 2))
      assert(expected == got, s"pixel ($x,$y): ImageIO=$expected ours=$got")
    }
    // and the reverse: ImageIO-encoded bytes decode identically through ours
    val img2 = java.awt.image.BufferedImage
      .TYPE_3BYTE_BGR
    val buf = new java.awt.image.BufferedImage(w, h, img2)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * ch
      buf.setRGB(x, y, (px(i) << 16) | (px(i + 1) << 8) | px(i + 2))
    }
    val out = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(buf, "png", out)
    val ours = graft.media.Png.decode(out.toByteArray)
    assert((ours.width, ours.height, ours.channels) == ((w, h, 3)))
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      assert((ours.samples(i), ours.samples(i + 1), ours.samples(i + 2)) ==
        ((px(i), px(i + 1), px(i + 2))), s"reverse pixel ($x,$y)")
    }
  }

  test("png codec: rejects corrupted bytes (CRC, signature, truncation)") {
    val px = testImage(5, 4, 3)
    val good = graft.media.Png.encode(5, 4, 3, px)
    val badSig = good.clone(); badSig(1) = 'Q'.toByte
    assertThrows[IllegalArgumentException](graft.media.Png.decode(badSig))
    val badCrc = good.clone(); badCrc(20) = (badCrc(20) ^ 0x01).toByte // inside IHDR data
    assertThrows[IllegalArgumentException](graft.media.Png.decode(badCrc))
    assertThrows[IllegalArgumentException](graft.media.Png.decode(good.take(good.length - 6)))
  }

  test("decode_features: REAL decode matches the pixel-formula ground truth per doc") {
    val df = MultimodalOps.multimodalDecodeFeatures.fn(spark, TestSpark.sf0001)
    assert(df.columns.sameElements(
      Array("doc_id", "width", "height", "channels", "mean_sample")))
    val rows = df.collect()
    val ids = graft.tables.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(rows.length == ids.length)
    rows.zip(ids).foreach { case (r, id) =>
      assert(r.getLong(0) == id)
      val (w, h) = ((8 + id % 8).toInt, (8 + id % 5).toInt)
      val ch = (id % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((w, h, ch)))
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        sum += (x * 3 + y * 7 + c * 11 + id) % 256
      assert(r.getDouble(4) == sum.toDouble / (w.toLong * h * ch))
    }
  }

  test("wav codec: round-trips PCM16 mono and stereo, including extremes") {
    for (ch <- Seq(1, 2)) {
      val samples = Array.tabulate(97 * ch)(i => ((i * 1231) % 65536) - 32768)
      samples(0) = Short.MinValue.toInt; samples(1) = Short.MaxValue.toInt
      val bytes = graft.media.Wav.encode(22050, ch, samples)
      val a = graft.media.Wav.decode(bytes)
      assert((a.sampleRate, a.channels) == ((22050, ch)))
      assert(a.samples.sameElements(samples), s"ch=$ch")
    }
  }

  test("wav codec: agrees with the JDK's independent AudioSystem reader") {
    val samples = Array.tabulate(64)(i => (i * 911 % 65536) - 32768)
    val bytes = graft.media.Wav.encode(16000, 1, samples)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert((fmt.getSampleRate.toInt, fmt.getChannels, fmt.getSampleSizeInBits) == ((16000, 1, 16)))
    val raw = in.readAllBytes()
    assert(raw.length == samples.length * 2)
    val jdk = Array.tabulate(samples.length)(i =>
      (((raw(2 * i) & 0xff) | ((raw(2 * i + 1) & 0xff) << 8)).toShort).toInt)
    assert(jdk.sameElements(samples), "JDK-decoded PCM must equal our samples")
  }

  test("wav codec: skips ancillary chunks and rejects corruption") {
    val samples = Array.tabulate(10)(_ * 100)
    val good = graft.media.Wav.encode(8000, 1, samples)
    // splice a LIST chunk (odd-sized, to exercise word alignment) between
    // fmt and data: bytes 0..35 are RIFF+fmt, 36.. is the data chunk
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](5, 0, 0, 0) ++
      "INFOx".getBytes("US-ASCII") ++ Array[Byte](0) // pad to even
    val spliced = good.take(36) ++ list ++ good.drop(36)
    // patch the RIFF size for the inserted bytes
    val riffLen = good.length - 8 + list.length
    spliced(4) = (riffLen & 0xff).toByte; spliced(5) = ((riffLen >> 8) & 0xff).toByte
    spliced(6) = ((riffLen >> 16) & 0xff).toByte; spliced(7) = ((riffLen >> 24) & 0xff).toByte
    val a = graft.media.Wav.decode(spliced)
    assert(a.samples.sameElements(samples), "LIST chunk must be skipped")
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](graft.media.Wav.decode(badMagic))
    assertThrows[IllegalArgumentException](graft.media.Wav.decode(good.take(30)))
  }

  test("decode_wav: REAL decode matches the sample-formula ground truth per doc") {
    val rows = MultimodalOps.multimodalDecodeWav.fn(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4), r.getInt(5)))).toMap
    val ids = graft.tables.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id").collect().map(_.getLong(0))
    assert(rows.keySet == ids.toSet)
    ids.foreach { id =>
      val frames = (256 + id % 256).toInt
      val ch = (1 + id % 2).toInt
      val rate = (id % 3) match { case 0 => 8000; case 1 => 16000; case _ => 44100 }
      val vals = for (i <- 0 until frames; c <- 0 until ch)
        yield (((i * 37L + c * 1009L + id * 13L) % 65536L) - 32768L).toInt
      assert(rows(id) == ((rate, ch, frames,
        vals.map(_.toLong).sum.toDouble / vals.length, vals.map(math.abs).max)), s"doc $id")
    }
  }

  test("audio_frames: features match a recompute from the JDK's independent decoder") {
    val got = MultimodalOps.multimodalAudioFrames.fn(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) ->
        ((r.getInt(3), r.getLong(4), r.getInt(5), r.getDouble(6)))).toMap
    val ids = graft.tables.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id").collect().map(_.getLong(0))

    val expected = ids.flatMap { id =>
      // independent path: JDK AudioSystem decodes the same bytes
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(MultimodalOps.syntheticWav(id)))
      val ch = in.getFormat.getChannels
      val raw = in.readAllBytes()
      val all = Array.tabulate(raw.length / 2)(i =>
        (((raw(2 * i) & 0xff) | ((raw(2 * i + 1) & 0xff) << 8)).toShort).toInt)
      val perCh = all.length / ch
      for (c <- 0 until ch; f <- 0 to (perCh - 1) / 256) yield {
        val idx = (f * 256 until math.min((f + 1) * 256, perCh)).map(j => all(j * ch + c))
        val zc = idx.sliding(2).count(p =>
          p.length == 2 && ((p(0) < 0 && p(1) >= 0) || (p(0) >= 0 && p(1) < 0)))
        val sumSq = idx.map(v => v.toLong * v).sum
        (id, c, f) -> ((idx.length, sumSq, zc, sumSq.toDouble / idx.length))
      }
    }.toMap

    assert(got.keySet == expected.keySet, "frame partition must cover exactly all frames")
    expected.foreach { case (k, v) => assert(got(k) == v, s"frame $k") }
  }

  test("resize: box downscale matches a codec-free recompute on every doc") {
    val rows = MultimodalOps.multimodalResize.fn(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))).toMap
    val ids = graft.tables.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id").collect().map(_.getLong(0))
    assert(rows.keySet == ids.toSet)
    ids.foreach { id =>
      // independent reference: straight from the pixel formula, no codec
      val (w, h) = ((8 + id % 8).toInt, (8 + id % 5).toInt)
      val ch = (id % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
      val (rw, rh) = ((w + 1) / 2, (h + 1) / 2)
      var total = 0L
      for (by <- 0 until rh; bx <- 0 until rw; c <- 0 until ch) {
        val xs = (bx * 2) until math.min(bx * 2 + 2, w)
        val ys = (by * 2) until math.min(by * 2 + 2, h)
        val block = for (y <- ys; x <- xs) yield (x * 3 + y * 7 + c * 11 + id) % 256
        total += block.sum / block.size
      }
      assert(rows(id) == ((rw, rh, ch, total.toDouble / (rw.toLong * rh * ch))), s"doc $id")
    }
  }

  test("parse_png: a real PNG header parses byte-for-byte (golden fixture)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // The literal first 26 bytes of a real 256x192 8-bit RGB PNG: signature,
    // IHDR length 13, "IHDR", width 0x00000100, height 0x000000C0,
    // bit depth 8, color type 2 (truecolor).
    val golden: Array[Byte] = Array(
      0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n',
      0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',
      0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x00, 0xc0,
      0x08, 0x02).map(_.toByte)
    val out = Seq(Tuple1(golden)).toDF("payload")
      .select(MultimodalOps.parsePng(col("payload")).as("r"))
      .select("r.sig_ok", "r.width", "r.height", "r.bit_depth", "r.color_type")
      .collect().head
    assert(out.getBoolean(0), "valid signature must verify")
    assert((out.getInt(1), out.getInt(2), out.getInt(3), out.getInt(4)) == ((256, 192, 8, 2)))
    // and a corrupted signature must NOT verify
    val bad = golden.clone(); bad(0) = 0x88.toByte
    val badOut = Seq(Tuple1(bad)).toDF("payload")
      .select(MultimodalOps.parsePng(col("payload")).as("r"))
      .select("r.sig_ok").collect().head
    assert(!badOut.getBoolean(0), "corrupted signature must fail verification")
  }

  test("frame_sample: frames reassemble to the original payload") {
    import spark.implicits._
    val frames = MultimodalOps.multimodalFrameSample.fn(spark, TestSpark.sf0001)
    val rebuilt = frames.orderBy("doc_id", "frame_idx")
      .as[(Long, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).mkString).toMap
    val original = graft.tables.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(rebuilt == original)
    // every frame but the last is exactly 16 bytes
    val bad = frames.as[(Long, Int, String)].collect()
      .groupBy(_._1).values.flatMap(fs => fs.sortBy(_._2).dropRight(1))
      .filter(_._3.length != 16)
    assert(bad.isEmpty)
  }

  test("dhash: total over every synthetic size, including w=8 (9-col pigeonhole)") {
    // doc_id % 8 == 0 gives w=8 — a 9-column box partition would leave an
    // empty column; the point-sampled grid must still produce a hash.
    for (id <- 0L to 120L) {
      val (hi, lo) = MultimodalOps.dhash(graft.media.Png.decode(MultimodalOps.syntheticPng(id)))
      assert(hi >= 0L && hi < (1L << 32), s"hi half out of u32 range for doc $id")
      assert(lo >= 0L && lo < (1L << 32), s"lo half out of u32 range for doc $id")
    }
  }

  test("dhash: matches a direct model recomputation on JDK-decoded pixels") {
    val (w, h, ch) = (40, 25, 3)
    val px = testImage(w, h, ch)
    val img = graft.media.Png.decode(graft.media.Png.encode(w, h, ch, px, _ % 5))
    def luma(x: Int, y: Int): Long =
      (299L * px((y * w + x) * ch) + 587L * px((y * w + x) * ch + 1) +
        114L * px((y * w + x) * ch + 2)) / 1000L
    var expHi = 0L; var expLo = 0L
    for (gy <- 0 until 8; gx <- 0 until 8) {
      val sy = gy * h / 8
      if (luma(gx * w / 9, sy) < luma((gx + 1) * w / 9, sy)) {
        val b = gy * 8 + gx
        if (b < 32) expLo |= 1L << b else expHi |= 1L << (b - 32)
      }
    }
    assert(MultimodalOps.dhash(img) == ((expHi, expLo)))
  }

  test("dedup_image_phash: banded pairs equal the brute-force all-pairs census") {
    import spark.implicits._
    val got = MultimodalOps.dedupImagePhash.fn(spark, TestSpark.sf0001)
      .as[(Long, Long, Int)].collect().toSet
    val sigs = graft.tables.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id").as[Long].collect()
      .map { id =>
        val (hi, lo) =
          MultimodalOps.dhash(graft.media.Png.decode(MultimodalOps.syntheticPngDiverse(id)))
        id -> ((hi << 32) | lo)
      }
    val expected = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      ham = java.lang.Long.bitCount(sa ^ sb) if ham <= 7
    } yield (a, b, ham)).toSet
    assert(got == expected, "banded Hamming join must equal the exact all-pairs result")
    assert(expected.nonEmpty, "fixture degenerate: no near-duplicate image pairs to find")
    // the planted predecessor pairs (doc_id ≡ 1 mod 50) are all caught, and
    // pair volume is linear-ish, not quadratic (a real curation corpus)
    val planted = sigs.map(_._1).filter(id => id % 50 == 1 && sigs.exists(_._1 == id - 1))
    assert(planted.nonEmpty && planted.forall(id => expected.exists(p => p._1 == id - 1 && p._2 == id)),
      "a planted near-duplicate image escaped the banded join")
    assert(expected.size < sigs.length * 4, s"pair volume ${expected.size} looks quadratic")
  }

  test("dedup_image_cluster_keep: components match a union-find over the exact pairs") {
    import spark.implicits._
    val got = MultimodalOps.dedupImageClusterKeep.fn(spark, TestSpark.sf0001)
      .as[(Long, Long)].collect().toMap
    val pairs = MultimodalOps.dedupImagePhash.fn(spark, TestSpark.sf0001)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = nodes.map(n => n -> nodes.filter(m => find(m) == find(n)).min).toMap
    assert(got == expected)
    // each image maps to its component minimum, and components are nontrivial
    assert(got.nonEmpty && got.exists { case (id, keep) => id != keep })
  }

  test("dhash: invariant under uniform brightness shift, sensitive to content") {
    val (w, h, ch) = (30, 20, 1)
    val px = testImage(w, h, ch).map(v => 20 + v % 200) // headroom for +20 shift
    val base = MultimodalOps.dhash(graft.media.Png.Image(w, h, ch, px))
    val brighter = MultimodalOps.dhash(graft.media.Png.Image(w, h, ch, px.map(_ + 20)))
    assert(base == brighter, "uniform brightness shift must not change a dHash")
    // hashes across the synthetic corpus are not degenerate (not all equal)
    val hashes = (0L to 40L)
      .map(id => MultimodalOps.dhash(graft.media.Png.decode(MultimodalOps.syntheticPng(id))))
    assert(hashes.distinct.size > 1, "corpus dHashes must not collapse to one value")
  }
}
