package graft

import graft.ops.TimeSeriesOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Property-based algebraic checks (SURVEY §5.3) against in-memory models.
  * Raw ScalaCheck generators with pinned seeds (scalatestplus bridge isn't in
  * the dependency set) — deterministic, N samples per property. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("intersect/except match the Scala Set model") {
    import spark.implicits._
    val g = Gen.listOfN(40, Gen.chooseNum(0L, 12L))
    for ((xs, ys) <- samples(Gen.zip(g, g), 8)) {
      val a = xs.toDF("k")
      val b = ys.toDF("k")
      val inter = a.intersect(b).collect().map(_.getLong(0)).toSet
      val exc = a.except(b).collect().map(_.getLong(0)).toSet
      assert(inter == (xs.toSet & ys.toSet))
      assert(exc == (xs.toSet -- ys.toSet))
    }
  }

  test("window top-k matches the sort-and-take model") {
    import spark.implicits._
    val g = Gen.listOfN(60, Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0, 1000)))
    for (rows <- samples(g, 8)) {
      val withId = rows.zipWithIndex.map { case ((grp, v), i) => (grp, v, i.toLong) }
      val df = withId.toDF("g", "v", "id")
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
      val got = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
        .select("g", "v", "id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val want = withId.groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._2, r._3)).take(3)
      }.toSet
      assert(got == want)
    }
  }

  test("counter delta sums back to the final counter value (no resets)") {
    import spark.implicits._
    val g = Gen.listOfN(30, Gen.chooseNum(1, 500))
    for (increments <- samples(g, 8) if increments.nonEmpty) {
      var acc = 0.0
      val rows = increments.zipWithIndex.map { case (inc, i) =>
        acc += inc
        (1L, new Timestamp(1704067200000L + i * 1800L * 1000L), acc) // every 30min
      }
      val out = TimeSeriesOps.counterDelta(rows.toDF("user_id", "ts", "counter"))
      val total = out.agg(sum(col("energy"))).collect()(0).getDouble(0)
      assert(math.abs(total - acc) < 1e-6)
    }
  }

  test("streaming ingestion is arrival-order independent under a generous watermark") {
    // the reference's reality: gateway batches arrive late and out of order;
    // with a watermark wider than the disorder, the drained windowed counts
    // must equal the batch aggregation for EVERY arrival permutation
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = (0 until 60).map { i =>
      (i.toLong, new Timestamp(1704067200000L + (i * 97 % 60) * 60000L)) // minutes 0..59, scrambled
    }
    val batchExpected = events.toDF("event_id", "ts")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("cnt"))
      .orderBy("ws").collect().map(_.toString).toSeq
    for (seed <- Seq(1, 2, 3)) {
      val perm = new scala.util.Random(seed).shuffle(events)
      val input = MemoryStream[(Long, Timestamp)]
      val qn = s"perm_${seed}_${System.nanoTime()}"
      val q = input.toDF().toDF("event_id", "ts")
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("ws"), col("cnt"))
        .writeStream.format("memory").queryName(qn).outputMode("update").start()
      try {
        perm.grouped(20).foreach { b => input.addData(b); q.processAllAvailable() }
        val got = spark.table(qn).groupBy("ws").agg(max("cnt").as("cnt"))
          .orderBy("ws").collect().map(_.toString).toSeq
        assert(got == batchExpected, s"permutation seed=$seed diverged from batch")
      } finally {
        q.stop()
        spark.catalog.dropTempView(qn)
      }
    }
  }

  test("blockedAllPairs emits the exact unordered pair space (model check)") {
    import spark.implicits._
    // The block-matrix shard has two subtle edges: same-block pairs must
    // dedup by id order, cross-block pairs must appear exactly once with
    // normalized (least, greatest) ids. Check against the combinations
    // model for sizes below/at/above the block count (B = 16), with both
    // contiguous and strided (block-skewed) id sets.
    val cases = Seq(
      (0 until 1).map(_.toLong),
      (0 until 2).map(_.toLong),
      (0 until 5).map(_.toLong),
      (0 until 17).map(_.toLong),
      (0 until 33).map(_.toLong),
      (0 until 20).map(i => i.toLong * 16 + 3), // every id in the SAME block
      (0 until 24).map(i => i.toLong * 3 + 1))
    for (ids <- cases) {
      val dir = java.nio.file.Files.createTempDirectory("pairs_prop")
      try {
        ids.map(i => (i, Array.tabulate(4)(j => (i * 4 + j).toFloat / 100f)))
          .toDF("vec_id", "embedding")
          .write.mode("overwrite").parquet(dir.resolve("embeddings.parquet").toString)
        val got = graft.ops.LlmOps.blockedAllPairs(spark, dir.toString)
          .select("vec_id_a", "vec_id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val expected = ids.combinations(2).map(p => (p.min, p.max)).toSet
        assert(got.length == got.toSet.size, s"duplicate pairs at n=${ids.size}")
        assert(got.forall { case (a, b) => a < b }, "pair ids must be normalized")
        assert(got.toSet == expected,
          s"pair space mismatch at n=${ids.size}: got ${got.length}, expected ${expected.size}")
      } finally graft.ops.Housekeeping.deleteRecursively(dir)
    }
  }

  test("embed_quantize_int8 stays in int8 range and inverts within 1/scale") {
    val out = graft.ops.PipelineOps.embedQuantizeInt8.fn(spark, TestSpark.sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val scale = r.getDouble(1)
      val qs = r.getString(2).split('|').map(_.toInt)
      assert(qs.forall(q => q >= -127 && q <= 127),
        s"quantized value out of int8 range for vec ${r.getLong(0)}")
      assert(scale >= 0.0)
    }
  }

  test("png codec round-trips arbitrary images (dims × channels × filters × pixels)") {
    val gImg = for {
      w <- Gen.chooseNum(1, 24)
      h <- Gen.chooseNum(1, 24)
      ch <- Gen.oneOf(1, 3, 4)
      px <- Gen.listOfN(w * h * ch, Gen.chooseNum(0, 255))
      fSeed <- Gen.chooseNum(0, 4)
    } yield (w, h, ch, px.toArray, fSeed)
    for ((w, h, ch, px, fSeed) <- samples(gImg, 25)) {
      val bytes = graft.media.Png.encode(w, h, ch, px, y => (y + fSeed) % 5)
      val img = graft.media.Png.decode(bytes)
      assert((img.width, img.height, img.channels) == ((w, h, ch)))
      assert(img.samples.sameElements(px), s"w=$w h=$h ch=$ch fSeed=$fSeed")
    }
  }

  test("wav codec round-trips arbitrary PCM16 clips") {
    val gClip = for {
      frames <- Gen.chooseNum(1, 500)
      ch <- Gen.oneOf(1, 2)
      rate <- Gen.oneOf(8000, 16000, 44100)
      s <- Gen.listOfN(frames * ch, Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt))
    } yield (rate, ch, s.toArray)
    for ((rate, ch, s) <- samples(gClip, 25)) {
      val a = graft.media.Wav.decode(graft.media.Wav.encode(rate, ch, s))
      assert((a.sampleRate, a.channels) == ((rate, ch)))
      assert(a.samples.sameElements(s))
    }
  }

  test("exact dedup is idempotent") {
    import spark.implicits._
    for (texts <- samples(Gen.listOfN(30, Gen.oneOf("a b c", "d e f", "g h i", "j k l")), 5)
         if texts.nonEmpty) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = docs.groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("keep_id"))
      val kept = docs.join(once, docs("doc_id") === once("keep_id")).select("doc_id", "text")
      val twice = kept.groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("keep_id"))
      assert(twice.count() == once.count())
    }
  }

  test("pii scrub is idempotent: a scrubbed text contains nothing left to scrub") {
    import graft.ops.TextOps
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "report", "at", "noon", "server")
    val email = Gen.oneOf("a.b+c@ex.com", "root@sub.host.io", "x_1@d-e.org")
    val ip = Gen.oneOf("10.0.0.1", "192.168.255.3", "172.16.4.200")
    val token = Gen.frequency(6 -> word, 2 -> email, 2 -> ip)
    val g = Gen.listOfN(12, token).map(_.mkString(" "))
    for (texts <- samples(Gen.listOfN(10, g), 5)) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val scrubbedText = regexp_replace(
        regexp_replace(col("text"), TextOps.EmailRe, "<EMAIL>"), TextOps.Ipv4Re, "<IP>")
      val rows = docs.select(col("doc_id"), scrubbedText.as("s1"),
          regexp_replace(regexp_replace(scrubbedText, TextOps.EmailRe, "<EMAIL>"),
            TextOps.Ipv4Re, "<IP>").as("s2"),
          regexp_count(scrubbedText, lit(TextOps.EmailRe)).as("ne"),
          regexp_count(scrubbedText, lit(TextOps.Ipv4Re)).as("ni"))
        .collect()
      rows.foreach { r =>
        assert(r.getString(1) == r.getString(2), s"second scrub changed doc ${r.getLong(0)}")
        assert(r.getInt(3) == 0 && r.getInt(4) == 0,
          s"scrubbed text still matches a PII pattern: ${r.getString(1)}")
      }
    }
  }

  test("linear interpolation is exact at observation instants") {
    import spark.implicits._
    // per-user observations at exact hour marks, random 1-4 h apart: every
    // grid point that coincides with an observation (except the last, which
    // has no forward neighbor) must reproduce the observed value exactly —
    // the bracket degenerates to Δ = 0
    val obsGen = Gen.listOfN(6, Gen.zip(Gen.chooseNum(1, 4), Gen.chooseNum(0, 9999)))
    for ((obs, sample) <- samples(obsGen, 6).zipWithIndex) {
      val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
      var h = 0
      val rows = obs.zipWithIndex.map { case ((gap, cents), i) =>
        h += gap
        (7L, new Timestamp(base + h.toLong * 3600 * 1000), cents / 100.0, i.toLong)
      }
      val e = rows.toDF("user_id", "ts", "value", "event_id")
      val got = TimeSeriesOps.interpolateLinear(e).collect()
        .map(r => r.getTimestamp(1).getTime -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
      rows.init.foreach { case (_, ts, v, _) =>
        assert(got(ts.getTime).contains(v),
          s"sample $sample: grid at observation $ts should be exactly $v, got ${got(ts.getTime)}")
      }
      // and the trailing observation's grid point stays null (no forward neighbor)
      assert(got(rows.last._2.getTime).isEmpty)
    }
  }

  test("incremental minhash equals the delta-corpus slice of the full near-dup join") {
    import graft.ops.LlmOps
    import spark.implicits._
    val vocab = (0 until 2000).map(i => "w" + i)
    def doc(seed: Int): Array[String] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(40)(vocab(rnd.nextInt(vocab.length)))
    }
    for (sample <- 0 until 3) {
      val corpusRows = (0 until 60).map(i => (i.toLong, doc(9000 + 100 * sample + i).mkString(" ")))
      // delta: 6 one-word edits of corpus docs + 2 fresh docs
      val deltaRows = (0 until 6).map { i =>
        val edited = doc(9000 + 100 * sample + i).clone()
        edited(20) = if (edited(20) == "w5") "w6" else "w5"
        (1000000L + i, edited.mkString(" "))
      } ++ Seq((1000006L, doc(77000 + sample).mkString(" ")),
        (1000007L, doc(78000 + sample).mkString(" ")))
      val corpus = corpusRows.toDF("doc_id", "text")
      val delta = deltaRows.toDF("doc_id", "text")
      val inc = LlmOps.incrementalNearDupPairs(delta, corpus).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      graft.ops.Housekeeping.releaseAll()
      // the full self-join over the union, sliced to (delta, corpus) pairs;
      // nearDupPairs orients doc_a < doc_b, so corpus ids come first
      val full = LlmOps.nearDupPairs(corpus.unionAll(delta)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .filter { case (a, b, _) => (a < 1000000L) != (b < 1000000L) }
        .map { case (a, b, j) => if (a >= 1000000L) (a, b, j) else (b, a, j) }.toSet
      graft.ops.Housekeeping.releaseAll()
      assert(inc == full, s"sample $sample: incremental=$inc full-slice=$full")
    }
  }

  test("ngram LM conditional probabilities are a valid sub-distribution per head") {
    import spark.implicits._
    val rows = graft.ops.TextOps.textNgramLm.fn(spark, TestSpark.sf0001)
      .as[(String, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w1, w2, n, p) =>
      assert(n >= 3, s"support floor violated at ($w1,$w2)")
      assert(p >= 0 && p <= 1000000L, s"p_cond_ppm out of range at ($w1,$w2): $p")
    }
    // emitted (count >= 3) probabilities can never exceed the full mass
    rows.groupBy(_._1).foreach { case (w1, bs) =>
      assert(bs.map(_._4).sum <= 1000000L, s"head '$w1' exceeds unit mass")
    }
  }

  test("first-touch and last-touch agree exactly when one view is in both windows") {
    import spark.implicits._
    val first = graft.ops.JoinOps.joinFirstTouch.fn(spark, TestSpark.sf0001)
      .as[(Long, Long, java.sql.Timestamp, Option[java.sql.Timestamp], Option[Long])]
      .collect().map(r => r._1 -> r._5).toMap
    val last = graft.ops.JoinOps.joinAsofTolerance.fn(spark, TestSpark.sf0001)
      .as[(Long, Long, java.sql.Timestamp, Option[java.sql.Timestamp], Option[Long])]
      .collect().map(r => r._1 -> r._5).toMap
    assert(first.keySet == last.keySet, "both attribute the same purchase set")
    // the 1h window is a subset of the 7d window: a last-touch match implies
    // a first-touch match (never the reverse)
    val lastOnly = last.filter { case (p, v) => v.nonEmpty && first(p).isEmpty }
    assert(lastOnly.isEmpty, s"purchases with last-touch but no first-touch: $lastOnly")
    // and when the 7d window holds exactly one view, the two picks coincide
    val both = first.keys.filter(p => first(p).nonEmpty && last(p).nonEmpty)
    assert(both.nonEmpty)
  }

  test("BFS levels are locally consistent: every level-k node has a level-(k-1) in-neighbor") {
    import spark.implicits._
    val levels = graft.ops.GraphOps.graphBfsLevels.fn(spark, TestSpark.sf0001)
      .as[(Long, Int)].collect().toMap
    assert(levels.nonEmpty && levels.values.exists(_ > 0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    val inEdges = graft.tables.Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_partkey").as("src"),
        org.apache.spark.sql.functions.lead(col("l_partkey"), 1).over(w).as("dst"))
      .where(col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct().as[(Long, Long)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    levels.foreach { case (node, lvl) =>
      if (lvl > 0) {
        val preds = inEdges.getOrElse(node, Array.empty[Long])
        assert(preds.exists(p => levels.get(p).contains(lvl - 1)),
          s"node $node at level $lvl has no level-${lvl - 1} in-neighbor")
      } else assert(node % 97 == 0, s"level-0 node $node is not a seed")
    }
  }
}
