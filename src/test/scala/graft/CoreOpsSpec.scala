package graft

import graft.ops._
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Unit specs for the oracle:no operators (SURVEY §5.2) + fixture-level
  * checks of reference-specific semantics. */
class CoreOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ts_interpolate_linear: hand-computed brackets, outage gap stays null") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def t(str: String) = java.sql.Timestamp.valueOf(str)
    // one user, three observations: a 2.5 h bracket (interpolable), then a
    // 9.5 h outage (> 6 h bracket → null), and a trailing observation whose
    // grid point has no forward neighbor (→ null)
    val e = Seq(
      (1L, t("2024-01-01 10:00:00"), 10.0, 1L),
      (1L, t("2024-01-01 12:30:00"), 20.0, 2L),
      (1L, t("2024-01-01 22:00:00"), 5.0, 3L)
    ).toDF("user_id", "ts", "value", "event_id")
    val rows = TimeSeriesOps.interpolateLinear(e)
      .collect().map(r => (r.getTimestamp(1).toString, Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(rows.length == 13) // hourly grid 10:00..22:00
    val byG = rows.toMap
    // inside the 10:00→12:30 bracket: value = 10 + 10·Δ, Δ = elapsed/9000 s
    assert(byG("2024-01-01 10:00:00.0").contains(10.0))
    assert(byG("2024-01-01 11:00:00.0").contains(10.0 + 10.0 * (3600.0 / 9000.0))) // 14.0
    assert(byG("2024-01-01 12:00:00.0").contains(10.0 + 10.0 * (7200.0 / 9000.0))) // 18.0
    // the 12:30→22:00 gap spans > 6 h: every grid point inside it stays null
    for (h <- 13 to 21)
      assert(byG(f"2024-01-01 $h%02d:00:00.0").isEmpty, s"hour $h should be null")
    // trailing grid point: previous observation exists at the instant, no
    // forward neighbor → null (no one-sided extrapolation)
    assert(byG("2024-01-01 22:00:00.0").isEmpty)
  }

  test("csv_log_ingest: golden-file semantics") {
    val rows = SourceSinkOps.csvLogIngest.fn(spark, "").collect()
    // 7 data rows, one exact duplicate dropped
    assert(rows.length == 6)
    // malformed numerics → null (permissive), row retained
    val malformed = rows.filter(r => r.isNullAt(r.fieldIndex("watts")))
    assert(malformed.length == 1)
    assert(malformed.head.isNullAt(malformed.head.fieldIndex("amps")))
    // compact timestamp parsed
    assert(rows.forall(!_.isNullAt(1 - 1 + 2))) // ts col idx 2
    val cons = rows.filter(_.getString(0) == "1a2b3c")
    assert(cons.length == 4)
    // out-of-order timestamp sorted into place per machine
    val ts = cons.map(_.getTimestamp(2).getTime)
    assert(ts.sorted.sameElements(ts))
    // counter reset row present (wh_lifetime drops to 2.5); gauges parse as
    // exact DECIMAL(12,2) internally and leave as DOUBLE (envelope rule:
    // no DecimalType in any output schema — HashEnvelopeSpec)
    val whIdx = rows.head.fieldIndex("wh_lifetime")
    assert(cons.exists(r => !r.isNullAt(whIdx) && r.getDouble(whIdx) == 2.5))
    // both circuit types survive
    assert(rows.map(_.getString(1)).toSet == Set("PWR", "MAINS"))
  }

  test("credit_event_detect: recovers both event kinds; amounts match the source events") {
    val out = TimeSeriesOps.creditEventDetect.fn(spark, TestSpark.sf0001).collect()
    assert(out.nonEmpty)
    val kinds = out.map(_.getString(2)).toSet
    assert(kinds == Set("topup", "consumption"), s"expected both kinds, got $kinds")
    // every detected amount is positive and equals the source event's value
    // (the balance delta IS the event value by construction)
    assert(out.forall(_.getDouble(3) > 0))
    val topupAmounts = out.filter(_.getString(2) == "topup").map(_.getDouble(3)).toSet
    val purchaseValues = Tables.events(spark, TestSpark.sf0001)
      .where(col("event_type") === "purchase").select("value")
      .collect().map(_.getDouble(0)).toSet
    assert(topupAmounts.subsetOf(purchaseValues))
  }

  test("agg_approx_hll: within 5% of exact per event_type") {
    val approx = AggOps.aggApproxHll.fn(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, TestSpark.sf0001)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx=$a exact=$e")
    }
  }

  test("sink_partitioned_parquet: day-partition layout and counts") {
    import java.nio.file.{Files, Paths}
    val out = Files.createTempDirectory("sink_spec").toString
    Tables.events(spark, TestSpark.sf0001)
      .withColumn("d", to_date(col("ts")))
      .write.partitionBy("d").mode("overwrite").parquet(out)
    val dirs = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.contains("d=")).sorted
    assert(dirs.nonEmpty && dirs.head.contains("d=2024-01-01"))
    val readBack = spark.read.parquet(out)
    assert(readBack.count() == Tables.events(spark, TestSpark.sf0001).count())
    // partition pruning: a single-day filter reads one partition directory
    val oneDay = readBack.where(col("d") === lit("2024-01-02").cast("date"))
    val expected = Tables.events(spark, TestSpark.sf0001)
      .where(to_date(col("ts")) === lit("2024-01-02").cast("date")).count()
    assert(oneDay.count() == expected)
  }

  test("ts_counter_delta core: reset and gap semantics (FIXTURES.md fixture)") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    // monotone h10, reset inside h11, missing h12, resume h13
    val df = Seq(
      (1L, t("2024-01-01 10:00:00"), 10.0),
      (1L, t("2024-01-01 10:20:00"), 20.0),
      (1L, t("2024-01-01 10:40:00"), 30.0),
      (1L, t("2024-01-01 11:05:00"), 2.0),   // reset: counter dropped
      (1L, t("2024-01-01 11:45:00"), 5.0),
      (1L, t("2024-01-01 13:10:00"), 50.0)   // gap: no h12 bucket
    ).toDF("user_id", "ts", "counter")
    val out = TimeSeriesOps.counterDelta(df).collect()
      .map(r => (r.getTimestamp(1).toString, r.getDouble(2)))
    assert(out.sameElements(Array(
      ("2024-01-01 10:00:00.0", 30.0),  // first bucket counts from zero
      ("2024-01-01 11:00:00.0", 5.0),   // delta 5-30<0 → reset → raw value
      ("2024-01-01 13:00:00.0", 45.0)   // gap bridged: 50-5
    )))
  }

  test("ts_counter_daily_reset core: schedule vs reboot resets, boundary edge") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (1L, t("2024-01-01 22:00:00"), 3.0),
      (1L, t("2024-01-01 23:10:00"), 5.0),   // day 1 ends with register at 5
      // THE distinguishing edge: day-2 hour-0 register (10) EXCEEDS day 1's
      // total, so the cross-day delta is +5 — a lifetime-counter reader
      // (counterDelta) books 5.0; the scheduled-reset semantic must book
      // the full 10.0 counted from midnight.
      (1L, t("2024-01-02 00:30:00"), 10.0),
      (1L, t("2024-01-02 01:15:00"), 2.0),   // reboot mid-day: dropped to 2
      (1L, t("2024-01-02 02:05:00"), 6.0)    // normal in-day delta: 4
    ).toDF("user_id", "ts", "counter")
    val out = TimeSeriesOps.counterDailyReset(df).collect()
      .map(r => (r.getTimestamp(1).toString, r.getDouble(2), r.getString(3)))
    assert(out.sameElements(Array(
      ("2024-01-01 22:00:00.0", 3.0, "first"),
      ("2024-01-01 23:00:00.0", 2.0, "none"),
      ("2024-01-02 00:00:00.0", 10.0, "schedule"), // NOT the +5 delta
      ("2024-01-02 01:00:00.0", 2.0, "reboot"),
      ("2024-01-02 02:00:00.0", 4.0, "none")
    )), out.mkString(", "))
    // and the generic lifetime reader really would book the boundary as +5 —
    // the two register semantics are distinguishable, not redundant
    val generic = TimeSeriesOps.counterDelta(df).collect()
      .map(r => (r.getTimestamp(1).toString, r.getDouble(2)))
    assert(generic.contains(("2024-01-02 00:00:00.0", 5.0)))
  }

  test("session window gap-equality edge (§7.2 rule 8): gap == 30min MERGES, +1µs splits") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    // Verified Spark 4.1.2 behavior: an event exactly gapDuration after the
    // previous one still merges (boundary-inclusive); one microsecond past
    // the gap starts a new session. The oracle's gaps-and-islands CTE must
    // therefore break only on gap > 30min — which it does.
    val df = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L),
      (1L, t("2024-01-01 10:30:00"), 2L),          // == gap → merges
      (2L, t("2024-01-01 10:00:00"), 3L),
      (2L, t("2024-01-01 10:30:00.000001"), 4L)    // gap + 1µs → splits
    ).toDF("user_id", "ts", "event_id")
    val sessions = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("session_window.start").as("st"), col("cnt"))
      .orderBy("user_id", "st").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(sessions.sameElements(Array((1L, 2L), (2L, 1L), (2L, 1L))))
  }

  test("agg_percentile_exact matches a driver-side nearest-rank recompute") {
    val got = graft.ops.AggOps.aggPercentileExact.fn(spark, TestSpark.sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val rows = graft.tables.Tables.events(spark, TestSpark.sf001)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expected = rows.groupBy(_._2).map { case (t, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._1)).map(_._3).toIndexedSeq
      def nr(p: Double) = sorted(math.ceil(p * sorted.length).toInt - 1)
      t -> (nr(0.50), nr(0.95), nr(0.99))
    }
    assert(got == expected)
    // order statistics: p50 <= p95 <= p99 per group
    got.values.foreach { case (a, b, c) => assert(a <= b && b <= c) }
  }

  test("join_first_touch: earliest view in 7 days matches a brute-force recompute") {
    import spark.implicits._
    val events = Tables.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "event_type", "ts")
      .as[(Long, Long, String, Timestamp)].collect()
    val views = events.filter(_._3 == "view")
    val weekUs = 7L * 86400L * 1000000L
    def us(t: Timestamp) = t.getTime * 1000 + t.getNanos / 1000 % 1000
    val expected = events.filter(_._3 == "purchase").map { case (pid, u, _, pts) =>
      val cand = views.filter(v => v._2 == u && us(v._4) < us(pts) && us(v._4) >= us(pts) - weekUs)
      val best = if (cand.isEmpty) None else Some(cand.minBy(v => (us(v._4), v._1)))
      (pid, u, us(pts), best.map(v => us(v._4)), best.map(_._1))
    }.sortBy(_._1).toSeq
    val got = JoinOps.joinFirstTouch.fn(spark, TestSpark.sf0001)
      .as[(Long, Long, Timestamp, Option[Timestamp], Option[Long])].collect()
      .map(r => (r._1, r._2, us(r._3), r._4.map(us), r._5)).toSeq
    assert(got == expected)
    // first-touch differs from last-touch somewhere (multiple views in window)
    val differs = events.filter(_._3 == "purchase").exists { case (_, u, _, pts) =>
      val cand = views.filter(v => v._2 == u && us(v._4) < us(pts) && us(v._4) >= us(pts) - weekUs)
      cand.size > 1
    }
    assert(differs, "fixture degenerate: no purchase has more than one view in its window")
  }

  test("window_streak_longest matches a brute-force islands recompute") {
    import spark.implicits._
    val got = WindowOps.windowStreakLongest.fn(spark, TestSpark.sf0001)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val days = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().as[(Long, java.sql.Date)].collect()
    val expected = days.groupBy(_._1).map { case (u, ds) =>
      val epochs = ds.map(_._2.toLocalDate.toEpochDay).sorted.toSeq
      var longest = 1L; var cur = 1L
      epochs.zip(epochs.drop(1)).foreach { case (a, b) =>
        if (b == a + 1) { cur += 1; longest = math.max(longest, cur) } else cur = 1
      }
      u -> (longest, epochs.length.toLong)
    }
    assert(got == expected)
    // the fixture has real streaks (some user active on consecutive days)
    assert(expected.values.exists(_._1 >= 2))
  }

  test("ts_cusum_drift matches a driver-side recurrence recompute") {
    import spark.implicits._
    val got = TimeSeriesOps.tsCusumDrift.fn(spark, TestSpark.sf0001)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val events = Tables.events(spark, TestSpark.sf0001)
      .select("user_id", "event_id", "ts", "value")
      .as[(Long, Long, Timestamp, Double)].collect()
    val expected = events.groupBy(_._1).map { case (u, es) =>
      val vs = es.sortBy(e => (e._3.getTime * 1000 + e._3.getNanos / 1000 % 1000, e._2))
        .map(e => math.floor(e._4 * 1000000).toLong)
      val n = vs.length.toLong
      val target = vs.sum / n
      var s = 0L; var mx = 0L
      vs.foreach { v => s = math.max(0L, s + v - target); mx = math.max(mx, s) }
      u -> (n, target, mx)
    }
    assert(got == expected)
    // drift statistic is nontrivial somewhere (a flat series would be all zeros)
    assert(expected.values.exists(_._3 > 0))
  }

  test("join_asof_tolerance: bounded lookback matches a brute-force recompute") {
    import spark.implicits._
    val events = Tables.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "event_type", "ts")
      .as[(Long, Long, String, Timestamp)].collect()
    val views = events.filter(_._3 == "view")
    val hourUs = 3600L * 1000000L
    def us(t: Timestamp) = t.getTime * 1000 + t.getNanos / 1000 % 1000
    val expected = events.filter(_._3 == "purchase").map { case (pid, u, _, pts) =>
      val cand = views.filter(v => v._2 == u && us(v._4) < us(pts) && us(v._4) >= us(pts) - hourUs)
      val best = if (cand.isEmpty) None
        else Some(cand.maxBy(v => (us(v._4), v._1)))
      (pid, u, us(pts), best.map(v => us(v._4)), best.map(_._1))
    }.sortBy(_._1).toSeq
    val got = JoinOps.joinAsofTolerance.fn(spark, TestSpark.sf0001)
      .as[(Long, Long, Timestamp, Option[Timestamp], Option[Long])].collect()
      .map(r => (r._1, r._2, us(r._3), r._4.map(us), r._5)).toSeq
    assert(got == expected)
    // the tolerance actually bites: some purchase has a prior view but none within the hour
    assert(expected.exists(_._4.isEmpty), "no purchase without a match — widen the fixture check")
    assert(expected.exists(_._4.nonEmpty), "no purchase with a match")
    val unbounded = events.filter(_._3 == "purchase").exists { case (_, u, _, pts) =>
      val all = views.filter(v => v._2 == u && us(v._4) < us(pts))
      val inTol = all.filter(v => us(v._4) >= us(pts) - hourUs)
      all.nonEmpty && inTol.isEmpty
    }
    assert(unbounded, "tolerance never excluded a stale view — fixture degenerate")
  }

  test("agg_mode_exact: modal event per user matches a brute-force recompute") {
    import spark.implicits._
    val got = AggOps.aggModeExact.fn(spark, TestSpark.sf0001)
      .as[(Long, String, Long)].collect()
    assert(got.map(_._1).distinct.length == got.length, "one mode row per user")
    val events = Tables.events(spark, TestSpark.sf0001)
      .select("user_id", "event_type").as[(Long, String)].collect()
    val expected = events.groupBy(_._1).map { case (u, es) =>
      val counts = es.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      // highest count wins; ties break to the lexicographically smallest type
      val (ev, n) = counts.toSeq.minBy { case (t, c) => (-c, t) }
      (u, ev, n)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == expected)
    // the tie-break is actually exercised somewhere in the fixture
    val tied = events.groupBy(_._1).values.exists { es =>
      val cs = es.groupBy(_._2).values.map(_.length).toSeq
      cs.count(_ == cs.max) > 1
    }
    assert(tied, "fixture degenerate: no user has a tied modal count")
  }
}
