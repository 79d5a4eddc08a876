package graft

import graft.ops.{DqOps, PipelineOps, SqlSurfaceOps, StatsOps, TimeSeriesOps, WindowOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-10 monitoring/statistics batch: KS drift, Welch t, lag-k
  * autocorrelation, rolling median, calendar spine, ratio-to-report,
  * GROUP BY ALL, and centroid outliers. The oracle hash-compare proves
  * cross-engine equality; these tests prove the SEMANTIC claims the ops'
  * scaladoc makes (exact-rational KS, order-statistic median, moment
  * identities, conservation laws) that a value-equal hash can't
  * distinguish from coincidence. */
class MonitorOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ------------------------------------------------------------ dq_drift_ks

  test("KS drift: d_num/d_den is the exact two-sample KS statistic of the " +
    "epoch-midpoint split, recomputed independently") {
    val row = DqOps.dqDriftKs.fn(spark, TestSpark.sf001).collect()(0)
    val (n1, n2, dNum, dDen) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(dDen == n1 * n2)

    val orders = spark.read.parquet(s"${TestSpark.sf001}/orders.parquet")
      .select(col("o_totalprice"),
        unix_micros(graft.tables.Tables.ntzColToTimestamp("o_orderdate")).as("us"))
      .collect().map(r => (BigDecimal(r.getDouble(0)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact, r.getLong(1)))
    val mn = orders.map(_._2).min
    val mx = orders.map(_._2).max
    val pivot = mn + (mx - mn) / 2
    val s1 = orders.filter(_._2 < pivot).map(_._1).sorted
    val s2 = orders.filter(_._2 >= pivot).map(_._1).sorted
    assert(s1.length == n1 && s2.length == n2)
    val domain = (s1 ++ s2).distinct.sorted
    val expected = domain.map { v =>
      val c1 = s1.count(_ <= v).toLong
      val c2 = s2.count(_ <= v).toLong
      math.abs(c1 * n2 - c2 * n1)
    }.max
    assert(dNum == expected, s"op d_num=$dNum, independent recompute=$expected")
  }

  // ------------------------------------------------------ stats_ttest_welch

  test("Welch t: the emitted t_stat is exactly the pinned IEEE spelling over " +
    "the emitted exact moments") {
    val row = StatsOps.statsTtestWelch.fn(spark, TestSpark.sf001).collect()(0)
    val (na, nb) = (row.getLong(2), row.getLong(3))
    val sa = BigInt(row.getString(4)); val sb = BigInt(row.getString(5))
    val ssa = BigInt(row.getString(6)); val ssb = BigInt(row.getString(7))
    val t = row.getDouble(8)
    def mean(s: BigInt, n: Long) = s.toDouble / n
    // same association order as the op: ((sxx - sx*sx/n) / (n-1)) / n
    def varOverN(s: BigInt, ss: BigInt, n: Long) =
      (ss.toDouble - s.toDouble * s.toDouble / n) / (n - 1) / n
    val expected = (mean(sa, na) - mean(sb, nb)) /
      math.sqrt(varOverN(sa, ssa, na) + varOverN(sb, ssb, nb))
    assert(t == expected ||
      math.abs(t - expected) <= 1e-12 * math.abs(expected),
      s"t_stat $t != recomputed $expected")
    assert(na > 1 && nb > 1)
  }

  // -------------------------------------------------------- ts_autocorr_lag

  test("autocorrelation: lag-1 moment numerators match an exact BigInt " +
    "recompute over the hourly series") {
    val out = TimeSeriesOps.tsAutocorrLag.fn(spark, TestSpark.sf001)
      .where(col("lag") === 1).collect()
      .map(r => r.getString(0) -> (r.getLong(2), BigInt(r.getString(3)))).toMap

    val hourly = graft.tables.Tables.events(spark, TestSpark.sf001)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg((sum(col("value").cast(graft.ops.Dets.D12_2)) * 100).cast("long").as("y"))
      .orderBy("event_type", "h")
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }

    for ((et, ys) <- hourly) {
      val pairs = ys.zip(ys.drop(1)).map { case (x, y) => (BigInt(x), BigInt(y)) }
      val n = BigInt(pairs.length)
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val (gotN, gotCov) = out(et)
      assert(gotN == pairs.length, s"$et pair count")
      assert(gotCov == n * sxy - sx * sy, s"$et cov_num")
    }
  }

  // ------------------------------------------------------- ts_rolling_median

  test("rolling median: med_e2 is the 4th order statistic of each complete " +
    "trailing 7-hour window, and an injected outlier cannot move it past " +
    "a real neighbour") {
    val hourly = graft.tables.Tables.events(spark, TestSpark.sf001)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg((sum(col("value").cast(graft.ops.Dets.D12_2)) * 100).cast("long").as("y"))
      .orderBy("event_type", "h")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
    val got = TimeSeriesOps.tsRollingMedian.fn(spark, TestSpark.sf001).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getLong(3)).toMap

    var checked = 0
    for ((et, rows) <- hourly) {
      val ys = rows.sortBy(_._2.getTime)
      for (i <- 6 until ys.length) {
        val win = (i - 6 to i).map(j => ys(j)._3).sorted
        assert(got((et, ys(i)._2)) == win(3),
          s"$et @ ${ys(i)._2}: median != 4th order stat")
        checked += 1
      }
      // robustness: max of any 7-window never equals its median unless the
      // window is constant — the outlier cannot BE the median
      assert((6 until ys.length).forall { i =>
        val win = (i - 6 to i).map(j => ys(j)._3).sorted
        win(3) != win.last || win.head == win.last
      })
    }
    assert(checked > 0 && checked == got.size)
  }

  // ------------------------------------------------------ ts_calendar_spine

  test("calendar spine: gapless daily coverage of the order span, order " +
    "counts conserved, zero-activity days explicit") {
    val rows = TimeSeriesOps.tsCalendarSpine.fn(spark, TestSpark.sf001).collect()
    val days = rows.map(_.getDate(0).toLocalDate)
    assert(days.zip(days.drop(1)).forall { case (a, b) => b == a.plusDays(1) },
      "spine has a gap or duplicate")
    val totalOrders = spark.read.parquet(s"${TestSpark.sf001}/orders.parquet").count()
    assert(rows.map(_.getLong(5)).sum == totalOrders, "n_orders not conserved")
    rows.foreach { r =>
      val day = r.getDate(0).toLocalDate
      assert(r.getInt(1) == day.getDayOfWeek.getValue % 7, s"dow wrong at $day")
      assert(r.getBoolean(4) == (day == day.withDayOfMonth(day.lengthOfMonth())),
        s"is_month_end wrong at $day")
    }
  }

  // -------------------------------------------------- window_ratio_to_report

  test("ratio-to-report: shares sum to 1 within each segment and globally") {
    val rows = WindowOps.windowRatioToReport.fn(spark, TestSpark.sf001).collect()
    val bySeg = rows.groupBy(_.getString(0))
    for ((seg, rs) <- bySeg) {
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-9, s"segment $seg shares sum to $s")
    }
    val g = rows.map(_.getDouble(4)).sum
    assert(math.abs(g - 1.0) < 1e-9, s"global shares sum to $g")
  }

  // --------------------------------------------------------- sql_group_by_all

  test("GROUP BY ALL expands to exactly the non-aggregate select items") {
    val viaAll = SqlSurfaceOps.sqlGroupByAll.fn(spark, TestSpark.sf001).collect()
    graft.ops.GraftCatalog.registerAll(spark, TestSpark.sf001)
    val explicit = spark.sql(
      "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus").collect()
    assert(viaAll.toSeq == explicit.toSeq)
  }

  // ------------------------------------------------- analytics_market_basket

  test("market basket: pairs are canonical (b1 < b2), support is coherent " +
    "(n_pair <= min(n1, n2)), and lift is the exact emitted rational") {
    val rows = graft.ops.AnalyticsOps.analyticsMarketBasket.fn(spark, TestSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b1, b2) = (r.getString(0), r.getString(1))
      val (nPair, n1, n2) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(b1 < b2, s"non-canonical pair ($b1, $b2)")
      assert(nPair <= math.min(n1, n2), s"support incoherent for ($b1, $b2)")
      assert(r.getLong(5) % nPair == 0, "lift_num not a multiple of n_pair")
      assert(r.getLong(6) == n1 * n2)
      assert(r.getDouble(7) == r.getLong(5).toDouble / r.getLong(6))
    }
    // no duplicate pairs
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == rows.length)
  }

  // -------------------------------------------------- feature_hash_vectorize

  test("hashing trick: buckets are in [0, 64), counts conserve the sampled " +
    "docs' token totals, and the assignment is content-addressed (same " +
    "token, same bucket across docs)") {
    val rows = graft.ops.PipelineOps.featureHashVectorize.fn(spark, TestSpark.sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64))
    val emitted = rows.map(_.getLong(2)).sum
    val expected = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet")
      .where(col("doc_id") % 20 === 0)
      .select(explode(split(col("text"), " ")).as("t"))
      .where(length(col("t")) > 0).count()
    assert(emitted == expected, s"token counts not conserved: $emitted != $expected")
    // content-addressing: recompute one doc's buckets independently
    val doc = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet")
      .where(col("doc_id") % 20 === 0).orderBy("doc_id").limit(1).collect()(0)
    val docId = doc.getLong(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = doc.getString(1).split(" ").filter(_.nonEmpty)
      .map { t =>
        val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
        java.lang.Long.parseLong(hex, 16) % 64
      }
      .groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val got = rows.filter(_.getLong(0) == docId)
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == want, s"doc $docId bucket counts mismatch")
  }

  // ----------------------------------------------------------- ts_anomaly_stl

  test("STL anomalies: every flagged hour satisfies the integer 3-MAD gate, " +
    "dev2 is consistent with the emitted doubled median, and med2/mad4 are " +
    "genuine doubled medians (odd/even both exercised by construction)") {
    val rows = graft.ops.TimeSeriesOps.tsAnomalyStl.fn(spark, TestSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (res, dev2, med2, mad4) = (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(dev2 == math.abs(2 * res - med2), "dev2 inconsistent")
      assert(2 * dev2 > 3 * mad4, "flagged row fails the 3-MAD gate")
    }
    // per event_type the same (med2, mad4) pair everywhere
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(r => (r.getLong(5), r.getLong(6))).distinct.length == 1)
    }
  }

  // --------------------------------------------------------- billing family

  test("time-of-use billing: band charges partition the total exactly, and " +
    "the grand total equals an independent rate-dim-join recompute") {
    val rows = graft.ops.BillingOps.billingTimeOfUse.fn(spark, TestSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == r.getLong(5),
        s"bands don't partition total for user ${r.getLong(0)}")
      assert(r.getDouble(6) == r.getLong(5).toDouble / 10000.0)
    }
    // independent spelling: hour -> rate as a joined dim instead of a CASE
    import spark.implicits._
    val rateDim = (0 until 24).map { h =>
      val rate = if (h >= 17 && h < 21) 18L
      else if ((h >= 7 && h < 17) || (h >= 21 && h < 23)) 12L else 7L
      (h, rate)
    }.toDF("hr", "rate")
    val expected = graft.tables.Tables.events(spark, TestSpark.sf001)
      .where(col("event_type") =!= "purchase")
      .withColumn("hr", hour(col("ts")))
      .join(rateDim, "hr")
      .agg(sum((col("value").cast(graft.ops.Dets.D12_2) * 100).cast("long") * col("rate")))
      .collect()(0).getLong(0)
    assert(rows.map(_.getLong(5)).sum == expected, "grand total not conserved")
  }

  test("prepaid balance: one user's cutoff count, below-zero time, and " +
    "min/final balance match a sequential Scala replay of their ledger") {
    val out = graft.ops.BillingOps.billingPrepaidBalance.fn(spark, TestSpark.sf001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val uid = out.keys.min
    val ledger = graft.tables.Tables.events(spark, TestSpark.sf001)
      .where(col("user_id") === uid)
      .select(col("ts"), col("event_id"), col("event_type"),
        (col("value").cast(graft.ops.Dets.D12_2) * 100).cast("long").as("cents"),
        unix_micros(col("ts")).as("us"))
      .orderBy("ts", "event_id").collect()
    var bal = 0L; var prev = Option.empty[Long]
    var cutoffs = 0L; var belowUs = 0L; var minBal = Long.MaxValue
    for (i <- ledger.indices) {
      val r = ledger(i)
      bal += (if (r.getString(2) == "purchase") 5 * r.getLong(3) else -r.getLong(3))
      if (bal < 0 && prev.forall(_ >= 0)) cutoffs += 1
      if (bal < 0 && i + 1 < ledger.length)
        belowUs += ledger(i + 1).getLong(4) - r.getLong(4)
      minBal = math.min(minBal, bal)
      prev = Some(bal)
    }
    assert(out(uid) == ((cutoffs, belowUs, minBal, bal)),
      s"user $uid: ${out(uid)} != ${(cutoffs, belowUs, minBal, bal)}")
  }

  test("load-duration curve: per series it is non-increasing, ranks are " +
    "dense 1..n, and the last exceedance fraction is exactly 1") {
    val rows = graft.ops.TimeSeriesOps.tsLoadDurationCurve.fn(spark, TestSpark.sf001).collect()
    rows.groupBy(_.getString(0)).foreach { case (et, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rs.length),
        s"$et ranks not dense")
      val ys = sorted.map(_.getLong(3))
      assert(ys.zip(ys.drop(1)).forall { case (a, b) => a >= b }, s"$et not non-increasing")
      assert(sorted.forall(_.getLong(4) == rs.length))
      assert(sorted.last.getDouble(5) == 1.0)
    }
  }

  // --------------------------------------------------------- dedup_edit_prefix

  test("edit-distance dedup: the emitted pair set IS exactly the blocked " +
    "pairs within 8 edits, verified by an independent Levenshtein DP") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val t = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(b.length)
    }
    val docs = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet")
      .select(col("doc_id"), substring(col("text"), 1, 64).as("p64"),
        substring(col("text"), 1, 16).as("blk"), expr("n_chars div 256").as("lb"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val expected = (for {
      a <- docs; b <- docs
      if a._1 < b._1 && a._3 == b._3 && a._4 == b._4
      d = lev(a._2, b._2) if d <= 8
    } yield (a._1, b._1, d)).toSet
    val got = graft.ops.LlmOps.dedupEditPrefix.fn(spark, TestSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected, s"pair sets differ: got ${got.size}, expected ${expected.size}")
    assert(got.nonEmpty)
  }

  // ------------------------------------------------ ts_forecast_snaive_backtest

  test("seasonal-naive backtest: n and the absolute-error sum match a " +
    "calendar-join replay (gap hours score nothing, unlike a row lag)") {
    val hourly = graft.tables.Tables.events(spark, TestSpark.sf001)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg((sum(col("value").cast(graft.ops.Dets.D12_2)) * 100).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val byKey = hourly.map(t => (t._1, t._2) -> t._3).toMap
    val dayMs = 24L * 3600 * 1000
    for ((days, label) <- Seq(1 -> "snaive_1d", 7 -> "snaive_7d")) {
      val exp = hourly.flatMap { case (et, ms, y) =>
        byKey.get((et, ms - days * dayMs)).map(yhat => et -> math.abs(y - yhat))
      }.groupBy(_._1).map { case (et, xs) => et -> (xs.length.toLong, xs.map(_._2).sum) }
      val got = graft.ops.TimeSeriesOps.tsForecastSnaiveBacktest.fn(spark, TestSpark.sf001)
        .where(col("horizon") === label).collect()
        .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
      assert(got == exp, s"$label backtest mismatch")
    }
  }

  // -------------------------------------------------------- agg_weighted_median

  test("weighted median: matches a sequential cumulative-weight replay, and " +
    "differs from the unweighted median somewhere (the weights matter)") {
    val base = spark.read.parquet(s"${TestSpark.sf001}/lineitem.parquet")
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast(graft.ops.Dets.D12_2) * 100).cast("long").as("p"),
        (col("l_quantity").cast(graft.ops.Dets.D12_2) * 100).cast("long").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = base.groupBy(_._1).map { case (g, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val tot = sorted.map(_._3).sum
      var cum = 0L
      g -> sorted.find { r => cum += r._3; 2 * cum >= tot }.get._2
    }
    val got = graft.ops.AggOps.aggWeightedMedian.fn(spark, TestSpark.sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  // --------------------------------------------------------- dq_duplicate_events

  test("duplicate events: every flagged row repeats its user's exact amount " +
    "within 7 days, and prev_id is the immediate same-amount predecessor") {
    val rows = graft.ops.DqOps.dqDuplicateEvents.fn(spark, TestSpark.sf001).collect()
    assert(rows.nonEmpty)
    val events = graft.tables.Tables.events(spark, TestSpark.sf001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        (col("value").cast(graft.ops.Dets.D12_2) * 100).cast("long").as("cents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.foreach { r =>
      val (id, prevId, uid, cents, gap) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))
      val (pu, pus, pc) = events(prevId)
      val (_, us, c) = events(id)
      assert(pu == uid && pc == cents && c == cents, "pair mismatch")
      assert(gap == us - pus && gap >= 0 && gap <= 604800000000L)
    }
  }

  // ------------------------------------------------ analytics_gini_concentration

  test("Gini concentration: the emitted rational equals an exact BigInt " +
    "recompute and lies in [0, 1)") {
    val r = graft.ops.AnalyticsOps.analyticsGiniConcentration.fn(spark, TestSpark.sf001)
      .collect()(0)
    val xs = graft.tables.Tables.events(spark, TestSpark.sf001)
      .where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum((col("value").cast(graft.ops.Dets.D12_2) * 100).cast("long")).as("x"))
      .collect().map(_.getLong(1)).sorted
    val n = BigInt(xs.length)
    val tot = xs.map(BigInt(_)).sum
    val six = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val num = 2 * six - (n + 1) * tot
    val den = n * tot
    assert(r.getLong(0) == xs.length && r.getLong(1) == tot.toLong)
    assert(BigInt(r.getString(2)) == num && BigInt(r.getString(3)) == den)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0)
  }

  // ----------------------------------------------------- geo_bbox_contains_join

  test("bbox containment: cell-decomposed counts equal the naive " +
    "all-pairs containment for every district, including empty ones") {
    val custs = spark.read.parquet(s"${TestSpark.sf001}/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0))
      .map(k => (k, (k * 48271 + 11) % 1000003 % 4096, (k * 69621 + 7) % 1000003 % 4096))
    val got = graft.ops.GeoOps.geoBboxContainsJoin.fn(spark, TestSpark.sf001).collect()
    assert(got.length == 25)
    got.foreach { r =>
      val x0 = r.getAs[Number](2).longValue; val y0 = r.getAs[Number](3).longValue
      val in = custs.filter(c => c._2 >= x0 && c._2 <= x0 + 511 && c._3 >= y0 && c._3 <= y0 + 511)
      assert(r.getLong(4) == in.length, s"district ${r.getAs[Number](0)} count")
      if (in.nonEmpty) assert(r.getLong(5) == in.map(_._1).min)
      else assert(r.isNullAt(5))
    }
  }

  // ------------------------------------------------------ pipeline_dataset_card

  test("dataset card: the TOTAL row sums the additive columns and bounds " +
    "the distinct ones") {
    val rows = graft.ops.PipelineOps.pipelineDatasetCard.fn(spark, TestSpark.sf001).collect()
    val (tot, per) = rows.partition(_.getString(0) == "TOTAL")
    assert(tot.length == 1 && per.nonEmpty)
    val t = tot(0)
    assert(t.getLong(1) == per.map(_.getLong(1)).sum, "n_docs not additive")
    assert(t.getLong(4) == per.map(_.getLong(4)).sum, "total_chars not additive")
    assert(t.getLong(5) == per.map(_.getLong(5)).sum, "total_tokens not additive")
    assert(t.getLong(2) <= per.map(_.getLong(2)).sum, "global uniques exceed per-source sum")
    assert(t.getLong(3) <= per.map(_.getLong(3)).sum && t.getLong(3) >= per.map(_.getLong(3)).max)
  }

  // ------------------------------------------------------ pipeline_pit_features

  test("PIT features: a sequential per-user replay reproduces both features " +
    "— no future event ever leaks into a label row") {
    val out = graft.ops.PipelineOps.pipelinePitFeatures.fn(spark, TestSpark.sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toMap
    assert(out.nonEmpty)
    val timeline = graft.tables.Tables.events(spark, TestSpark.sf001)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        (col("value").cast(graft.ops.Dets.D12_2) * 100).cast("long").as("cents"))
      .orderBy("user_id", "ts", "event_id").collect()
    var checked = 0
    timeline.groupBy(_.getLong(1)).foreach { case (_, evs) =>
      var nPrior = 0L; var lastClick = Option.empty[Long]
      evs.foreach { e =>
        if (e.getString(3) == "purchase") {
          assert(out(e.getLong(0)) == ((nPrior, lastClick)),
            s"event ${e.getLong(0)}: PIT features diverge from sequential replay")
          checked += 1
        }
        if (e.getString(3) == "click") lastClick = Some(e.getLong(4))
        nPrior += 1
      }
    }
    assert(checked == out.size)
  }

  // -------------------------------------------------------- csv_quoted_multiline

  test("quoted CSV: delimiter-in-quotes, embedded newline, and doubled-quote " +
    "escapes parse to the exact expected relation") {
    // amount parses as exact DECIMAL(12,2) and leaves as DOUBLE (envelope
    // rule: no DecimalType in any output schema — HashEnvelopeSpec)
    val rows = graft.ops.SourceSinkOps.csvQuotedMultiline.fn(spark, TestSpark.sf001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (1, "Smith, John", "line one<NL>line two", 10.5),
      (2, "O\"Brien", "plain", 3.25),
      (3, "Plain", "trailing \"quoted\" word", 7.0),
      (4, "with,comma", "<EMPTY>", 0.75),
      (5, "unquoted", "ends with comma,", 1.0)))
  }

  // ------------------------------------------------------------ ts_uptime_sla

  test("uptime SLA: downtime plus uptime equals the observed span, outage " +
    "counts match the raw gap list, and fractions stay in [0, 1]") {
    val gaps = graft.ops.TimeSeriesOps.tsGapDetection.fn(spark, TestSpark.sf001).collect()
      .groupBy(_.getLong(0)).map { case (u, rs) => u -> (rs.length.toLong, rs.map(_.getLong(3)).sum) }
    val rows = graft.ops.TimeSeriesOps.tsUptimeSla.fn(spark, TestSpark.sf001).collect()
    rows.foreach { r =>
      val (u, span, nOut, down, frac) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5))
      val (expN, expDown) = gaps.getOrElse(u, (0L, 0L))
      assert(nOut == expN && down == expDown, s"user $u outage rollup mismatch")
      assert(frac >= 0.0 && frac <= 1.0)
      if (span > 0) assert(frac == (span - down).toDouble / span)
    }
  }

  // ----------------------------------------------------- dq_benford_firstdigit

  test("Benford audit: observed digit counts conserve the row count, " +
    "expected frequencies sum to ~1, and the total chi2 row adds up") {
    val rows = graft.ops.DqOps.dqBenfordFirstdigit.fn(spark, TestSpark.sf001).collect()
    val (tot, per) = rows.partition(_.isNullAt(0))
    assert(tot.length == 1 && per.length <= 9 && per.nonEmpty)
    val nOrders = spark.read.parquet(s"${TestSpark.sf001}/orders.parquet").count()
    assert(per.map(_.getLong(1)).sum == nOrders)
    assert(tot(0).getLong(1) == nOrders)
    assert(tot(0).getLong(2) == per.map(_.getLong(2)).sum)
    assert(tot(0).getLong(3) == per.map(_.getLong(3)).sum)
    // expected_e6 across ALL 9 digits would be ~n*1e6; with digits present
    // it cannot exceed that
    assert(tot(0).getLong(2) <= nOrders * 1000000L)
  }

  // ------------------------------------------------------- text_keyword_context

  test("KWIC: every context window contains the keyword at the right slot " +
    "and hit counts match a direct token scan") {
    val rows = graft.ops.TextOps.textKeywordContext.fn(spark, TestSpark.sf001).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    var hits = 0
    rows.foreach { r =>
      val (id, pos, ctx) = (r.getLong(0), r.getInt(1), r.getString(2))
      val words = docs(id)
      assert(words(pos - 1) == "window", s"doc $id pos $pos is not the keyword")
      val start = math.max(1, pos - 2)
      val end = math.min(words.length, pos + 2)
      assert(ctx == words.slice(start - 1, end).mkString(" "), s"doc $id context window")
      hits += 1
    }
    assert(hits == docs.valuesIterator.map(_.count(_ == "window")).sum)
  }

  // -------------------------------------------------------- multimodal_audio_vad

  test("audio VAD: segments are disjoint maximal runs of exactly the " +
    "above-threshold frames, with conserved energy") {
    val frames = graft.ops.MultimodalOps.multimodalAudioFrames.fn(spark, TestSpark.sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    val segs = graft.ops.MultimodalOps.multimodalAudioVad.fn(spark, TestSpark.sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5)))
    assert(segs.nonEmpty)
    val byKey = frames.groupBy(f => (f._1, f._2))
    segs.groupBy(s => (s._1, s._2)).foreach { case (key, ss) =>
      val fr = byKey(key).map(f => f._3 -> (f._4, f._5)).toMap
      val active = fr.filter { case (_, (n, sq)) => sq > 358000000L * n }.keySet
      // reconstruct maximal runs independently
      val runs = active.toSeq.sorted.foldLeft(List.empty[(Int, Int)]) {
        case ((s0, e0) :: rest, f) if f == e0 + 1 => (s0, f) :: rest
        case (acc, f) => (f, f) :: acc
      }.reverse
      assert(ss.map(s => (s._3, s._4)).toSeq == runs, s"$key segment runs mismatch")
      ss.foreach { s =>
        val expEnergy = (s._3 to s._4).map(f => fr(f)._2).sum
        assert(s._6 == expEnergy && s._5 == s._4 - s._3 + 1)
      }
    }
  }

  // ------------------------------------------------------------ sql_order_by_all

  test("ORDER BY ALL totally orders the rollup identically to the explicit " +
    "spelling") {
    val viaAll = graft.ops.SqlSurfaceOps.sqlOrderByAll.fn(spark, TestSpark.sf001).collect()
    graft.ops.GraftCatalog.registerAll(spark, TestSpark.sf001)
    val explicit = spark.sql("SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n, " +
      "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total " +
      "FROM orders GROUP BY o_orderpriority, o_orderstatus " +
      "ORDER BY o_orderpriority, o_orderstatus, n, total").collect()
    assert(viaAll.toSeq == explicit.toSeq)
  }

  // ------------------------------------------------- billing_weekly_statement

  test("weekly statement: the accounting identity holds — closing(w) equals " +
    "opening(next w) per user, and the final closing equals the ledger's " +
    "final balance") {
    val rows = graft.ops.BillingOps.billingWeeklyStatement.fn(spark, TestSpark.sf001).collect()
    val finalBal = graft.ops.BillingOps.billingPrepaidBalance.fn(spark, TestSpark.sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getTimestamp(1).getTime)
      sorted.foreach { r =>
        assert(r.getLong(5) == r.getLong(2) + r.getLong(3) - r.getLong(4),
          s"user $u closing != opening + credits - charges")
      }
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(a.getLong(5) == b.getLong(2), s"user $u statement chain broken")
      }
      assert(sorted.head.getLong(2) == 0L, s"user $u opening not zero")
      assert(sorted.last.getLong(5) == finalBal(u), s"user $u final balance mismatch")
    }
  }

  // --------------------------------------------------- stream_prepaid_cutoff

  test("streaming prepaid cutoff: per-user cutoff event counts equal the " +
    "batch audit's n_cutoffs (streaming/batch parity beyond the hash)") {
    val streamed = graft.ops.StreamingOps.streamPrepaidCutoff.fn(spark, TestSpark.sf001)
      .collect().groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.length.toLong }
    val batch = graft.ops.BillingOps.billingPrepaidBalance.fn(spark, TestSpark.sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    batch.foreach { case (u, n) =>
      assert(streamed.getOrElse(u, 0L) == n, s"user $u cutoff count parity")
    }
    assert(streamed.keySet.subsetOf(batch.keySet))
    // every emitted cutoff balance is strictly negative
    graft.ops.StreamingOps.streamPrepaidCutoff.fn(spark, TestSpark.sf001).collect()
      .foreach(r => assert(r.getLong(2) < 0))
  }

  // ------------------------------------------------------- split_cluster_safe

  test("cluster-safe split: near-dup pairs never straddle splits, singletons " +
    "equal the plain content-hash split, and the rule is not vacuous (some " +
    "naive-split pair WOULD have straddled)") {
    val assign = graft.ops.LlmOps.splitClusterSafe.fn(spark, TestSpark.sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val pairs = graft.ops.LlmOps.ngramPairs(
      graft.tables.Tables.documents(spark, TestSpark.sf001)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no near-dup pairs — the test would be vacuous")
    pairs.foreach { case (a, b) =>
      assert(assign(a)._2 == assign(b)._2, s"pair ($a,$b) straddles splits")
      assert(assign(a)._1 == assign(b)._1, s"pair ($a,$b) has different reps")
    }
    val naive = graft.ops.PipelineOps.splitTrainValTest.fn(spark, TestSpark.sf001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assign.foreach { case (id, (rep, split)) =>
      if (!clustered.contains(id)) {
        assert(rep == id && split == naive(id), s"singleton $id diverges from naive split")
      }
    }
    // motivation check: the naive split disagrees inside at least one cluster
    assert(pairs.exists { case (a, b) => naive(a) != naive(b) },
      "every naive pair already agreed — cluster-safety changed nothing here")
  }

  // ---------------------------------------------------- graph_modularity_score

  test("modularity: components absorb every edge (CC makes all edges " +
    "intra-community), the rational reduces to 1 - sum(d_c^2)/(4m^2), and " +
    "the emitted double is that exact ratio") {
    val rows = graft.ops.GraphOps.graphModularityScore.fn(spark, TestSpark.sf001).collect()
    val (tot, per) = rows.partition(_.isNullAt(0))
    assert(tot.length == 1 && per.nonEmpty)
    val t = tot(0)
    val m = per.map(_.getLong(2)).sum
    assert(t.getLong(2) == m, "total edges not conserved")
    assert(per.map(_.getLong(3)).sum == 2 * m, "degree sum != 2m")
    val qNum = BigInt(t.getString(4)); val qDen = BigInt(t.getString(5))
    val sumD2 = per.map(r => BigInt(r.getLong(3)) * r.getLong(3)).sum
    assert(qNum == BigInt(4) * m * m - sumD2, "q_num identity")
    assert(qDen == BigInt(4) * m * m, "q_den identity")
    assert(t.getDouble(6) == qNum.toDouble / qDen.toDouble ||
      math.abs(t.getDouble(6) - qNum.toDouble / qDen.toDouble) < 1e-15)
    assert(t.getDouble(6) > 0.0 && t.getDouble(6) < 1.0)
  }

  // ----------------------------------------------------- ts_degradation_slope

  test("degradation slope: matches an exact BigInt OLS recompute per device, " +
    "and the declining flag is the covariance sign, not a float threshold") {
    val rows = graft.ops.TimeSeriesOps.tsDegradationSlope.fn(spark, TestSpark.sf001).collect()
    val daily = graft.tables.Tables.events(spark, TestSpark.sf001)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg((sum(col("value").cast(graft.ops.Dets.D12_2)) * 100).cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val (u, n) = (r.getLong(0), r.getLong(1))
      val pts = daily(u).map(p => (BigInt(p._2), BigInt(p._3)))
      assert(n == pts.length)
      if (n >= 2) {
        val bn = BigInt(n)
        val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
        val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
        val cov = bn * sxy - sx * sy; val vx = bn * sxx - sx * sx
        assert(r.getBoolean(3) == (cov < 0), s"user $u declining flag")
        assert(r.getDouble(4) == cov.toDouble / vx.toDouble, s"user $u slope")
        assert(r.getString(2) == "fitted")
      } else assert(r.getString(2) == "short_history" && !r.getBoolean(3))
    }
  }

  // --------------------------------------------------- embed_centroid_outliers

  test("centroid outliers: 5 ascending-cosine rows per label, cosine is the " +
    "pinned spelling of the emitted exact components, and the kept set IS " +
    "the bottom-5 (verified against a full recompute for one label)") {
    val rows = PipelineOps.embedCentroidOutliers.fn(spark, TestSpark.sf001).collect()
    val byLabel = rows.groupBy(_.getInt(0))
    for ((_, rs) <- byLabel) {
      assert(rs.length == 5)
      val cosines = rs.sortBy(_.getInt(1)).map(_.getDouble(6))
      assert(cosines.zip(cosines.drop(1)).forall { case (a, b) => a <= b })
      rs.foreach { r =>
        val expected = r.getLong(3).toDouble /
          math.sqrt(r.getLong(4).toDouble * r.getLong(5).toDouble)
        assert(r.getDouble(6) == expected, "cosine spelling mismatch")
      }
    }
    // full recompute for label 0: quantize, centroid, cosine, bottom-5
    val vecs = spark.read.parquet(s"${TestSpark.sf001}/embeddings.parquet")
      .where(col("label") === 0).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val quant = vecs.map { case (id, v) =>
      val maxabs = v.map(math.abs).max
      val scale = if (maxabs == 0) 0.0 else 127.0 / maxabs
      id -> v.map(x => math.floor(x * scale + 0.5).toLong)
    }
    val dim = quant.head._2.length
    val cent = Array.tabulate(dim)(i => quant.map(_._2(i)).sum)
    val nc2 = cent.map(c => c * c).sum
    val scored = quant.map { case (id, q) =>
      val dot = q.zip(cent).map { case (a, b) => a * b }.sum
      val nq2 = q.map(x => x * x).sum
      (id, dot.toDouble / math.sqrt(nq2.toDouble * nc2.toDouble))
    }.sortBy(p => (p._2, p._1)).take(5).map(_._1).toSeq
    val gotIds = byLabel(0).sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    assert(gotIds == scored, s"label-0 bottom-5 mismatch: $gotIds vs $scored")
  }
}
