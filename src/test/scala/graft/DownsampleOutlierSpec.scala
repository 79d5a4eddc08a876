package graft

import graft.ops.TimeSeriesOps
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract checks for the two monitoring ops that round 9 adds:
  *
  *  - `ts_downsample_ltob` emits EXACTLY one row per non-empty
  *    (user, 6h bucket), every emitted row is a member of its bucket, and
  *    the chosen point maximizes the neighbor-triangle area within its
  *    bucket (driver-recomputed on one series).
  *  - `ts_outlier_mad` agrees with a driver-side Scala recomputation of
  *    median/MAD/threshold on every event_type, and flags a strict,
  *    non-empty, non-total subset.
  */
class DownsampleOutlierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ltob picks exactly one member point per non-empty bucket") {
    val out = TimeSeriesOps.tsDownsampleLtob.fn(spark, TestSpark.sf001).cache()
    val events = Tables.events(spark, TestSpark.sf001)
      .withColumn("bucket", window(col("ts"), "6 hours").getField("start"))

    val nonEmpty = events.select("user_id", "bucket").distinct().count()
    assert(out.count() == nonEmpty, "one representative per non-empty (user, bucket)")
    assert(out.groupBy("user_id", "bucket").count().filter(col("count") =!= 1).count() == 0)

    // every emitted (user, bucket, ts, value) is a real event in that bucket
    val orphans = out.join(events.select(col("user_id"), col("bucket"), col("ts"), col("value")),
      Seq("user_id", "bucket", "ts", "value"), "left_anti").count()
    assert(orphans == 0, "downsampled points must be members of their bucket")
    out.unpersist()
  }

  test("ltob maximizes neighbor-triangle area (driver recompute on the densest series)") {
    val events = Tables.events(spark, TestSpark.sf001)
    val hot = events.groupBy("user_id").count().orderBy(desc("count"), asc("user_id"))
      .first().getLong(0)
    val series = events.filter(col("user_id") === hot)
      .select(col("ts"), col("value"), col("event_id"))
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1), r.getLong(2)))
      .sortBy(t => (t._1.getTime, t._3)).toIndexedSeq
    def area(i: Int): Option[Double] =
      if (i == 0 || i == series.length - 1) None
      else {
        val x = series(i)._1.getTime / 1000.0
        val px = series(i - 1)._1.getTime / 1000.0
        val nx = series(i + 1)._1.getTime / 1000.0
        val (y, py, ny) = (series(i)._2, series(i - 1)._2, series(i + 1)._2)
        Some(math.abs((px - nx) * (y - py) - (px - x) * (ny - py)))
      }
    val sixH = 6L * 3600 * 1000
    val expected = series.zipWithIndex
      .groupBy { case (p, _) => Math.floorDiv(p._1.getTime, sixH) }
      .map { case (b, pts) =>
        val best = pts.maxBy { case (p, i) =>
          // area desc, then earliest ts — mirror of (desc_nulls_last, ts asc)
          (area(i).getOrElse(Double.NegativeInfinity), -p._1.getTime)
        }
        b -> (best._1._1, best._1._2)
      }
    val got = TimeSeriesOps.tsDownsampleLtob.fn(spark, TestSpark.sf001)
      .filter(col("user_id") === hot)
      .select(col("bucket"), col("ts"), col("value"))
      .collect().map(r => Math.floorDiv(r.getTimestamp(0).getTime, sixH) ->
        (r.getTimestamp(1), r.getDouble(2))).toMap
    assert(got == expected, "per-bucket argmax must match the driver recompute")
  }

  test("rolling z-score flags match a driver-side recompute") {
    val rows = Tables.events(spark, TestSpark.sf001)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
    val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
      val s = rs.sortBy(r => (r._3.getTime, r._1)).toIndexedSeq
      s.indices.flatMap { i =>
        val frame = s.slice(math.max(0, i - 23), i + 1).map(_._4)
        // mirror the op's exact-decimal frame sums: 2-dp values ARE exact
        val n = frame.length.toDouble
        val s1 = frame.map(v => BigDecimal(v).setScale(2)).sum.toDouble
        val s2 = frame.map(v => BigDecimal(v).setScale(2).pow(2)).sum.toDouble
        val mean = s1 / n
        val variance = (s2 - s1 * s1 / n) / n
        if (variance > 0 && math.abs((s(i)._4 - mean) / math.sqrt(variance)) > 3)
          Some(s(i)._1)
        else None
      }
    }.toSet
    val got = TimeSeriesOps.tsZscoreRolling.fn(spark, TestSpark.sf001)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == expected, "rolling z-score flag set must match the driver recompute")
    assert(got.nonEmpty && got.size < rows.length)
  }

  test("ewma matches an independent per-user fold, bounded by the value range") {
    val events = Tables.events(TestSpark.spark, TestSpark.sf0001)
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("value").cast(graft.ops.Dets.D12_2) * 100).cast("bigint").as("c"))
      .collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1), r.getLong(2), r.getLong(3))))

    val model = events.groupBy(_._1).map { case (u, rows) =>
      val cs = rows.map(_._2)
        .sortBy(t => (t._1.toInstant.getEpochSecond, t._1.toInstant.getNano, t._2))
        .map(_._3)
      val e = cs.tail.foldLeft(cs.head)((acc, c) => (20L * c + 80L * acc) / 100L)
      u -> ((cs.length, e, cs.min, cs.max))
    }

    val got = TimeSeriesOps.tsEwmaScaled.fn(TestSpark.spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.map(_._1).toSet == model.keySet, "one row per user")
    got.foreach { case (u, n, e) =>
      val (mn, me, lo, hi) = model(u)
      assert(n == mn, s"sample count for user $u")
      assert(e == me, s"ewma for user $u")
      // smoothing can never escape the input range (floor loses ≤1 cent/step
      // but the recurrence is a convex combination before flooring)
      assert(e >= lo - 1 && e <= hi, s"range for user $u")
    }
  }

  test("mad outliers match a driver-side recompute") {
    val rows = Tables.events(spark, TestSpark.sf001)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def median(vs: Seq[Double]): Double = {
      val s = vs.sorted.toIndexedSeq
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val expected = rows.groupBy(_._2).flatMap { case (t, rs) =>
      val med = median(rs.map(_._3).toSeq)
      val mad = median(rs.map(r => math.abs(r._3 - med)).toSeq)
      rs.filter(r => math.abs(r._3 - med) > 3.5 * mad).map(_._1).toSeq
    }.toSet

    val got = TimeSeriesOps.tsOutlierMad.fn(spark, TestSpark.sf001)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == expected, "MAD outlier set must match the driver recompute")
    assert(got.nonEmpty && got.size < rows.length, "outliers are a strict non-empty subset")
  }
}
