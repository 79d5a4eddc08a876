package graft

import graft.ops.StatsOps
import graft.tables.Tables
import org.scalatest.funsuite.AnyFunSuite

/** stats_bottomk_quantiles against an independent pure-Scala model, plus the
  * MERGEABILITY IDENTITY the whole design rests on: re-taking the k smallest
  * hash ranks from the union of per-day bottom-k samples yields EXACTLY the
  * sample a direct bottom-k pass over the raw range would draw — that is what
  * lets a 100 TB deployment answer any range from k×days standing rows.
  */
class BottomkQuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val K = 64

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** (day, value, rank-hex, event_id) for every event — the model's raw rows. */
  private def modelRows(sfDir: String): Seq[(java.sql.Date, Double, String, Long)] =
    Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS DATE) AS day", "value", "event_id")
      .collect()
      .map(r => (r.getDate(0), r.getDouble(1), md5hex(r.getLong(2).toString), r.getLong(2)))
      .toSeq

  private def bottomK(rows: Seq[(java.sql.Date, Double, String, Long)]) =
    rows.sortBy(t => (t._3, t._4)).take(K)

  test("mergeability identity: union-of-daily bottom-k re-sampled == direct range bottom-k") {
    val rows = modelRows(TestSpark.sf0001)
    val lo = java.sql.Date.valueOf(rows.map(_._1).min.toLocalDate.plusDays(3))
    val inRange = rows.filter(!_._1.before(lo))
    val direct = bottomK(inRange)
    val daily = rows.groupBy(_._1).valuesIterator.flatMap(bottomK).toSeq
    val merged = bottomK(daily.filter(!_._1.before(lo)))
    assert(merged == direct, "merged daily samples must reproduce the direct range sample")
  }

  test("stats_bottomk_quantiles equals positional quantiles of the model sample") {
    val rows = modelRows(TestSpark.sf0001)
    val lo = java.sql.Date.valueOf(rows.map(_._1).min.toLocalDate.plusDays(3))
    val sample = bottomK(rows.filter(!_._1.before(lo)))
    val byValue = sample.sortBy(t => (t._2, t._3, t._4)).map(_._2)
    val n = byValue.size
    val expect = Seq(25, 50, 75, 90).map { p =>
      p -> byValue(math.max(1, math.ceil(p * n / 100.0).toInt) - 1)
    }

    val got = StatsOps.statsBottomkQuantiles.fn(spark, TestSpark.sf0001)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toSeq
    assert(got == expect, "positional quantile estimates over the merged sample")
    // the sample really is k rows drawn from a larger range (not degenerate)
    assert(n == K, s"sample size $n")
  }

  test("sample quantiles land within the rank-error envelope of the exact quantiles") {
    // Uniform-sample order statistics: estimated p-quantile's TRUE rank lies
    // within p ± ~3·sqrt(p(1-p)/K). Generous 3.5-sigma bound at K=64 ≈ ±0.22
    // worst-case; this guards against a systematically biased sampler, not
    // for tightness.
    val rows = modelRows(TestSpark.sf001)
    val lo = java.sql.Date.valueOf(rows.map(_._1).min.toLocalDate.plusDays(3))
    val inRange = rows.filter(!_._1.before(lo))
    val values = inRange.map(_._2).sorted
    val got = StatsOps.statsBottomkQuantiles.fn(spark, TestSpark.sf001)
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
    got.foreach { case (p, est) =>
      val trueRank = values.count(_ <= est).toDouble / values.size
      val sigma = math.sqrt(p / 100.0 * (1 - p / 100.0) / K)
      assert(math.abs(trueRank - p / 100.0) <= 3.5 * sigma + 1.0 / K,
        s"p$p: est $est has true rank $trueRank")
    }
  }
}
