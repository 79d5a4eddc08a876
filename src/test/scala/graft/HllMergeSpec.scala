package graft

import graft.ops.AggOps
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two claims behind `agg_hll_mergeable`:
  *  1. MERGEABILITY, exactly: HLL union takes per-register maxima, so the
  *     union of per-day sketches is state-identical to one sketch built over
  *     all days — the estimates must be EQUAL, not merely close. This is the
  *     property that lets a 100 TB pipeline persist daily sketches and
  *     answer any range without rescanning facts.
  *  2. ACCURACY: every estimate (per day and total) within ±5 % of the exact
  *     distinct count, same bar as agg_approx_hll (lgK=12 ⇒ ~1.6 % RSE).
  */
class HllMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("union of daily sketches equals the all-days sketch exactly; estimates within 5%") {
    val d = TestSpark.sf001
    val events = Tables.events(spark, d)
    val mergedEst = AggOps.aggHllMergeable.fn(spark, d)
      .where(col("day") === "total").first().getLong(1)
    // The direct side is routed through a (trivial) hll_union_agg so BOTH
    // estimates come from the DataSketches composite estimator: a never-
    // merged sketch estimates via HIP, a union result via the composite
    // estimator, and whether a plain hll_sketch_agg result counts as
    // "merged" depends on Spark's partial-aggregation layout. Union takes
    // per-register maxima, so union({all-days sketch}) is state-identical to
    // union(daily sketches) — with the estimator path pinned, equality is
    // exact and partition-layout-independent.
    val directEst = events
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("e"))
      .first().getLong(0)
    assert(mergedEst == directEst,
      s"union-of-daily ($mergedEst) != union-path all-days sketch ($directEst)")

    val exactTotal = events.select(countDistinct(col("user_id"))).first().getLong(0)
    assert(math.abs(mergedEst - exactTotal) <= 0.05 * exactTotal,
      s"total estimate $mergedEst vs exact $exactTotal exceeds 5%")

    val perDay = AggOps.aggHllMergeable.fn(spark, d)
      .where(col("day") =!= "total")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactPerDay = events.groupBy(to_date(col("ts")).cast("string").as("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perDay.keySet == exactPerDay.keySet)
    exactPerDay.foreach { case (day, exact) =>
      assert(math.abs(perDay(day) - exact) <= math.max(1.0, 0.05 * exact),
        s"day $day estimate ${perDay(day)} vs exact $exact exceeds 5%")
    }
  }

  test("agg_hll_mergeable is deterministic across runs") {
    val once = AggOps.aggHllMergeable.fn(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
    val twice = AggOps.aggHllMergeable.fn(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
    assert(once == twice)
  }
}
