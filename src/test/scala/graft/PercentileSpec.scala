package graft

import graft.ops.SubqueryOps
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** approx percentiles must bracket the exact quantiles. */
class PercentileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("agg_approx_percentile within tolerance of exact quantiles") {
    val approx = SubqueryOps.aggApproxPercentile.fn(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.orders(spark, TestSpark.sf0001)
      .groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
           expr("percentile(o_totalprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (e50, e95)) =>
      val (a50, a95) = approx(k)
      assert(math.abs(a50 - e50) / e50 <= 0.05, s"$k p50 approx=$a50 exact=$e50")
      assert(math.abs(a95 - e95) / e95 <= 0.05, s"$k p95 approx=$a95 exact=$e95")
    }
  }
}
