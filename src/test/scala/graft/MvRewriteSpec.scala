package graft

import graft.ops.AggOps
import graft.plans.MvCatalog
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** agg_mv_rewrite_rollup (plans/MvRewrite.scala): the injected optimizer
  * rule navigates the plain base-table rollup to the MV — and ONLY that
  * exact shape. */
class MvRewriteSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s.metadata.getOrElse("Location", "")
    }

  test("navigated plan reads the MV and never the base table; values ≡ recompute") {
    val df = AggOps.aggMvRewriteRollup.fn(spark, TestSpark.sf0001)
    try {
      val navigated = df.collect().map(_.toSeq).toSeq
      val paths = scanPaths(df)
      assert(paths.exists(_.contains("mv_daily_rollup")), s"MV scan missing: $paths")
      assert(!paths.exists(_.contains("events.parquet")), s"base table still scanned: $paths")
      // same query with the catalog cleared = the recompute; values must match
      MvCatalog.clear()
      val recomputed = graft.tables.Tables.events(spark, TestSpark.sf0001)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"), graft.ops.Dets.dsum(col("value")).as("sum_value"))
        .orderBy("day")
      assert(scanPaths(recomputed).exists(_.contains("events.parquet")))
      assert(recomputed.collect().map(_.toSeq).toSeq == navigated)
    } finally MvCatalog.clear()
  }

  test("a FILTERED rollup is never wrongly navigated") {
    AggOps.aggMvRewriteRollup.fn(spark, TestSpark.sf0001) // registers MV
    try {
      val filtered = graft.tables.Tables.events(spark, TestSpark.sf0001)
        .where(col("event_type") === "view")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"), graft.ops.Dets.dsum(col("value")).as("sum_value"))
      val paths = scanPaths(filtered)
      assert(paths.exists(_.contains("events.parquet")),
        s"filtered rollup must read the base table: $paths")
      assert(!paths.exists(_.contains("mv_daily_rollup")))
    } finally MvCatalog.clear()
  }
}
