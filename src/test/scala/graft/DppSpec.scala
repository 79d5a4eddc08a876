package graft

import graft.ops.StarOps
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite

/** join_dpp_partition_pruning (ops/StarOps.scala): dynamic partition
  * pruning actually fires — the fact scan's partition filters carry the
  * runtime `dynamicpruning` subquery fed from the dim side. */
class DppSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark

  test("fact scan carries a dynamicpruning partition filter; result is the 5-day slice") {
    val df = StarOps.joinDppPartitionPruning.fn(spark, TestSpark.sf0001)
    val rows = df.collect()
    assert(rows.length == 5, s"expected the 5 qualifying days, got ${rows.length}")
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec if s.metadata.get("Location").exists(_.contains("dpp_facts")) => s
    }
    assert(scans.nonEmpty, "staged fact scan missing")
    assert(scans.exists(_.partitionFilters.exists(_.toString.contains("dynamicpruning"))),
      s"no dynamicpruning partition filter on the fact scan:\n${scans.map(_.partitionFilters).mkString("\n")}")
  }
}
