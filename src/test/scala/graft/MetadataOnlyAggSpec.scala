package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SourceSinkOps

/** Contract for `scan_metadata_only_agg` — the metadata-table fast path:
  *
  *   1. The answer equals the data-scan aggregate exactly (the driver's
  *      DuckDB oracle proves the same; this pins Spark-vs-Spark).
  *   2. ZERO data-file scan: the physical plan contains NO file-source scan
  *      at all — the only distributed input is the in-memory file list, and
  *      each file contributes footer bytes only.
  *   3. The footer walk is distributed (runs as Spark tasks over the path
  *      dataset), not a driver loop — the shape that survives a
  *      millions-of-files catalog.
  */
class MetadataOnlyAggSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("footer aggregate equals the data-scan aggregate, with no file scan " +
    "in the plan") {
    val meta = SourceSinkOps.scanMetadataOnlyAgg.fn(spark, d)
    val metaRow = meta.collect().head
    val dataRow = graft.tables.Tables.documents(spark, d)
      .agg(count(lit(1)).as("n_rows"), min(col("doc_id")), max(col("doc_id")))
      .collect().head
    assert(metaRow.getLong(0) == dataRow.getLong(0), "row count must match the data")
    assert(metaRow.getLong(1) == dataRow.getLong(1), "min must match the data")
    assert(metaRow.getLong(2) == dataRow.getLong(2), "max must match the data")
    val scans = collectWithSubqueries(meta.queryExecution.executedPlan) {
      case f: FileSourceScanExec => f
    }
    assert(scans.isEmpty,
      s"metadata-only answering must not scan any data file:\n${meta.queryExecution.executedPlan}")
  }
}
