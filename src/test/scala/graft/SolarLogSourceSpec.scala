package graft

import graft.ops.SourceSinkOps
import graft.sources.{SolarLogScan, SolarLogScanBuilder}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan}
import org.scalatest.funsuite.AnyFunSuite

/** graft.sources.SolarLogSource (custom DataSource V2): pruning, pushdown,
  * per-file partitioning, and permissive-parse semantics. */
class SolarLogSourceSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark

  private def opDf = SourceSinkOps.sourceCustomV2Solarlog.fn(spark, TestSpark.sf0001)

  test("plan: V2 scan with pruned read schema and pushed equality filter") {
    val df = opDf
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BatchScanExec => b }
    assert(scans.nonEmpty, "BatchScanExec missing")
    val scan = scans.head.scan.asInstanceOf[SolarLogScan]
    // Spark (SupportsPushDownFilters contract) conservatively re-evaluates
    // pushed filters post-scan, so the filter column rides along with the 5
    // selected ones — pruning still drops the other 6 of 12 source columns;
    // the pushdown's value is the parse-time row skip inside the reader
    assert(scan.readSchema().fieldNames.toSet ==
      Set("machine_id", "circuit_type", "ts", "watts", "wh_today", "credit"),
      s"columns not pruned: ${scan.readSchema().fieldNames.mkString(",")}")
    assert(scan.pushed.toSeq == Seq(EqualTo("circuit_type", "PWR")),
      s"filter not pushed: ${scan.pushed.mkString(",")}")
    // two staged log days → two input partitions (one per file)
    assert(scan.planInputPartitions().length == 2)
  }

  test("builder: unsupported filters stay residual, supported ones push") {
    val b = new SolarLogScanBuilder("/nonexistent")
    val residual = b.pushFilters(Array(
      EqualTo("machine_id", "1a2b3c"), GreaterThan("watts", java.math.BigDecimal.ONE)))
    assert(b.pushedFilters().toSeq == Seq(EqualTo("machine_id", "1a2b3c")))
    assert(residual.toSeq == Seq(GreaterThan("watts", java.math.BigDecimal.ONE)))
  }

  test("write side: round trip commits atomically, no temporaries survive") {
    val rows = SourceSinkOps.sinkCustomV2Roundtrip.fn(spark, TestSpark.sf0001).collect()
    assert(rows.length == 10)
    val outDir = java.nio.file.Paths.get(
      graft.ops.Stage.root(TestSpark.sf0001) + "/v2log_out")
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.list(outDir).iterator().asScala.map(_.getFileName.toString).toSeq
    assert(files.nonEmpty && files.forall(f => f.endsWith(".csv") && !f.startsWith(".")),
      s"uncommitted temporaries visible: $files")
  }

  test("write side: an aborted task leaves nothing visible") {
    val dir = java.nio.file.Files.createTempDirectory("v2abort")
    val w = new graft.sources.SolarLogDataWriter(dir.toString,
      graft.sources.SolarLogTable.schema, 0, 42L)
    w.write(org.apache.spark.sql.catalyst.InternalRow.fromSeq(
      graft.sources.SolarLogTable.schema.map(_ => null).toIndexedSeq))
    w.abort()
    import scala.jdk.CollectionConverters._
    val left = java.nio.file.Files.list(dir).iterator().asScala.toSeq
    assert(left.isEmpty, s"abort left files: $left")
    graft.ops.Housekeeping.deleteRecursively(dir)
  }

  test("permissive parse: malformed numerics are null, duplicates survive") {
    val rows = opDf.collect()
    assert(rows.length == 10) // 5 PWR rows × 2 staged days
    assert(rows.count(_.isNullAt(2)) == 2, "one malformed watts row per day")
    // the re-uploaded duplicate row survives verbatim (dedup is a
    // downstream op's job, not the reader's)
    assert(rows.groupBy(_.toSeq).values.exists(_.length == 2))
  }
}
