package graft

import graft.ops.SourceSinkOps
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The physical-property claim behind `sink_zorder_layout`: Morton-interleave
  * clustering gives every file a small rectangle in BOTH filter dimensions,
  * where a linear (single-key range) layout gives one dimension perfect
  * locality and leaves the other spanning the whole domain per file.
  *
  * Measured at sf0.01 / 16 files (deterministic layout): linear-on-partkey
  * files average a ~6 % partkey span but a 100 % suppkey span; Z-order files
  * average ~40 % / ~29 % — the ~sqrt split a 4×4 Morton grid predicts. The
  * assertions below pin the qualitative claim with margin.
  */
class ZorderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def spans(dir: String): Array[(Long, Long)] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey")).first()
        (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
      }

  test("z-order files cover small rectangles in BOTH dims; linear cannot") {
    val root = java.nio.file.Files.createTempDirectory("zorder_spec")
    try {
      val zdir = root.resolve("z").toString
      val ldir = root.resolve("linear").toString
      val (pkMax, skMax) = SourceSinkOps.writeZorder(spark, TestSpark.sf001, zdir)
      Tables.lineitem(spark, TestSpark.sf001)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_returnflag")
        .repartitionByRange(16, col("l_partkey"))
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite").parquet(ldir)

      def avgFrac(s: Array[(Long, Long)], dim: ((Long, Long)) => Long, domain: Long) =
        s.map(t => dim(t).toDouble / domain).sum / s.length
      val (zs, ls) = (spans(zdir), spans(ldir))
      val zPk = avgFrac(zs, _._1, pkMax)
      val zSk = avgFrac(zs, _._2, skMax)
      val lSk = avgFrac(ls, _._2, skMax)
      info(f"avg span fraction: zorder pk=$zPk%.2f sk=$zSk%.2f; linear sk=$lSk%.2f")
      // the problem the layout solves: linear leaves the second dim useless
      assert(lSk > 0.9, f"linear files should span ~the whole suppkey domain, got $lSk%.2f")
      // the fix: both dims sub-linear per file (≈ 1/4 at 16 files in theory)
      assert(zPk < 0.5, f"zorder partkey span fraction $zPk%.2f not < 0.5")
      assert(zSk < 0.5, f"zorder suppkey span fraction $zSk%.2f not < 0.5")

      // and the corner query's predicates reach the scan
      val q = spark.read.parquet(zdir)
        .where(col("l_partkey") <= lit(pkMax / 10) && col("l_suppkey") <= lit(skMax / 10))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("l_partkey") &&
        plan.contains("l_suppkey"), plan)
    } finally graft.ops.Housekeeping.deleteRecursively(root)
  }
}
