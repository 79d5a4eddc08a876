package graft

import graft.ops.SourceSinkOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-property assertion behind `sink_clustered_layout`: after the
  * range-clustered write, every output file covers a disjoint slice of the
  * shipdate domain (adjacent slices may touch only where a single date
  * straddles a partition boundary via the secondary sort key), and a range
  * predicate on the clustering key is pushed to the parquet reader — the two
  * facts that together make footer-stats row-group skipping near-perfect. */
class ClusteredLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("range-clustered files cover disjoint shipdate slices; range filter is pushed") {
    val out = java.nio.file.Files.createTempDirectory("clustered_spec").toString
    try {
      SourceSinkOps.writeClustered(spark, TestSpark.sf001, out)
      val files = new java.io.File(out).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).sorted
      assert(files.length >= 2, s"expected several clustered files, got ${files.length}")
      val ranges = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(col("l_shipdate")).cast("string").as("mn"),
            max(col("l_shipdate")).cast("string").as("mx")).first()
        (r.getString(0), r.getString(1), f)
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, aMax, fa), (bMin, _, fb)) =>
          assert(aMax <= bMin, s"overlapping slices: $fa [..$aMax] vs $fb [$bMin..]")
        case _ =>
      }
      val q = spark.read.parquet(out)
        .where(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"), plan)
    } finally {
      graft.ops.Housekeeping.deleteRecursively(java.nio.file.Paths.get(out))
    }
  }
}
