package graft

import graft.ops.SourceSinkOps
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The mechanical claims behind `sink_compact_small_files` (the oracle
  * already proves content identity):
  *
  *  1. The file count actually collapses — many tiny ingest files in, a few
  *     target-size files out.
  *  2. The compacted layout is range-clustered again: every output file
  *     covers a disjoint slice of the (l_orderkey, l_linenumber) domain, so
  *     footer min/max row-group skipping works after compaction exactly as
  *     it does after a clustered write (the stats a fragmented table's
  *     interleaved files cannot offer).
  *  3. Not a single row is lost or duplicated (count in == count out).
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compaction collapses the file count, restores disjoint key ranges, keeps rows") {
    val root = java.nio.file.Files.createTempDirectory("compaction_spec")
    try {
      val frag = root.resolve("fragmented").toString
      val out = root.resolve("compacted").toString
      Tables.lineitem(spark, TestSpark.sf001)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
          "l_returnflag", "l_linestatus")
        .repartition(64)
        .write.mode("overwrite").parquet(frag)

      val (before, after) = SourceSinkOps.compactTable(spark, frag, out,
        targetFileBytes = 512 * 1024)
      assert(before >= 32, s"fixture should be fragmented, got $before files")
      assert(after * 8 <= before,
        s"compaction should collapse the file count >=8x: $before -> $after")

      val files = new java.io.File(out).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).sorted
      assert(files.length == after)
      if (files.length >= 2) {
        val ranges = files.map { f =>
          val r = spark.read.parquet(f).agg(
            min(struct(col("l_orderkey"), col("l_linenumber"))).as("mn"),
            max(struct(col("l_orderkey"), col("l_linenumber"))).as("mx")).first()
          (r.getStruct(0), r.getStruct(1), f)
        }.sortBy(t => (t._1.getLong(0), t._1.getInt(1)))
        ranges.sliding(2).foreach {
          case Array((_, aMax, fa), (bMin, _, fb)) =>
            val ok = aMax.getLong(0) < bMin.getLong(0) ||
              (aMax.getLong(0) == bMin.getLong(0) && aMax.getInt(1) <= bMin.getInt(1))
            assert(ok, s"overlapping key ranges after compaction: $fa vs $fb")
          case _ =>
        }
      }

      val inRows = spark.read.parquet(frag).count()
      val outRows = spark.read.parquet(out).count()
      assert(inRows == outRows, s"row count changed: $inRows -> $outRows")
    } finally {
      graft.ops.Housekeeping.deleteRecursively(root)
    }
  }
}
