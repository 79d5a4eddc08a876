package graft

import graft.ops.{SourceSinkOps, TableManifest}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The mechanical claims behind `scan_stats_prune` (the oracle proves result
  * content against the source table):
  *
  *  1. Pruning PRUNES: a middle-sixth key-range over the 16-file range-
  *     clustered table resolves to a strict minority of the live files.
  *  2. Pruning is SAFE: the pruned scan equals the full manifest scan under
  *     the same predicate, row for row.
  *  3. Missing stats are conservative: a live file absent from the sidecar
  *     is always kept, never silently skipped.
  *  4. An empty intersection resolves to zero files (the fast-path a
  *     partition-pruned 100 TB query takes — no scan job at all).
  */
class StatsPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("manifest zone-map pruning: minority of files, exact results, conservative fallbacks") {
    val root = Files.createTempDirectory("stats_prune_spec")
    try {
      val mx = SourceSinkOps.writeStatsPruned(spark, TestSpark.sf001, root)
      val (_, live) = TableManifest.read(root)
      assert(live.size == 16, s"expected the 16-file clustered build, got ${live.size}")

      val (lo, hi) = (mx / 3, mx / 2)
      val pruned = TableManifest.filesForRange(root, lo, hi)
      info(s"pruned file list: ${pruned.size} of ${live.size}")
      // middle sixth of a range-clustered domain: ~3 files; strict minority
      // is the load-bearing claim (some slack for uneven range partitioning)
      assert(pruned.nonEmpty && pruned.size <= 5,
        s"a sixth of the key domain should resolve to <=5 of 16 files, got ${pruned.size}")
      assert(pruned.toSet.subsetOf(live.toSet))

      // safety: pruned scan == full scan under the same predicate
      val full = TableManifest.readTable(spark, root)
        .where(col("l_orderkey").between(lo, hi))
      val fast = spark.read.parquet(pruned.map(_.toString): _*)
        .where(col("l_orderkey").between(lo, hi))
      assert(fast.count() == full.count())
      assert(fast.exceptAll(full).isEmpty && full.exceptAll(fast).isEmpty,
        "pruned scan diverged from the full manifest scan")

      // conservative rule: a live file with no stats entry is always kept.
      // Re-commit v2 with the same files but stats for only half of them —
      // the stats-less half must survive any range.
      val half = live.take(8)
      val statsTxt = Files.readString(root.resolve("_stats-v1.json"))
      val bounds = """\{"f":"(/[^"]+)","mn":(-?\d+),"mx":(-?\d+)\}""".r
        .findAllMatchIn(statsTxt)
        .map(m => m.group(1) -> (m.group(2).toLong, m.group(3).toLong)).toMap
      val halfStats = half.map(f => f -> bounds(f.toAbsolutePath.toString)).toMap
      TableManifest.commitWithStats(root, 2, live, "l_orderkey", halfStats)
      val conservative = TableManifest.filesForRange(root, mx * 2, mx * 3)
      assert(conservative.toSet == live.drop(8).toSet,
        "files without stats must be kept; files with stats outside the range must be pruned")

      // empty intersection with full stats: zero files
      TableManifest.commitWithStats(root, 3, live, "l_orderkey",
        live.map(f => f -> bounds(f.toAbsolutePath.toString)).toMap)
      assert(TableManifest.filesForRange(root, mx * 2, mx * 3).isEmpty)

      // a version WITHOUT a sidecar falls back to the full live set
      TableManifest.commit(root, 4, live)
      assert(TableManifest.filesForRange(root, lo, hi) == live)
    } finally {
      graft.ops.Housekeeping.deleteRecursively(root)
    }
  }
}
