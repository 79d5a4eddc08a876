package graft

import graft.ops.{SourceSinkOps, TableManifest}
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The mechanical claims behind `sink_targeted_delete` (the oracle proves
  * result content; ManifestCommitSpec proves the commit's atomicity):
  *
  *  1. The rewrite is CONFINED by the clustered layout's file stats — a
  *     ~5 % key-slice delete touches ≤ 2 of 16 files.
  *  2. Every untouched file is retained BY REFERENCE: the new manifest lists
  *     the very same paths (nothing is copied or re-encoded), and their
  *     bytes are untouched by the commit.
  *  3. The delete is exact: zero surviving rows in the deleted range, and
  *     nothing outside the range was lost.
  */
class TargetedDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("delete rewrites only stat-intersecting files; the rest are retained by reference") {
    val root = Files.createTempDirectory("targeted_delete_spec")
    try {
      val standing = root.resolve("standing")
      val li = Tables.lineitem(spark, TestSpark.sf001)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
      li.repartitionByRange(16, col("l_orderkey"), col("l_linenumber"))
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .write.mode("overwrite").parquet(standing.toString)
      TableManifest.commit(root, 1, TableManifest.parquetFiles(standing))
      val mx = li.agg(max(col("l_orderkey")).cast("long")).first().getLong(0)
      val hi = mx / 20

      val (_, before) = TableManifest.read(root)
      val beforeBytes = before.map(p =>
        p.toString -> java.util.Arrays.hashCode(Files.readAllBytes(p))).toMap

      val (touched, untouched) = SourceSinkOps.targetedDeleteCommit(spark, root, 0L, hi)
      info(s"touched=$touched untouched=$untouched of ${touched + untouched} files")
      assert(touched + untouched == 16)
      assert(touched <= 2, s"a 5% clustered-key delete should touch <=2 of 16 files, got $touched")

      // untouched files appear in the new manifest under their ORIGINAL
      // paths, bytes untouched — retained by reference, not copied
      val (v2, after) = TableManifest.read(root)
      assert(v2 == 2)
      val retained = after.map(_.toString).toSet.intersect(beforeBytes.keySet)
      assert(retained.size == untouched)
      retained.foreach { p =>
        val now = java.util.Arrays.hashCode(Files.readAllBytes(java.nio.file.Paths.get(p)))
        assert(now == beforeBytes(p), s"retained file $p was rewritten in place")
      }

      // exactness, read through the committed manifest
      val res = TableManifest.readTable(spark, root)
      assert(res.where(col("l_orderkey") <= hi).count() == 0, "rows in the deleted range survived")
      assert(res.count() == li.where(col("l_orderkey") > hi).count(), "rows outside the range were lost")
    } finally graft.ops.Housekeeping.deleteRecursively(root)
  }
}
