package graft

import graft.ops.SourceSinkOps
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** The mechanical claims behind `sink_targeted_delete` (the oracle proves
  * result content):
  *
  *  1. The rewrite is CONFINED by the clustered layout's file stats — a
  *     ~5 % key-slice delete touches ≤ 2 of 16 files.
  *  2. Every untouched file is carried over BYTE-IDENTICAL (the move-by-
  *     reference a table format would record as retained files; nothing is
  *     re-encoded).
  *  3. The delete is exact: zero surviving rows in the deleted range, and
  *     nothing outside the range was lost.
  */
class TargetedDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("delete rewrites only stat-intersecting files; the rest move by reference") {
    val root = Files.createTempDirectory("targeted_delete_spec")
    try {
      val standing = root.resolve("standing").toString
      val after = root.resolve("after").toString
      val li = Tables.lineitem(spark, TestSpark.sf001)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
      li.repartitionByRange(16, col("l_orderkey"), col("l_linenumber"))
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .write.mode("overwrite").parquet(standing)
      val mx = li.agg(max(col("l_orderkey")).cast("long")).first().getLong(0)
      val hi = mx / 20

      def bytes(dir: String): Map[String, Int] =
        new java.io.File(dir).listFiles()
          .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .map(f => f.getName ->
            java.util.Arrays.hashCode(Files.readAllBytes(f.toPath))).toMap
      val standingBytes = bytes(standing)

      val (touched, untouched) = SourceSinkOps.targetedDelete(spark, standing, after, 0L, hi)
      info(s"touched=$touched untouched=$untouched of ${touched + untouched} files")
      assert(touched + untouched == 16)
      assert(touched <= 2, s"a 5% clustered-key delete should touch <=2 of 16 files, got $touched")

      // carried-over files byte-identical (same name, same content hash)
      val afterBytes = bytes(after)
      val carried = afterBytes.keySet.intersect(standingBytes.keySet)
      assert(carried.size == untouched)
      carried.foreach { name =>
        assert(afterBytes(name) == standingBytes(name), s"carried file $name was re-encoded")
      }

      // exactness
      val res = spark.read.parquet(after)
      assert(res.where(col("l_orderkey") <= hi).count() == 0, "rows in the deleted range survived")
      assert(res.count() == li.where(col("l_orderkey") > hi).count(), "rows outside the range were lost")
    } finally graft.ops.Housekeeping.deleteRecursively(root)
  }
}
