package graft

import graft.functions.GraftFunctions
import graft.ops.{Dets, JoinOps}
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `join_bloom_prefilter` contract:
  *
  *  - result ≡ the plain filtered join (Bloom has no false negatives; the
  *    exact join removes false positives);
  *  - the probe runs codegen'd in the FACT SCAN stage — in the plan tree the
  *    bloom Filter sits between the orders FileScan and its Exchange, with
  *    no shuffle below it, and carries the whole-stage-codegen `*(n)` mark;
  *  - it actually prunes: prefiltered fact rows ≤ ~selectivity + fpp, far
  *    below the full table.
  */
class BloomPrefilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bloom-prefiltered join equals the plain filtered join") {
    val got = JoinOps.joinBloomPrefilter.fn(spark, TestSpark.sf001)
    val c = Tables.customer(spark, TestSpark.sf001).filter(col("c_acctbal") > 9000)
    val o = Tables.orders(spark, TestSpark.sf001)
    val naive = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), Dets.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority")
    assert(got.collect().toSeq == naive.collect().toSeq)
  }

  test("the probe sits codegen'd below the exchange and prunes the fact side") {
    val df = JoinOps.joinBloomPrefilter.fn(spark, TestSpark.sf001)
    df.collect() // finalize the adaptive plan
    val lines = df.queryExecution.executedPlan.toString.linesIterator.toIndexedSeq
    val bloomIdx = lines.indexWhere(_.contains("graft_bloom_might_contain"))
    assert(bloomIdx >= 0, "plan must contain the bloom probe:\n" + lines.mkString("\n"))
    assert(lines(bloomIdx).contains("*("),
      "bloom probe must be inside WholeStageCodegen: " + lines(bloomIdx))
    // plans print parent-before-child: between the probe Filter and its
    // FileScan child there must be no shuffle — the probe is scan-stage.
    val scanIdx = lines.indexWhere(_.contains("FileScan"), bloomIdx)
    assert(scanIdx > bloomIdx, "probe must sit above a FileScan")
    assert(!lines.slice(bloomIdx + 1, scanIdx).exists(_.contains("Exchange")),
      "no shuffle between the bloom probe and the fact scan:\n" + lines.mkString("\n"))

    // pruning power: ~10% of dim keys survive the acctbal gate, so with a
    // 1% fpp the prefilter must keep well under half the fact rows.
    GraftFunctions.register(spark)
    val c = Tables.customer(spark, TestSpark.sf001).filter(col("c_acctbal") > 9000)
    val bf = c.stat.bloomFilter("c_custkey", 200000, 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray
    }
    val o = Tables.orders(spark, TestSpark.sf001)
    val kept = o.filter(GraftFunctions.bloomMightContain(col("o_custkey"), bytes)).count()
    assert(kept < o.count() / 2,
      s"bloom prefilter must prune the fact side, kept $kept")
  }
}
