package graft

import graft.ops.StreamingOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** stream_backfill_hybrid (ops/StreamingOps.scala): the batch/stream handoff
  * seam loses and duplicates nothing, and both halves genuinely contribute. */
class StreamBackfillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hybrid union equals the pure batch rollup; both halves non-empty") {
    val hybrid = StreamingOps.streamBackfillHybrid.fn(spark, TestSpark.sf0001)
      .collect().map(_.toSeq).toSeq
    val batch = graft.tables.Tables.events(spark, TestSpark.sf0001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"), graft.ops.Dets.dsum(col("value")).as("sum_value"))
      .orderBy("day").collect().map(_.toSeq).toSeq
    assert(hybrid == batch)
    // the split is the midpoint of a 30-day span — both sides must own days
    val days = hybrid.map(_.head.toString)
    assert(days.size >= 2, "need at least two days for a meaningful handoff")
    // duplicate seam day would show as a duplicate key
    assert(days.distinct.size == days.size, "handoff duplicated a day")
  }
}
