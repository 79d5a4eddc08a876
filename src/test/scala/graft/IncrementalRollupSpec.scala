package graft

import graft.ops.AggOps
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Split-invariance behind `agg_incremental_rollup`: because the partials
  * keep exact-decimal sums until the merge, re-aggregating (standing ∪
  * delta) must equal the full recompute EXACTLY no matter where history is
  * split — the property that makes the standing table trustworthy after any
  * number of increments. The op's oracle checks one split (newest day);
  * this spec checks several, including degenerate ones (empty standing,
  * empty delta). */
class IncrementalRollupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("merged rollup equals full recompute at every split point") {
    val e = Tables.events(spark, TestSpark.sf0001).withColumn("day", to_date(col("ts")))
    val full = e.groupBy("day")
      .agg(count(lit(1)).as("cnt"), sum(graft.ops.Dets.d2(col("value"))).cast("double").as("sum_value"))
      .orderBy("day")
      .collect().map(_.toString).toSeq

    val days = e.select("day").distinct().orderBy("day").collect().map(_.getDate(0))
    assert(days.length >= 3, "fixture needs several days")
    // first day (empty standing), a middle day, past the end (empty delta)
    val splits = Seq(days.head, days(days.length / 2),
      java.sql.Date.valueOf(days.last.toLocalDate.plusDays(1)))
    splits.foreach { split =>
      val merged = AggOps.rollupPartial(e, col("day") < lit(split))
        .unionAll(AggOps.rollupPartial(e, col("day") >= lit(split)))
        .groupBy("day")
        .agg(sum(col("cnt")).as("cnt"), sum(col("sv")).cast("double").as("sum_value"))
        .orderBy("day")
        .collect().map(_.toString).toSeq
      assert(merged == full, s"merge at split=$split diverged from the full recompute")
    }
  }
}
