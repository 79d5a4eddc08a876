package graft

import graft.ops.{SkewOps, Dets}
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The explicit skew-mitigation family is result-transparent and actually
  * spreads hot keys:
  *
  *  - `join_skew_salted` ≡ the naive unsalted join, its physical join keys
  *    include the salt, and it runs on the shuffle path (no broadcast —
  *    a broadcast would sidestep the skew it exists to handle).
  *  - the hot key's rows really do land in ALL salt slices (the point of
  *    salting: reducer input per key drops SALTS×).
  *  - `agg_distinct_salted` ≡ direct COUNT(DISTINCT): the salt partitions
  *    each group's distinct set into disjoint slices, so summed partials
  *    are exact.
  */
class SkewOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join equals the unsalted join and keeps salt in the shuffle join keys") {
    val salted = SkewOps.joinSkewSalted.fn(spark, TestSpark.sf001)

    val plan = salted.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      "salted join must take the shuffle path, not broadcast:\n" + plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      "expected a shuffled join:\n" + plan)
    // the salt must appear in the JOIN NODE's key list, not merely somewhere
    // in the plan string (a project list would also contain the column name)
    assert("""(SortMergeJoin|ShuffledHashJoin)[^\[]*\[[^\]]*salt[^\]]*\]""".r
        .findFirstIn(plan).isDefined,
      "join keys must include the salt:\n" + plan)

    val e = Tables.events(spark, TestSpark.sf001)
    val c = Tables.customer(spark, TestSpark.sf001)
    val naive = e.join(c, e("user_id") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), Dets.dsum(col("value")).as("sum_value"))
      .orderBy("c_mktsegment")
    assert(salted.collect().toSeq == naive.collect().toSeq,
      "salting must not change the join result")
  }

  test("every key's rows spread across all salt slices") {
    val salts = 8
    val spread = Tables.events(spark, TestSpark.sf001)
      .withColumn("salt", pmod(col("event_id"), lit(salts)).cast("int"))
      .groupBy("user_id").agg(countDistinct(col("salt")).as("slices"),
        count(lit(1)).as(("rows")))
      .filter(col("rows") >= salts * 4) // enough rows that all slices must fill
      .agg(min(col("slices"))).first().getLong(0)
    assert(spread == salts.toLong,
      s"hot keys must occupy all $salts salt slices, min occupied = $spread")
  }

  test("two-phase distinct is invariant across salt fan-outs (1, 3, 16, 64)") {
    val e = Tables.events(spark, TestSpark.sf001)
    val direct = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("uniq_users"), count(lit(1)).as("cnt"))
      .orderBy("event_type").collect().toSeq
    for (salts <- Seq(1, 3, 16, 64)) {
      val got = e.withColumn("salt", pmod(col("user_id"), lit(salts)).cast("int"))
        .groupBy(col("event_type"), col("salt"))
        .agg(countDistinct(col("user_id")).as("part_uniq"), count(lit(1)).as("part_cnt"))
        .groupBy(col("event_type"))
        .agg(sum(col("part_uniq")).as("uniq_users"), sum(col("part_cnt")).as("cnt"))
        .orderBy("event_type").collect().toSeq
      assert(got == direct, s"salts=$salts must not change the result")
    }
  }

  test("salted two-phase distinct equals direct COUNT(DISTINCT)") {
    val salted = SkewOps.aggDistinctSalted.fn(spark, TestSpark.sf001)
    val direct = Tables.events(spark, TestSpark.sf001)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("uniq_users"), count(lit(1)).as("cnt"))
      .orderBy("event_type")
    assert(salted.collect().toSeq == direct.collect().toSeq,
      "salting must not change the distinct counts")
  }
}
