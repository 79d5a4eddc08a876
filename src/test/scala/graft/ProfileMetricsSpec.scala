package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PlanSurfaceOps
import graft.tables.Tables

/** `plan_profile_metrics` contract: every cardinality the profile reads off
  * the executed plan's SQLMetrics must equal the same count computed
  * independently by a fresh query — the metrics plumbing reports TRUE
  * per-operator row counts, not approximations or per-partition residue.
  * Runs under the shared session (AQE on), so the plan walk is proven
  * against query-staged plans, not just the simple no-AQE shape.
  */
class ProfileMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("profile stage counts equal independently recomputed cardinalities") {
    val prof = PlanSurfaceOps.planProfileMetrics.fn(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val li = Tables.lineitem(spark, sf).where(col("l_quantity") < 10)
    val j1 = li.join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
    val j2 = j1.join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))

    assert(prof("input_lineitem") == li.count())
    assert(prof("input_orders") == Tables.orders(spark, sf).count())
    assert(prof("input_customer") == Tables.customer(spark, sf).count())
    assert(prof("join_orders") == j1.count())
    assert(prof("join_customer") == j2.count())
    assert(prof("agg_groups") == j2.select("c_mktsegment").distinct().count())
    assert(prof.size == 6)
  }

  test("profile is reproducible across runs (no accumulated metric residue)") {
    val a = PlanSurfaceOps.planProfileMetrics.fn(spark, sf).collect().toSeq
    val b = PlanSurfaceOps.planProfileMetrics.fn(spark, sf).collect().toSeq
    assert(a == b, "second profile run diverged — metrics leaked across runs")
  }

  test("memory/spill metrics are readable off the same executed plan " +
    "(the non-hashable half of EXPLAIN ANALYZE)") {
    // spill bytes and peak memory are host-dependent, so they stay OUT of
    // the hashed profile — but the plumbing the op walks must expose them;
    // this pins that a memory profile is one metrics-map read away.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val q = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(org.apache.spark.sql.functions.count("*").as("n"))
    q.collect()
    def expand(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case qs: QueryStageExec => Seq(qs.plan)
        case _ => p.children
      }
      p +: inner.flatMap(expand)
    }
    val metricNames = expand(q.queryExecution.executedPlan).flatMap(_.metrics.keys).toSet
    assert(metricNames.exists(n => n.toLowerCase.contains("spill") ||
      n.toLowerCase.contains("peak")),
      s"no spill/peak-memory metric exposed; saw: ${metricNames.mkString(", ")}")
    // every accumulated value is non-negative (a sane read, not garbage)
    val vals = expand(q.queryExecution.executedPlan)
      .flatMap(_.metrics.values.map(_.value))
    assert(vals.forall(_ >= -1), s"negative metric value in: $vals")
  }
}
