package graft

import graft.ops._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions (SURVEY §5.5): the optimizations we rely on for the
  * 100 TB story must actually appear in the physical plan — broadcast join
  * for dims, parquet filter pushdown, top-k without a global sort, two-phase
  * aggregation, and whole-stage codegen on the hot paths. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(op: Op): String = {
    val df = op.fn(spark, TestSpark.sf0001)
    df.collect() // force AQE to finalize the adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("join_broadcast_dim uses BroadcastHashJoin") {
    assert(plan(JoinOps.joinBroadcastDim).contains("BroadcastHashJoin"))
  }

  test("scan_parquet_project pushes the shipdate range into the parquet scan") {
    val p = plan(ScanFilterOps.scanParquetProject)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") && p.contains("LessThan(l_shipdate"), p)
    // column pruning: only the 4 projected columns reach the reader
    // (testdata timestamps surface as timestamp_ntz under the UTC session)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_shipdate:timestamp"), p)
  }

  test("topk_global compiles to TakeOrderedAndProject (no global sort)") {
    assert(plan(SortSetOps.topkGlobal).contains("TakeOrderedAndProject"))
  }

  test("agg_pricing_summary is a two-phase hash aggregate inside codegen") {
    val p = plan(AggOps.aggPricingSummary)
    assert(p.contains("partial_sum"), p)      // map-side combine before the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("*(1)"), p)             // whole-stage codegen stage markers
  }

  test("join_sortmerge_big honors the merge hint") {
    assert(plan(JoinOps.joinSortmergeBig).contains("SortMergeJoin"))
  }

  test("join_left_semi/anti plan as semi/anti joins, not inner+distinct") {
    assert(plan(JoinOps.joinLeftSemi).contains("LeftSemi"))
    assert(plan(JoinOps.joinLeftAnti).contains("LeftAnti"))
  }

  test("filter_multi_predicate reaches the scan as pushed filters") {
    val p = plan(ScanFilterOps.filterMultiPredicate)
    assert(p.contains("PushedFilters") && p.contains("In(l_returnflag, [A,R])"), p)
  }

  test("sim_search_knn_per_query broadcasts the query side") {
    assert(plan(LlmOps.simSearchKnnPerQuery).contains("Broadcast"))
  }
}
