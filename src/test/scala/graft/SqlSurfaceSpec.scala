package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SqlSurfaceOps

/** The load-bearing claim of [[SqlSurfaceOps]]: SQL-bodied functions are
  * PLAN-TRANSPARENT — they inline and optimize like hand-written SQL,
  * unlike JVM-closure UDFs which stay opaque call sites. */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("SQL scalar UDF inlines — no UDF call survives optimization") {
    val df = SqlSurfaceOps.sqlUdfScalarInline.fn(spark, TestSpark.sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF") && !p.contains("graft_net_revenue"),
      s"SQL UDF did not inline:\n$p")
    // ... and the inlined exact-decimal arithmetic still combines map-side
    assert(p.contains("partial_sum"), p)
  }

  test("SQL table function inlines — the per-call predicate reaches the parquet scan") {
    val df = SqlSurfaceOps.sqlTableFunction.fn(spark, TestSpark.sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("EqualTo(c_mktsegment,AUTOMOBILE)"),
      s"table-function argument predicate not pushed to the scan:\n$p")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
  }
}
