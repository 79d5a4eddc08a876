package graft

import graft.ops.SourceSinkOps
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed layout must actually remove the join shuffle. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed fact-fact join has no exchange on the join keys") {
    val df = SourceSinkOps.sinkBucketedJoin.fn(spark, TestSpark.sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("Bucketed: true"), p)
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
           !p.contains("Exchange hashpartitioning(o_orderkey"), p)
  }

  test("GraftSession.local provides the custom functions") {
    val s = GraftSession.local(4)
    assert(s.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0) == 11.0)
  }
}
