package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HierarchyOps
import graft.tables.Tables

/** [[HierarchyOps]]' structural claims:
  *
  *  1. CONVERGENCE WITH SLACK: the doubling closure is identical at
  *     Rounds−1 and Rounds on real data — the fixed-round op compares a
  *     CONVERGED closure (the GraphOps convergence-spec playbook).
  *  2. ROOT ROW ≡ TABLE TOTALS: the root's subtree is the whole customer
  *     population and all orders — the rollup conserves the measure.
  *  3. SQL-SURFACE TWIN: Spark's own recursive-CTE execution
  *     (`sql_recursive_cte`, UnionLoop) agrees with the DataFrame closure on
  *     the depth census — two engine-side formulations, one answer.
  */
class HierarchySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("doubling closure converges with >= 1 round of slack") {
    val a = HierarchyOps.closure(spark, TestSpark.sf001, HierarchyOps.Rounds - 1)
    val b = HierarchyOps.closure(spark, TestSpark.sf001, HierarchyOps.Rounds)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "closure still growing at Rounds-1 — fixed-round oracle would compare unconverged state")
  }

  test("root subtree equals whole-table totals; depths plausible") {
    val out = HierarchyOps.dimHierarchyRollup.fn(spark, TestSpark.sf001).collect()
    val byNode = out.map(r => r.getLong(0) -> r).toMap
    val root = byNode(0L)
    val nCust = Tables.customer(spark, TestSpark.sf001).count()
    val nOrd = Tables.orders(spark, TestSpark.sf001).count()
    assert(root.getAs[Long]("n_subtree") == nCust, "root subtree must cover every customer")
    assert(root.getAs[Long]("n_orders") == nOrd, "root rollup must cover every order")
    assert(root.getAs[Int]("depth") == 0)
    val maxDepth = out.map(_.getAs[Int]("depth")).max
    assert(maxDepth >= 3, s"tree too shallow to exercise recursion (depth $maxDepth)")
    // leaves dominate: every node's depth is its parent's + 1
    out.filter(_.getLong(0) > 0).foreach { r =>
      val parent = byNode(r.getLong(0) / 8)
      assert(r.getAs[Int]("depth") == parent.getAs[Int]("depth") + 1)
    }
  }

  test("spark recursive CTE census matches the DataFrame closure's census") {
    val sql = HierarchyOps.sqlRecursiveCte.fn(spark, TestSpark.sf001)
      .select(col("depth"), col("n_nodes")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cl = HierarchyOps.closure(spark, TestSpark.sf001, HierarchyOps.Rounds)
      .groupBy(col("des")).agg((count(lit(1)) - 1).cast("int").as("depth"))
      .groupBy("depth").agg(count(lit(1)).as("n_nodes"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sql == cl, s"UnionLoop census $sql != closure census $cl")
  }
}
