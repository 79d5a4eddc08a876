package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.JoinOps
import graft.plans.{AsofJoinExec, BroadcastAsofJoinExec, BroadcastRangeJoinExec, RangeJoinExec}

/** Contract for the SQL table-valued-function surface of the native joins
  * ([[graft.plans.SqlTableFunctions]], round-13 verdict #4):
  *
  *   1. NATIVE EXEC FROM PURE SQL — `graft_asof_join` / `graft_band_join`
  *      SQL text plans through the graft physical operators (shuffled or
  *      broadcast variant — the strategy makes the JoinSelection-style
  *      size call), never a window rewrite or a join fallback.
  *   2. RESULT EQUALITY — each TVF query equals its DataFrame-API sibling
  *      (`join_asof_native` / `join_range_native`) row for row: the SQL and
  *      DataFrame spellings are one code path from the logical node down.
  *   3. ARGUMENT ERRORS are loud: non-literal / wrong-arity calls raise,
  *      not silently misplan.
  */
class SqlNativeJoinSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("graft_asof_join SQL plans through the native as-of exec and equals " +
    "the DataFrame spelling") {
    val sql = JoinOps.sqlAsofNative.fn(spark, d)
    val plan = sql.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case e: AsofJoinExec => e
      case e: BroadcastAsofJoinExec => e
    }.nonEmpty, s"native as-of exec missing from the SQL plan:\n$plan")
    val df = JoinOps.joinAsofNative.fn(spark, d)
    assert(sql.collect().map(_.toSeq).toSeq == df.collect().map(_.toSeq).toSeq)
  }

  test("graft_band_join SQL plans through the native band exec and equals " +
    "the DataFrame spelling") {
    val sql = JoinOps.sqlBandNative.fn(spark, d)
    val plan = sql.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case e: RangeJoinExec => e
      case e: BroadcastRangeJoinExec => e
    }.nonEmpty, s"native band exec missing from the SQL plan:\n$plan")
    val df = JoinOps.joinRangeNative.fn(spark, d)
    assert(sql.collect().map(_.toSeq).toSeq == df.collect().map(_.toSeq).toSeq)
  }

  test("TVF argument validation is loud") {
    graft.plans.SqlTableFunctions.ensureRegistered(spark)
    // arity
    val e1 = intercept[Exception](
      spark.sql("SELECT * FROM graft_asof_join('a', 'b', 'c')").collect())
    assert(e1.getMessage.contains("graft_asof_join"))
    // non-literal band bounds
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM graft_band_join('a','b','c','d','e','f','x','y')").collect())
    assert(e2.getMessage.contains("graft_band_join"))
    // empty band
    val e3 = intercept[Exception](
      spark.sql("SELECT * FROM graft_band_join('a','b','c','d','e','f',10,0)").collect())
    assert(e3.getMessage.contains("empty band"))
  }
}
