package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself (SURVEY §7.4#7 oracle-SQL hygiene +
  * map consistency) — cheap failures here would otherwise silently zero a
  * whole round's correctness on the driver side. */
class ContractSpec extends AnyFunSuite {

  test("every oracle key has a query implementation") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle entries without queries: ${o -- q}")
  }

  test("oracle SQL strings are single-line with no control characters") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.exists(_ < ' '), s"$k oracle contains control characters")
      assert(sql.trim.nonEmpty && sql.length < 4000, s"$k oracle length suspicious")
    }
  }

  test("query keys are unique and well-formed") {
    val keys = SparkEntry.queries.keys.toSeq
    assert(keys.size == keys.distinct.size)
    keys.foreach(k => assert(k.matches("[a-z0-9_]+"), s"bad key: $k"))
  }

  test("entry targets sf0.001 and the flagship") {
    // smoke bar: rows > 0 is the driver's check; here just assert it builds
    // a plan against the smoke directory without touching other sfs
    val spark = TestSpark.spark
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
