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
    // Length cap = runaway-string guard, not a style rule. The longest
    // legitimate oracles are the unrolled 8-round hash-min CC chains
    // (graph_connected_components ~3.8k; graph_modularity_score extends the
    // same chain with the degree/edge rollups to ~4.1k).
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.exists(_ < ' '), s"$k oracle contains control characters")
      assert(sql.trim.nonEmpty && sql.length < 6000, s"$k oracle length suspicious")
    }
  }

  test("stage-token lifecycle: resolve substitutes every token, roots are sf-scoped") {
    import graft.ops.Stage
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      val resolved = Stage.resolve(sql, "/root/testdata/sf0.01")
      assert(!resolved.contains(Stage.token), s"$k oracle keeps unresolved stage token")
    }
    // distinct sfDirs must never share a staging root (the clobber guard)
    assert(Stage.root("/root/testdata/sf0.01") != Stage.root("/root/testdata/sf0.1"))
    // same sfDir through a non-canonical spelling maps to the same root
    assert(Stage.root("/root/testdata/sf0.01") == Stage.root("/root/testdata/../testdata/sf0.01"))
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
