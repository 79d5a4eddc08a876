package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SourceSinkOps, Stage}

/** [[graft.sources.GraftLakeCatalog]]'s contract beyond the oracle:
  * the catalog surface (SHOW TABLES), scan quality on time-traveled reads
  * (pushdown must survive the version indirection — the point of delegating
  * to the builtin parquet DSv2 table), loud failure on unknown versions,
  * and the read-only stance. */
class GraftLakeCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("catalog: listing, versioned-read pushdown, unknown version, read-only") {
    // build the two-version table and register the sf-scoped catalog
    assert(SourceSinkOps.sqlCatalogTimeTravel.fn(spark, TestSpark.sf0001).collect().length == 3)
    val cat = s"graft_lake_${Stage.root(TestSpark.sf0001).split('/').last}"

    val tables = spark.sql(s"SHOW TABLES IN $cat").collect().map(_.getString(1))
    assert(tables.contains("customers_tt"), tables.mkString(","))

    // a time-traveled scan is still a first-class parquet scan: the
    // predicate reaches the reader as a pushed filter
    val df = spark.sql(
      s"SELECT c_custkey FROM $cat.customers_tt VERSION AS OF 1 WHERE c_custkey = 42")
    assert(df.collect().length == 1)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("EqualTo(c_custkey,42)"),
      s"no pushdown on the versioned read:\n$p")

    // v1 (full) vs v2 (post-delete) row counts differ and are both readable
    val n1 = spark.sql(s"SELECT COUNT(*) FROM $cat.customers_tt VERSION AS OF 1")
      .first().getLong(0)
    val n2 = spark.sql(s"SELECT COUNT(*) FROM $cat.customers_tt VERSION AS OF 2")
      .first().getLong(0)
    assert(n1 > n2 && n2 > 0)

    intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.customers_tt VERSION AS OF 99").collect())
    intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.no_such_table").collect())
    val e = intercept[Exception](spark.sql(s"DROP TABLE $cat.customers_tt"))
    assert(e.getMessage.toLowerCase.contains("read-only") ||
      e.getCause != null && e.getCause.getMessage.toLowerCase.contains("read-only"),
      s"unexpected mutation failure: ${e.getMessage}")
  }

  test("catalog: namespaces are rejected — the warehouse is flat") {
    assert(SourceSinkOps.sqlCatalogTimeTravel.fn(spark, TestSpark.sf0001).collect().length == 3)
    val cat = s"graft_lake_${Stage.root(TestSpark.sf0001).split('/').last}"
    // a bogus namespace must NOT silently resolve to the flat table dir
    intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.bogus_ns.customers_tt").collect())
    // SHOW TABLES IN an unknown namespace must fail, not list everything
    intercept[Exception](
      spark.sql(s"SHOW TABLES IN $cat.bogus_ns").collect())
  }
}
