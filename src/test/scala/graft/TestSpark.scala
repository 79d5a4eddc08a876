package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite — mirrors the driver's
  * Verify config (UTC, local[4], shuffle.partitions=4). Master allows ONE
  * task retry (`local[4, 2]`, vs a cluster's default maxFailures=4) so
  * TaskRetrySpec can prove results are retry-deterministic — the same
  * fault-tolerance envelope the 100 TB claims assume. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4, 2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // plan toString truncates PushedFilters/ReadSchema at 100 chars by
      // default, which breaks plan-shape assertions
      .config("spark.sql.maxMetadataStringLength", "10000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
  val sf01 = "/root/testdata/sf0.1"
}
