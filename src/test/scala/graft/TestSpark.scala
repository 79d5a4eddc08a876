package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite — mirrors the driver's
  * Verify config (UTC, local[4], shuffle.partitions=4). Deliberately NO
  * task retries (`local[4]` = maxFailures 1): a silent retry in the shared
  * session could mask genuinely flaky/nondeterministic behavior anywhere in
  * the suite. TaskRetrySpec, which needs a retry to rehearse, borrows an
  * exclusive maxFailures=2 session via [[retrySession]] — possible because
  * forked sbt tests run suites sequentially in one JVM, so swapping the
  * single SparkContext between suites is race-free. */
object TestSpark {
  private def build(master: String): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
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

  private var cached: SparkSession = _

  def spark: SparkSession = synchronized {
    if (cached == null || cached.sparkContext.isStopped) cached = build("local[4]")
    cached
  }

  /** Exclusive `local[4, 2]` (maxFailures=2) session for the retry
    * rehearsal: one JVM holds one SparkContext, so the shared session is
    * stopped first and the retry session is torn down afterward — the next
    * [[spark]] call rebuilds the retry-free shared session. */
  def retrySession[A](f: SparkSession => A): A = synchronized {
    if (cached != null && !cached.sparkContext.isStopped) cached.stop()
    cached = null
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = build("local[4, 2]")
    try f(s) finally {
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
  val sf01 = "/root/testdata/sf0.1"
}
