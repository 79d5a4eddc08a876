package graft.tools

/** Scratch stage-by-stage profiler used while tuning operators; not part of
  * the library surface. Run: sbt "runMain graft.tools.Probe".
  *
  * Round-18 shape: smoke + time the keys this round touches. PROBE_KEYS
  * selects SparkEntry keys (comma list); PROBE_ROUNDS repeats the sweep
  * (default 2, min-of-N under host noise). Also prints the observe-based
  * early-exit round counts for the CC/SSSP kernels (the round-18 fold of the
  * fixpoint aggregate into the barrier job) so a hang or a never-firing exit
  * is visible immediately.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"TIMER $label ${(System.nanoTime() - t0) / 1e9}"); r
    }
    try { spark.read.parquet(s"$d/lineitem.parquet").groupBy("l_returnflag").count().count(); () }
    catch { case _: Throwable => () }
    if (sys.env.get("PROBE_KERNELS").forall(_ == "1")) {
      val (cc, ccR) = graft.ops.GraphOps.ccLabelsRounds(spark, d, graft.ops.GraphOps.CcRounds)
      println(s"CC_ROUNDS_USED=$ccR ROWS=${cc.count()}")
      val (sp, spR) = graft.ops.GraphOps.spDistancesRounds(spark, d, graft.ops.GraphOps.SpRounds)
      println(s"SP_ROUNDS_USED=$spR ROWS=${sp.count()}")
      graft.ops.Housekeeping.releaseAll()
    }
    val keys = sys.env.getOrElse("PROBE_KEYS", "").split(",").map(_.trim).filter(_.nonEmpty)
    val rounds = sys.env.getOrElse("PROBE_ROUNDS", "2").toInt
    for (r <- 1 to rounds; k <- keys) {
      time(s"$k r$r")(graft.SparkEntry.queries(k)(spark, d).count())
      graft.ops.Housekeeping.releaseAll()
    }
    spark.stop()
  }
}
