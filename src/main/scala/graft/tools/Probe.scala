package graft.tools

/** Scratch stage-by-stage profiler used while tuning operators; not part of
  * the library surface. Run: sbt "runMain graft.tools.Probe". */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"TIMER $label ${(System.nanoTime() - t0) / 1e9}"); r
    }
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (parts <- Seq("32", "8", "4"); round <- 1 to 2) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      time(s"tumble parts=$parts r$round")(
        graft.ops.StreamingOps.streamTumblingWatermark.fn(spark, d).count())
      time(s"dedup parts=$parts r$round")(
        graft.ops.StreamingOps.streamDedup.fn(spark, d).count())
      graft.ops.Housekeeping.releaseAll()
    }
    spark.stop()
  }
}
