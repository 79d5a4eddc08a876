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
    // Adversarial-sweep / A/B hook, same contract as Verify's (the driver
    // never sets it): semicolon-separated k=v runtime SQL confs. Malformed
    // tokens (no '=') are skipped with a warning instead of crashing the
    // bench, and whitespace around keys/values is trimmed.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").map(_.trim).filter(_.nonEmpty)
      .foreach { kv => kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => spark.conf.set(k.trim, v.trim)
        case _ => System.err.println(
          s"WARNING: SPARK_GRAFT_EXTRA_CONF token '$kv' is not k=v — skipped")
      }})
    // Local-iteration escape hatch: SPARK_GRAFT_ONLY=q1,q2 runs a subset
    // (substring match). The driver never sets it, so its runs see all keys.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = only match {
      case Some(pats) => SparkEntry.queries.filter { case (k, _) => pats.exists(k.contains) }
      case None => SparkEntry.queries
    }
    if (only.isDefined && selected.isEmpty)
      System.err.println(s"WARNING: SPARK_GRAFT_ONLY=${only.get.mkString(",")} matched no queries")
    // Untimed JVM/codegen warm-up against the bench sfDir itself: the first
    // Spark job in a cold JVM pays ~4-5 s of class loading + codegen compiler
    // start-up that belongs to the process, not to whichever query happens to
    // run first.
    try spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()
    catch { case t: Throwable => System.err.println(s"WARNING: warm-up failed: $t") }
    // Same for the Structured Streaming machinery, exercised through the SAME
    // paths the timed ops use — file source, watermark, windowed state-store
    // aggregate, memory sink, AvailableNow drain — on a tiny staged slice, so
    // the first timed streaming query doesn't absorb one-time class loading /
    // state-store provider init (~3-4 s once).
    try {
      import org.apache.spark.sql.functions._
      val warmDir = java.nio.file.Files.createTempDirectory("bench_warm_src")
      val ckpt = java.nio.file.Files.createTempDirectory("bench_warm_ckpt")
      spark.read.schema(graft.tables.Tables.rawEventsSchema)
        .parquet(s"$sfDir/events.parquet").limit(512)
        .write.mode("overwrite").parquet(warmDir.toString)
      graft.ops.Housekeeping.withShufflePartitions(spark, 8) {
        val q = spark.readStream.schema(graft.tables.Tables.rawEventsSchema)
          .parquet(warmDir.toString)
          .withColumn("ts", graft.tables.Tables.ntzColToTimestamp("ts"))
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour")).count()
          .writeStream.format("memory").queryName("bench_warmup")
          .outputMode("complete").option("checkpointLocation", ckpt.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      spark.catalog.dropTempView("bench_warmup")
      graft.ops.Housekeeping.deleteRecursively(ckpt)
      graft.ops.Housekeeping.deleteRecursively(warmDir)
    } catch { case t: Throwable => System.err.println(s"WARNING: streaming warm-up failed: $t") }
    // And the remaining streaming machinery the file-source drain does NOT
    // touch: MemoryStream (stream_late_data) and the flatMapGroupsWithState
    // state-store path (stream_stateful_counter) — each costs seconds of
    // class loading on first use.
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val in = MemoryStream[Int]
      val ckpt = java.nio.file.Files.createTempDirectory("bench_warm_ckpt2")
      in.addData(1, 2, 3)
      graft.ops.Housekeeping.withShufflePartitions(spark, 8) {
        val q = in.toDS().groupByKey(_ % 2)
          .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
            (k: Int, rows: Iterator[Int], state: org.apache.spark.sql.streaming.GroupState[Int]) =>
              val s0 = state.getOption.getOrElse(0) + rows.size
              state.update(s0)
              Iterator((k, s0))
          }
          .toDF("k", "n")
          .writeStream.format("memory").queryName("bench_warmup2")
          .outputMode("update").option("checkpointLocation", ckpt.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      spark.catalog.dropTempView("bench_warmup2")
      graft.ops.Housekeeping.deleteRecursively(ckpt)
    } catch { case t: Throwable => System.err.println(s"WARNING: state warm-up failed: $t") }
    // A failed query reports the documented -1 sentinel, NOT its
    // time-to-exception — otherwise a crash would masquerade as a fast
    // green number in the JSON.
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case t: Throwable => System.err.println(s"WARNING: query $name failed: $t"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      // Keep measurements independent: drop this query's caches/artifacts
      // before the next one runs (outside its timed span; disposal cost is
      // bookkeeping, not query work).
      graft.ops.Housekeeping.releaseAll()
      if (ok) dt else -1.0
    }
    // This box is a VM whose host CPUs are shared: identical code has been
    // observed to swing 3-10x between consecutive runs on individual queries
    // (host steal/contention, not plan cost) — round 3's driver run showed
    // phantom 3-5x "regressions" on UNCHANGED sub-second window queries.
    // Min-of-N full passes is the standard way to report compute cost under
    // external noise, and full INTERLEAVED passes (not per-query bursts)
    // spread any host-contention window across different queries each pass.
    // The reported per-query value is the MIN across passes; the MEDIAN is
    // emitted alongside it in BENCH_FULL.json so a noisy host shows up as a
    // min/median gap instead of masquerading as a plan change. A query that
    // failed in ANY pass reports the documented -1 sentinel.
    // WALL-CLOCK BUDGET GUARD (round 17; round-16's driver run hit rc=124
    // with 21 keys unmeasured): pass 1 measures EVERY key unconditionally —
    // a complete, reportable number no matter how slow the host window is —
    // and passes 2..N re-measure a key only while elapsed wall-clock is
    // under SPARK_GRAFT_BENCH_BUDGET (seconds; default 1800). The check is
    // per-KEY, so a slow host degrades to fewer noise-reduction passes
    // (overshoot bounded by one key's cost) instead of a killed JVM and an
    // empty BENCH json. Ragged inputs are fine: min/median run over the
    // passes that actually measured the key, and -1 is reserved for a
    // genuine failure in a RUN pass — an unrun pass is simply absent (the
    // per-key pass count is emitted so unmeasured-extra-passes is visible,
    // distinct from failure).
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt)
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "1800").toDouble
    val wall0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - wall0) / 1e9
    val meas = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    selected.foreach { case (name, fn) => meas(name) = Vector(timeOne(name, fn)) }
    var skippedRuns = 0
    (2 to passes).foreach { _ =>
      selected.foreach { case (name, fn) =>
        if (elapsedSec < budgetSec) meas(name) = meas(name) :+ timeOne(name, fn)
        else skippedRuns += 1
      }
    }
    if (skippedRuns > 0)
      System.err.println(s"WARNING: bench budget ($budgetSec s) exhausted after " +
        f"$elapsedSec%.0f s — $skippedRuns later-pass re-measurements skipped " +
        "(every key keeps its unconditional pass-1 measurement)")
    def minOf(vs: Seq[Double]): Double = if (vs.exists(_ < 0)) -1.0 else vs.min
    def medianOf(vs: Seq[Double]): Double =
      if (vs.exists(_ < 0)) -1.0 else vs.sorted.apply((vs.size - 1) / 2)
    val results = selected.map { case (name, _) => name -> minOf(meas(name)) }
    val medians = selected.map { case (name, _) => name -> medianOf(meas(name)) }
    val passCounts = selected.map { case (name, _) => name -> meas(name).size.toDouble }
    // One JSON line on stdout (schema unchanged round-over-round: per-query
    // MINs + total). Values rounded to ms and the total placed LAST so a
    // tail-truncated stdout capture (~2 KB kept from the end) still contains
    // the headline "metric"/"value" fields even when the head of the line is
    // cut. BENCH_FULL.json carries the same map PLUS per-query medians and
    // the pass count, so the complete picture survives stdout truncation.
    // Locale.ROOT: the f-interpolator honors the default JVM locale, and a
    // comma-decimal locale would print invalid JSON.
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jmap(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")
    // -1 failure sentinels stay visible per-query but don't distort the total
    val total = results.values.filter(_ >= 0).sum
    val line = s"""{"queries":${jmap(results)},"sf":"$sfDir","unit":"sec","metric":"total","value":${num(total)}}"""
    println(line)
    // Driver-parsable per-query mirror (round 18; round-17 verdict #2): the
    // driver's stdout capture keeps only a ~2 KB TAIL, and at 322 keys the
    // full line above is ~11 KB — its per-query head has been truncated away
    // for two rounds (PERF per_query empty). So AFTER the full line (schema
    // unchanged — additions only), re-emit the same map as numbered chunk
    // lines of ≤ ~1.5 KB each and close with a compact headline line, so
    // however much tail survives parses back into (part of) the map plus the
    // total. BENCH_FULL.json stays the canonical committed mirror.
    val chunkBudget = 1400
    val chunks = scala.collection.mutable.ArrayBuffer[Vector[(String, Double)]]()
    var cur = Vector.empty[(String, Double)]
    var curLen = 0
    results.foreach { case (k, v) =>
      val entryLen = k.length + num(v).length + 4
      if (cur.nonEmpty && curLen + entryLen > chunkBudget) {
        chunks += cur; cur = Vector.empty; curLen = 0
      }
      cur = cur :+ (k -> v); curLen += entryLen
    }
    if (cur.nonEmpty) chunks += cur
    chunks.zipWithIndex.foreach { case (c, i) =>
      println(s"""{"queries_part":${i + 1},"of":${chunks.size},"queries":${jmap(c)}}""")
    }
    println(s"""{"sf":"$sfDir","unit":"sec","metric":"total","value":${num(total)}}""")
    val full = s"""{"queries":${jmap(results)},"queries_median":${jmap(medians)},""" +
      s""""queries_passes":${jmap(passCounts)},"passes":$passes,""" +
      s""""budget_sec":${num(budgetSec)},"skipped_runs":$skippedRuns,""" +
      s""""sf":"$sfDir","unit":"sec","metric":"total","value":${num(total)}}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case t: Throwable => System.err.println(s"WARNING: BENCH_FULL.json write failed: $t") }
    spark.stop()
  }
}
