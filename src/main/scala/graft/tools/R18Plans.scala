package graft.tools

import graft.SparkEntry
import graft.ops.{GraphOps, Housekeeping}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Round-18 optimization-evidence dump: `explain("formatted")` for the
  * queries this round touched, one file per key into plans/r18/.
  *
  *   R18_KEYS=k1,k2 R18_SUFFIX=after [R18_STEPS=1] \
  *     sbt "runMain graft.tools.R18Plans <sfDir> <outDir>"
  *
  * Full-query plans come straight from `SparkEntry.queries` — run once on
  * the pre-optimization tree (`R18_SUFFIX=before`, via `git stash`) and once
  * on the optimized tree (`after`). The iterative graph kernels hide their
  * per-round structure behind lineage barriers, so with R18_STEPS=1 the tool
  * additionally dumps the per-round CC/SSSP plans: `before` is the round-17
  * shape — the round body PLUS the SEPARATE full-table fixpoint aggregate
  * that ran as its own job every round — and `after` is the same round body
  * with the fixpoint riding the barrier job as a CollectMetrics (observe)
  * node. Both shapes are composed inline here from the shared step
  * functions, so the tool compiles identically on either tree.
  */
object R18Plans {

  private def fmt(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = Paths.get(args.lift(1).getOrElse("plans/r18"))
    Files.createDirectories(outDir)
    val suffix = sys.env.getOrElse("R18_SUFFIX", "after")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def putAs(name: String, sfx: String, text: String): Unit = {
      Files.write(outDir.resolve(s"${name}_$sfx.txt"), text.getBytes("UTF-8"))
      println(s"wrote ${name}_$sfx.txt")
      Housekeeping.releaseAll()
    }
    def put(name: String, text: String): Unit = putAs(name, suffix, text)

    sys.env.get("R18_KEYS").foreach { ks =>
      ks.split(",").map(_.trim).filter(_.nonEmpty).foreach { k =>
        try put(k, fmt(SparkEntry.queries(k)(spark, sfDir)))
        catch { case t: Throwable =>
          System.err.println(s"WARNING: $k plan dump failed: $t") }
      }
    }

    if (sys.env.get("R18_STEPS").contains("1")) {
      val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")

      // --- CC round: the round body is UNCHANGED this round; what changes
      // is the per-round JOB STRUCTURE (fixpoint sum: separate aggregate
      // job → observe/CollectMetrics riding the barrier job).
      val fe = graft.tables.Tables.lineitem(spark, sfDir)
        .select(col("l_partkey").as("src"),
          lead(col("l_partkey"), 1).over(w).as("dst"))
        .where(col("dst").isNotNull && col("src") =!= col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("cw"))
        .where(col("cw") >= 2).select(col("src"), col("dst"))
      val und = fe.union(fe.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().cache()
      val labels0 = Housekeeping.iterationBarrier(
        und.select(col("src").as("v")).distinct().withColumn("lbl", col("v")))
      val halfA = Housekeeping.iterationBarrier(GraphOps.ccHalfStep(und, labels0))
      val jump = GraphOps.ccJumpStep(halfA)
      if (suffix == "before")
        putAs("graph_cc_round_jobs", "before",
          "----- job 1 per round: jump step (materialized by the barrier) -----\n" +
            fmt(jump) +
            "\n----- job 2 per round: SEPARATE fixpoint aggregate over the " +
            "materialized labels -----\n" +
            fmt(Housekeeping.iterationBarrier(jump)
              .agg(sum(col("lbl").cast("decimal(38,0)")))) +
            "\n[provenance: round-17 loop body — ccLabels at git tag of commit " +
            "4e01bdc: barrier(jump) then labels.agg(sum(lbl)) as its own job]\n")
      else
        putAs("graph_cc_round_jobs", "after",
          "----- the ONLY job per round: jump step with the fixpoint sum " +
            "riding the barrier materialization (CollectMetrics) -----\n" +
            fmt(jump.observe(org.apache.spark.sql.Observation(),
              sum(col("lbl").cast("decimal(38,0)")).as("s"))))

      // --- SSSP round: same structure ---
      val we = graft.tables.Tables.lineitem(spark, sfDir)
        .select(col("l_partkey").as("src"),
          lead(col("l_partkey"), 1).over(w).as("dst"))
        .where(col("dst").isNotNull && col("src") =!= col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("cw"))
        .select(col("src"), col("dst"), (expr("1000 div cw") + lit(1L)).as("cost"))
        .cache()
      val dist0 = Housekeeping.iterationBarrier(
        we.select(col("src").as("node")).union(we.select(col("dst").as("node")))
          .distinct().where(col("node") % 97 === 0).withColumn("dist", lit(0L)))
      val step = GraphOps.spStep(we, dist0)
      if (suffix == "before")
        putAs("graph_sp_round_jobs", "before",
          "----- job 1 per round: relaxation step (materialized by the barrier) -----\n" +
            fmt(step) +
            "\n----- job 2 per round: SEPARATE fixpoint (count, sum) aggregate -----\n" +
            fmt(Housekeeping.iterationBarrier(step)
              .agg(count(lit(1)), sum(col("dist").cast("decimal(38,0)")))) +
            "\n[provenance: round-17 loop body — spDistances at commit 4e01bdc]\n")
      else
        putAs("graph_sp_round_jobs", "after",
          "----- the ONLY job per round: relaxation step with the fixpoint " +
            "(count, sum) riding the barrier materialization (CollectMetrics) -----\n" +
            fmt(step.observe(org.apache.spark.sql.Observation(),
              count(lit(1)).as("n"), sum(col("dist").cast("decimal(38,0)")).as("s"))))

      // --- PageRank step: cadence change only — the per-round plan must be
      // UNCHANGED before vs after (the A/B claim is fewer checkpoint jobs).
      val e0 = graft.tables.Tables.lineitem(spark, sfDir)
        .select(col("l_partkey").as("src"),
          lead(col("l_partkey"), 1).over(w).as("dst"))
        .where(col("dst").isNotNull && col("src") =!= col("dst"))
        .distinct()
      val e = e0.join(e0.groupBy(col("src")).agg(count(lit(1)).as("d")), "src").cache()
      val nodes = e.select(col("src").as("v")).union(e.select(col("dst"))).distinct().cache()
      val n = nodes.count()
      val teleport = (1000000000000L * 15L / 100L) / n
      val ranks0 = Housekeeping.iterationBarrier(
        nodes.withColumn("r", lit(1000000000000L / n)))
      val silent = nodes.join(e.select(col("dst").as("v")).distinct(), Seq("v"), "left_anti")
        .select(col("v"), lit(teleport).as("r")).cache()
      put("graph_pagerank_step",
        fmt(GraphOps.pagerankStep(e, silent, ranks0, teleport)))
    }
    spark.stop()
  }
}
