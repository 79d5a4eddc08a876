package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew rehearsal at 10× (the DedupScaleSpec pattern applied to the
  * relational core): the 100 TB claim rests on AQE's skew-join split
  * actually firing when one key dominates a shuffle — prove it, don't
  * assume it.
  *
  * Fixture: a 10×-events fact stream where ONE user owns 50 % of all rows,
  * sort-merge-joined to a keyed dim (broadcast disabled — at real scale the
  * dim wouldn't fit). Without the skew split, the dominant key's entire
  * partition lands on one task. Asserted, self-calibrated against a control
  * run with the skew optimization disabled:
  *
  *  1. the executed (AQE-final) plan carries `skew=true` on the join;
  *  2. the max per-task shuffle read drops to a small fraction of the
  *     control's — per-task input stays bounded no matter how hot the key.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private final class MaxShuffleRead extends SparkListener {
    @volatile var maxBytes = 0L
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null && m.shuffleReadMetrics != null) {
        val b = m.shuffleReadMetrics.totalBytesRead
        byStage.merge(te.stageId, b, (a: Long, x: Long) => math.max(a, x))
        if (b > maxBytes) maxBytes = b
      }
    }
  }

  test("AQE splits the hot key's partition and bounds per-task shuffle input") {
    val conf = spark.conf
    val keys = Seq("spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.get(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // test-scale thresholds (defaults are 256 MB/64 MB — sized for real
      // clusters); the RATIO logic under test is scale-free
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // 10× the sf0.01 events volume; user 42 owns every even row = 50 %
      val n = graft.tables.Tables.events(spark, TestSpark.sf001).count() * 10
      // 32 map tasks: AQE's skew split regroups MAPPER outputs, so split
      // granularity is bounded below by per-mapper bytes — mirror the many
      // upstream tasks a real cluster shuffle has
      def facts = spark.range(0, n, 1, 32).select(
        when(col("id") % 2 === 0, lit(42L)).otherwise(col("id") % 1000).as("user_id"),
        col("id").as("event_id"),
        // widen rows so the hot partition's bytes trip the (lowered) threshold
        concat(lit("payload-"), col("id"), lit("-"), md5(col("id").cast("string"))).as("payload"))
      def dim = spark.range(1000).select(col("id").as("user_id"),
        concat(lit("segment_"), col("id") % 7).as("segment"))

      // 32 reduce partitions: the skew split's target size is bounded below
      // by the MEDIAN partition size, so the non-hot keys must spread thin
      // (exactly the cluster shape — hundreds of reducers, one hot key)
      def run(): (Long, String) = graft.ops.Housekeeping.withShufflePartitions(spark, 32) {
        val l = new MaxShuffleRead
        spark.sparkContext.addSparkListener(l)
        try {
          // the aggregate READS payload so column pruning cannot strip it
          // from the pre-join shuffle — the skewed bytes must actually move
          val joined = facts.join(dim, "user_id")
            .groupBy("segment")
            .agg(count(lit(1)).as("cnt"), sum(length(col("payload"))).as("bytes"))
          assert(joined.collect().map(_.getLong(1)).sum == n) // every row joined
          // listener bus is async — settle before reading the max
          var last = -1L
          while (l.maxBytes != last) { last = l.maxBytes; Thread.sleep(200) }
          info(s"per-stage max task shuffle read: ${l.byStage}")
          (l.maxBytes, joined.queryExecution.executedPlan.toString)
        } finally spark.sparkContext.removeSparkListener(l)
      }

      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val (maxControl, planControl) = run()
      assert(!planControl.contains("skew=true"))

      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // coalescePartitions stays OFF in both runs: at these test-scale byte
      // sizes the coalesce reader merges the skew sub-splits back into
      // near-advisory groups that re-concentrate the hot key (measured: max
      // task read 1.76 MB with coalesce on vs 123 KB off) — here we isolate
      // the skew rule under test
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val (maxSplit, planSplit) = run()
      assert(planSplit.contains("skew=true"),
        s"AQE skew-join split did not fire:\n$planSplit")
      assert(maxSplit * 2 <= maxControl,
        s"per-task shuffle read not bounded by the split: $maxSplit vs control $maxControl")
      info(s"max per-task shuffle read: control=$maxControl split=$maxSplit")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }
}
