package graft

import graft.ops._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions (SURVEY §5.5): the optimizations we rely on for the
  * 100 TB story must actually appear in the physical plan — broadcast join
  * for dims, parquet filter pushdown, top-k without a global sort, two-phase
  * aggregation, and whole-stage codegen on the hot paths. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(op: Op): String = {
    val df = op.fn(spark, TestSpark.sf0001)
    df.collect() // force AQE to finalize the adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("join_broadcast_dim uses BroadcastHashJoin") {
    assert(plan(JoinOps.joinBroadcastDim).contains("BroadcastHashJoin"))
  }

  test("scan_parquet_project pushes the shipdate range into the parquet scan") {
    val p = plan(ScanFilterOps.scanParquetProject)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") && p.contains("LessThan(l_shipdate"), p)
    // column pruning: only the 4 projected columns reach the reader
    // (testdata timestamps surface as timestamp_ntz under the UTC session)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_shipdate:timestamp"), p)
  }

  test("topk_global compiles to TakeOrderedAndProject (no global sort)") {
    assert(plan(SortSetOps.topkGlobal).contains("TakeOrderedAndProject"))
  }

  test("agg_pricing_summary is a two-phase hash aggregate inside codegen") {
    val p = plan(AggOps.aggPricingSummary)
    assert(p.contains("partial_sum"), p)      // map-side combine before the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("*(1)"), p)             // whole-stage codegen stage markers
  }

  test("join_sortmerge_big honors the merge hint") {
    assert(plan(JoinOps.joinSortmergeBig).contains("SortMergeJoin"))
  }

  test("join_left_semi/anti plan as semi/anti joins, not inner+distinct") {
    assert(plan(JoinOps.joinLeftSemi).contains("LeftSemi"))
    assert(plan(JoinOps.joinLeftAnti).contains("LeftAnti"))
  }

  test("filter_multi_predicate reaches the scan as pushed filters") {
    val p = plan(ScanFilterOps.filterMultiPredicate)
    assert(p.contains("PushedFilters") && p.contains("In(l_returnflag, [A,R])"), p)
  }

  test("sim_search_knn_per_query broadcasts the query side") {
    assert(plan(LlmOps.simSearchKnnPerQuery).contains("Broadcast"))
  }

  test("site_circuit_rollup broadcasts the circuit dimension onto the fact stream") {
    val p = plan(TimeSeriesOps.siteCircuitRollup)
    assert(p.contains("BroadcastHashJoin"), p)
    // the fact side must NOT be exchanged before the join — only the
    // (site, day) aggregate may shuffle
    assert(!p.contains("Exchange hashpartitioning(user_id"), p)
  }

  test("exact pair ops shard as equi-joins, never a corpus nested loop") {
    // blockedAllPairs replaced the `vec_id_a < vec_id_b` non-equi join: the
    // pair space must come from the block-matrix EQUI-join (shuffle-sharded,
    // uniform keys), with nested-loop/cartesian plans gone entirely. The tiny
    // block-pair table may broadcast — what must not appear is a nested loop
    // or cartesian over the corpus itself.
    for (op <- Seq(LlmOps.dedupEmbeddingCosine, LlmOps.simSearchTopk)) {
      val p = plan(op)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"${op.key} plans a nested loop:\n$p")
      assert(!p.contains("CartesianProduct"), s"${op.key} plans a cartesian product:\n$p")
    }
  }

  test("sim_search_ann_probe probes the persisted index without retraining") {
    // the op itself now stages its candidate set for the DuckDB re-rank
    // oracle and ranks the read-back rows, so the probe stage's plan is
    // asserted on the probe frame directly (the stage whose shape matters)
    val probeDf = LlmOps.ivfProbe(spark, TestSpark.sf0001,
      LlmOps.ivfIndexPath(spark, TestSpark.sf0001))
    probeDf.collect() // force AQE to finalize the adaptive plan
    val p = probeDf.queryExecution.executedPlan.toString
    // no k-means stages: training's argmax aggregate shuffles on neighbor_id
    // (and its centroid means on (cell, pos)) — neither may appear in a probe
    assert(!p.contains("Exchange hashpartitioning(neighbor_id"),
      s"probe plan retrains (argmax shuffle present):\n$p")
    assert(!p.contains("Exchange hashpartitioning(cell"),
      s"probe plan retrains (centroid-mean shuffle present):\n$p")
    // corpus side is a pruned scan of the persisted cells/ layout: the probed
    // cell ids arrive as a static partition filter
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"probe scan is not partition-pruned on cell:\n$p")
    // and the probe table broadcasts onto it — no exchange on the index side
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("dedup_incremental_minhash candidates come from a band equi-join, no pair space") {
    val p = plan(LlmOps.dedupIncrementalMinhash)
    // the delta probes the corpus band index via the (band, bh) bucket
    // equi-join — a nested loop or cartesian would mean the all-pairs space
    // the incremental contract exists to avoid
    assert(!p.contains("BroadcastNestedLoopJoin"), s"incremental probe plans a nested loop:\n$p")
    assert(!p.contains("CartesianProduct"), s"incremental probe plans a cartesian product:\n$p")
  }

  /** Runtime Bloom-filter join pruning — the row-level runtime filter that
    * complements AQE skew handling on selective fact-fact joins: Spark
    * builds a Bloom filter over the filtered build side's join keys and
    * applies might_contain inside the probe side's scan stage, cutting
    * shuffle volume BEFORE the join. The feature is on by default but gated
    * on a 10 GB application-side scan — i.e. it activates at warehouse scale
    * without tuning and is invisible at toy scale; the gate is scaled to the
    * testbed here to assert the mechanism itself. */
  test("runtime bloom filter prunes the probe side of a selective fact-fact join") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> scala.util.Try(spark.conf.get(k)).toOption }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"${TestSpark.sf001}/lineitem.parquet")
      val o = spark.read.parquet(s"${TestSpark.sf001}/orders.parquet")
        .where(col("o_orderpriority") === "1-URGENT")
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"), s"no runtime bloom filter in plan:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("pipeline sample/split are shuffle-free single scans") {
    assert(!plan(PipelineOps.sampleStratified).contains("Exchange hashpartitioning"),
      "sampling must not shuffle")
    assert(!plan(PipelineOps.splitTrainValTest).contains("Exchange hashpartitioning"),
      "splitting must not shuffle")
    assert(!plan(PipelineOps.sampleWeightedHash).contains("Exchange hashpartitioning"),
      "weighted sampling must not shuffle")
  }

  test("stats_corr_exact aggregates map-side before the group exchange") {
    val p = plan(StatsOps.statsCorrExact)
    assert(p.contains("partial_sum"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("embed_gram_exact self-joins co-partitioned on vec_id, then combines map-side") {
    val p = plan(PipelineOps.embedGramExact)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("partial_sum"), p) // Gram cells combine before the d² exchange
  }

  test("sample_reservoir_group pushes the rank limit below the shuffle (partial WindowGroupLimit)") {
    val p = plan(PipelineOps.sampleReservoirGroup)
    // map-side k-row heap BEFORE the exchange, final prune after — each task
    // ships at most k rows per group instead of its whole partition
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), p)
    assert(p.contains("Final"), p)
  }

  test("window_topk_per_group pushes its rank filter into WindowGroupLimit " +
    "(per-task top-k heap, not a full partition sort-and-filter)") {
    val p = plan(WindowOps.windowTopkPerGroup)
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), p)
    assert(p.contains("Final"), p)
  }

  test("dq_drift_chi2 broadcasts the 9-row decile-edge table for binning") {
    val p = plan(DqOps.dqDriftChi2)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("analytics_market_basket reuses the baskets exchange across the " +
    "self-join sides (the distinct is computed once)") {
    val p = plan(AnalyticsOps.analyticsMarketBasket)
    assert(p.contains("ReusedExchange"), p)
  }

  test("dq referential-integrity rule plans as a broadcast left-anti join, not a per-row probe") {
    val p = plan(DqOps.dqExpectations)
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  /** AQE skew-join splitting — the runtime answer to skewed fact-fact joins
    * claimed in SCALE.md. Synthesize a join where one key owns ~100× the
    * median partition volume and assert AQE marks the sort-merge join as
    * skew-handled (`isSkew=true` on the join node) while producing the exact
    * expected row count. */
  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val prev = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    // make the skew detectable at toy scale: tiny thresholds, no broadcast
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // key 0 carries 200k fact rows; keys 1-400 carry 100 each
      val fact = spark.range(0, 200000).select(lit(0L).as("k"), col("id").as("v"))
        .union(spark.range(0, 40000).select((col("id") % 400 + 1).as("k"), col("id").as("v")))
      val dim = spark.range(0, 401).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = fact.join(dim.hint("merge"), "k")
      // collect() (not count()) so THIS DataFrame's QueryExecution is the one
      // AQE finalizes — count() would execute a separate plan tree
      assert(joined.collect().length == 240000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isSkew=true") || p.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$p")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("scan_agg_pushdown answers COUNT/MIN/MAX from parquet footers (PushedAggregation)") {
    // same conf window the op itself runs in — one shared definition
    PlanSurfaceOps.withParquetAggPushdown(spark) {
      val df = PlanSurfaceOps.aggScan(spark, TestSpark.sf0001)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation: [COUNT(*)") ||
        p.contains("PushedAggregation: [Count"),
        s"aggregates did not reach the parquet scan:\n$p")
      assert(p.toLowerCase.contains("min(l_orderkey)"), p)
    }
  }

  test("join_shuffle_hash_hint lands a ShuffledHashJoin (broadcast demotion pinned off)") {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "-1"))
    try {
      val p = plan(PlanSurfaceOps.joinShuffleHashHint)
      assert(p.contains("ShuffledHashJoin"), s"hint did not land:\n$p")
      assert(!p.contains("SortMergeJoin"), s"sort-merge fallback despite hint:\n$p")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("embed_random_projection broadcasts the sign matrix (no shuffle on the wide side)") {
    val p = plan(PipelineOps.embedRandomProjection)
    assert(p.contains("BroadcastHashJoin"), s"sign matrix not broadcast:\n$p")
  }

  test("sample_temperature broadcasts both the totals and the per-source quotas") {
    val p = plan(PipelineOps.sampleTemperature)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, s"quota join not broadcast:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"totals not broadcast:\n$p")
  }

  test("stats_chi2_independence broadcasts the marginals onto the cell grid") {
    val p = plan(StatsOps.statsChi2Independence)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"marginals not broadcast:\n$p")
  }

  test("analytics_attribution_linear joins clicks to purchases exactly once " +
    "and the purchase-count window adds no extra pass over raw events") {
    val p = plan(AnalyticsOps.analyticsAttributionLinear)
    // one join of the two event slices (either hash strategy is fine at
    // this size); the n_clicks count must be a Window over the join output
    assert(p.contains("Join") || p.contains("join"), p)
    assert(p.contains("Window"), s"per-purchase count is not a window:\n$p")
  }

  test("text_gopher_quality is scan-local: no exchange before the " +
    "presentation sort") {
    // AQE's toString repeats the plan under "== Initial Plan ==" — count
    // exchanges in the FINAL section only
    val p = plan(TextOps.textGopherQuality).split("== Initial Plan ==").head
    // exactly one exchange: the range partitioning for the final orderBy
    assert("Exchange rangepartitioning".r.findAllIn(p).size == 1 &&
      "Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      s"unexpected shuffle in a scan-local op:\n$p")
  }

  test("plan_reuse_exchange materializes the daily aggregate once (exchange reuse)") {
    val p = plan(PlanSurfaceOps.planReuseExchange)
    // non-AQE prints ReusedExchange; AQE stage reuse re-prints the SAME
    // ShuffleQueryStage id under both consumers
    val stageIds = "ShuffleQueryStage (\\d+)".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(p.contains("ReusedExchange") ||
      stageIds.distinct.size < stageIds.size,
      s"no exchange reuse in:\n$p")
  }

  // ------------------------------------------------- round-11 wave shapes

  test("text_vocab_coverage broadcasts the dictionary onto the token stream") {
    val p = plan(TextOps.textVocabCoverage)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftOuter"), p)
  }

  test("analytics_ab_lift has zero joins and two-phase aggregates") {
    val p = plan(AnalyticsOps.analyticsAbLift).split("== Initial Plan ==").head
    assert(!p.contains("Join"), s"unexpected join in a join-free op:\n$p")
    assert(p.contains("partial_"), p) // map-side combine on the user rollup
  }

  test("ts_week_over_week reuses the daily-rollup exchange across both " +
    "self-join branches") {
    val p = plan(TimeSeriesOps.tsWeekOverWeek)
    val stageIds = "ShuffleQueryStage (\\d+)".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(p.contains("ReusedExchange") || stageIds.distinct.size < stageIds.size,
      s"no exchange reuse in:\n$p")
  }

  test("dq_freshness_lag broadcasts the 1-row global max back onto the " +
    "per-feed rollup") {
    val p = plan(DqOps.dqFreshnessLag)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }
}
