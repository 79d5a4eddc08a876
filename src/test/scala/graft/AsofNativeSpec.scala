package graft

import graft.ops.JoinOps
import graft.plans.{Asof, AsofJoinExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native Catalyst as-of join (graft.plans.AsofJoinPlan.scala): plan
  * shape, exact equivalence with the windowed `join_asof` rewrite, strict vs
  * inclusive semantics, multi-key grouping, and partitioning invariance. */
class AsofNativeSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def nativeDf = JoinOps.joinAsofNative.fn(spark, TestSpark.sf0001)

  test("join_asof_native ≡ join_asof (windowed rewrite) row for row") {
    val native = nativeDf.collect().map(_.toSeq).toSeq
    val windowed = JoinOps.joinAsof.fn(spark, TestSpark.sf0001).collect().map(_.toSeq).toSeq
    assert(native.nonEmpty)
    assert(native == windowed)
  }

  test("plan: AsofJoinExec present, exactly two exchanges, no join fallback") {
    val plan = nativeDf.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) { case e: AsofJoinExec => e }.nonEmpty,
      "native as-of exec missing from the physical plan")
    // one shuffle per side (purchases, views) — the sort-merge-join envelope;
    // +1 is the final global orderBy's range exchange
    val shuffles = collectWithSubqueries(plan) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 3, s"expected 2 join shuffles + 1 orderBy range shuffle, got ${shuffles.size}")
    assert(collectWithSubqueries(plan) { case e: SortMergeJoinExec => e }.isEmpty)
    assert(collectWithSubqueries(plan) { case e: BroadcastNestedLoopJoinExec => e }.isEmpty)
  }

  test("input-row SQLMetrics on the executed exec: totals exact, size-typed " +
    "for per-task min/med/max skew observability") {
    // no final orderBy: a global sort's range-partitioner SAMPLING pass
    // re-executes the join and double-counts every accumulator
    val ev = graft.tables.Tables.events(spark, TestSpark.sf0001)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("prev_view_ts"),
        col("event_id").as("prev_view_id"))
    val df = Asof.join(p, v, Seq("user_id" -> "v_user"), "purchase_ts", "prev_view_ts",
      strict = true, tiebreakCols = Seq("prev_view_id"), broadcastRight = Some(false))
    val res = df.collect()
    val exec = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: AsofJoinExec => e }.head
    val purchases = ev.where(col("event_type") === "purchase").count()
    val views = ev.where(col("event_type") === "view").count()
    assert(exec.metrics("numLeftRows").value == purchases,
      "left input metric must count every purchase row entering the merge")
    val r = exec.metrics("numRightRows").value
    assert(r > 0 && r <= views,
      s"right input metric must count consumed view rows (early-out allowed): $r")
    assert(exec.metrics("numOutputRows").value == res.length)
    // SIZE metrics render per-task min/med/max — the post-hoc skew signal
    assert(exec.metrics("numLeftRows").metricType == "size")
    assert(exec.metrics("numRightRows").metricType == "size")
  }

  test("join_asof_native_outer: sparse right side puts a large null fraction " +
    "in the hash and matches the windowed outer form") {
    val rows = JoinOps.joinAsofNativeOuter.fn(spark, TestSpark.sf0001).collect()
    val purchases = graft.tables.Tables.events(spark, TestSpark.sf0001)
      .where(col("event_type") === "purchase").count()
    assert(rows.length == purchases, "outer as-of must keep EVERY left row")
    val nulls = rows.count(_.isNullAt(3))
    // the 1-in-7 view filter leaves most purchases without a prior view: the
    // null-if-none emission is a first-class output, not an edge case
    assert(nulls > rows.length / 4, s"expected a large unmatched fraction, got $nulls/${rows.length}")
    assert(nulls < rows.length, "some purchases must still match")
    // windowed (independent) formulation of the same sparse outer join
    val e = graft.tables.Tables.events(spark, TestSpark.sf0001)
    val v = e.where(col("event_type") === "view" && pmod(col("event_id"), lit(7)) === 0)
      .select(col("user_id").as("vu"), col("ts").as("vts"), col("event_id").as("vid"))
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("purchase_id").orderBy(col("vts").desc, col("vid").desc)
    val windowed = p.join(v, col("vu") === col("user_id") && col("vts") < col("purchase_ts"), "left")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 || col("vts").isNull)
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("vts").as("prev_view_ts"), col("vid").as("prev_view_id"))
      .orderBy("purchase_id")
      .collect()
    assert(rows.map(_.toSeq).toSeq == windowed.map(_.toSeq).toSeq)
  }

  test("unmatched left rows survive with nulls (left-outer as-of)") {
    val rows = nativeDf.collect()
    assert(rows.exists(_.isNullAt(3)), "expected at least one purchase with no prior view")
    // and every matched row is strictly prior
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getTimestamp(3).compareTo(r.getTimestamp(2)) < 0,
        s"non-strict match: ${r.getTimestamp(3)} !< ${r.getTimestamp(2)}")
    }
  }

  test("strict excludes equal timestamps; inclusive admits them; ties break to max tiebreak") {
    val quotes = Seq(
      // key, time, quote_id
      ("AAA", 100L, 1L), ("AAA", 200L, 2L), ("AAA", 200L, 3L), ("AAA", 300L, 4L),
      ("BBB", 150L, 5L)
    ).toDF("sym_q", "t_q", "quote_id")
    val trades = Seq(
      ("AAA", 200L, 10L), // strict → quote@100; inclusive → quote@200 max id 3
      ("AAA", 250L, 11L), // either → quote@200 max id 3
      ("AAA", 50L, 12L),  // no prior quote
      ("CCC", 500L, 13L)  // key with no quotes at all
    ).toDF("sym", "t", "trade_id")

    val strictRes = Asof.join(trades, quotes, Seq("sym" -> "sym_q"), "t", "t_q",
        strict = true, tiebreakCols = Seq("quote_id"))
      .select("trade_id", "quote_id").as[(Long, Option[Long])].collect().toMap
    assert(strictRes == Map(10L -> Some(1L), 11L -> Some(3L), 12L -> None, 13L -> None))

    val inclRes = Asof.join(trades, quotes, Seq("sym" -> "sym_q"), "t", "t_q",
        strict = false, tiebreakCols = Seq("quote_id"))
      .select("trade_id", "quote_id").as[(Long, Option[Long])].collect().toMap
    assert(inclRes == Map(10L -> Some(3L), 11L -> Some(3L), 12L -> None, 13L -> None))
  }

  test("multi-key join groups on the full key; null keys never match") {
    val right = Seq(
      (1L, "x", 10L, 100L), (1L, "x", 20L, 101L), (1L, "y", 15L, 102L),
      (2L, "x", 5L, 103L)
    ).toDF("rk1", "rk2", "rt", "rid")
    val left = Seq(
      (Some(1L), "x", 25L, 1L),  // → rid 101
      (Some(1L), "y", 25L, 2L),  // → rid 102
      (Some(1L), "z", 25L, 3L),  // no such key pair
      (Some(2L), "x", 5L, 4L),   // strict: 5 < 5 false → none
      (Option.empty[Long], "x", 99L, 5L) // null key → never matches
    ).toDF("lk1", "lk2", "lt", "lid")
    val res = Asof.join(left, right, Seq("lk1" -> "rk1", "lk2" -> "rk2"), "lt", "rt")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(res == Map(1L -> Some(101L), 2L -> Some(102L), 3L -> None, 4L -> None, 5L -> None))
  }

  test("dim_scd2_asof_native (non-strict, dim-sized right side) ≡ windowed dim_scd2_asof") {
    val native = JoinOps.dimScd2AsofNative.fn(spark, TestSpark.sf0001)
      .collect().map(_.toSeq).toSeq
    val windowed = JoinOps.dimScd2Asof.fn(spark, TestSpark.sf0001)
      .collect().map(_.toSeq).toSeq
    assert(native.nonEmpty && native == windowed)
  }

  test("broadcast plan: BroadcastAsofJoinExec, facts never shuffle for the join") {
    val plan = JoinOps.dimScd2AsofNative.fn(spark, TestSpark.sf0001)
      .queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case e: graft.plans.BroadcastAsofJoinExec => e }.nonEmpty)
    assert(collectWithSubqueries(plan) { case e: AsofJoinExec => e }.isEmpty)
    // the FACT side of the join is exchange-free (map-only); the only
    // shuffles in the whole plan are the dim-sized version pre-aggregation
    // (under the broadcast) and the final global orderBy
    val bc = collectWithSubqueries(plan) {
      case e: graft.plans.BroadcastAsofJoinExec => e }.head
    assert(bc.left.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      "fact subtree of the broadcast as-of must not shuffle")
    val shuffles = collectWithSubqueries(plan) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 2,
      s"expected version-agg + orderBy exchanges only, got ${shuffles.size}")
  }

  test("broadcast ≡ sort-merge on the same inputs; auto mode follows the threshold") {
    val quotes = Seq(("AAA", 100L, 1L), ("AAA", 200L, 2L), ("BBB", 150L, 5L))
      .toDF("sym_q", "t_q", "quote_id")
    val trades = Seq(("AAA", 250L, 11L), ("BBB", 100L, 12L), ("CCC", 500L, 13L))
      .toDF("sym", "t", "trade_id")
    def run(bc: Option[Boolean]) =
      Asof.join(trades, quotes, Seq("sym" -> "sym_q"), "t", "t_q",
        tiebreakCols = Seq("quote_id"), broadcastRight = bc)
    val expected = run(Some(false)).select("trade_id", "quote_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(expected == Map(11L -> Some(2L), 12L -> None, 13L -> None))
    assert(run(Some(true)).select("trade_id", "quote_id")
      .as[(Long, Option[Long])].collect().toMap == expected)
    // auto: tiny right side broadcasts under the default 10 MB threshold...
    assert(collectWithSubqueries(run(None).queryExecution.executedPlan) {
      case e: graft.plans.BroadcastAsofJoinExec => e }.nonEmpty)
    // ...and falls back to sort-merge when broadcasting is disabled
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(collectWithSubqueries(run(None).queryExecution.executedPlan) {
      case e: AsofJoinExec => e }.nonEmpty)
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("tolerance bounds the lookback identically on both physical paths") {
    val quotes = Seq(("AAA", 100L, 1L), ("AAA", 800L, 2L), ("BBB", 100L, 3L))
      .toDF("sym_q", "t_q", "quote_id")
    val trades = Seq(
      ("AAA", 900L, 10L),  // quote@800 within 200 → match 2
      ("AAA", 1500L, 11L), // newest quote@800 is 700 stale → none (and NOT quote@100)
      ("BBB", 250L, 12L)   // quote@100 is 150 stale, inside the 200 window → match 3
    ).toDF("sym", "t", "trade_id")
    val expected = Map(10L -> Some(2L), 11L -> None, 12L -> Some(3L))
    for (bc <- Seq(Some(false), Some(true))) {
      val got = Asof.join(trades, quotes, Seq("sym" -> "sym_q"), "t", "t_q",
          tiebreakCols = Seq("quote_id"), broadcastRight = bc,
          toleranceMicros = Some(200L))
        .select("trade_id", "quote_id").as[(Long, Option[Long])].collect().toMap
      assert(got == expected, s"broadcastRight=$bc")
    }
    // native tolerance op ≡ windowed tolerance op on real data
    val native = JoinOps.joinAsofToleranceNative.fn(spark, TestSpark.sf0001)
      .collect().map(_.toSeq).toSeq
    val windowed = JoinOps.joinAsofTolerance.fn(spark, TestSpark.sf0001)
      .collect().map(_.toSeq).toSeq
    assert(native.nonEmpty && native == windowed)
  }

  test("result is invariant to shuffle partitioning (1 vs 7 vs 32)") {
    val base = nativeDf.collect().map(_.toSeq).toSeq
    for (p <- Seq("1", "7", "32")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", p)
      try assert(nativeDf.collect().map(_.toSeq).toSeq == base, s"drift at partitions=$p")
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
