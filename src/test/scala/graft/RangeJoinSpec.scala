package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.JoinOps
import graft.plans.Band

/** Native band-join contract ([[graft.plans.RangeJoinExec]]): result
  * equality with the theta rewrite on real data, boundary/null semantics on
  * a planted fixture, buffer reset across keys, and the co-partitioned plan
  * shape (a custom exec that silently planned a cartesian would still pass
  * a result check — the plan assertion is half the contract).
  */
class RangeJoinSpec extends AnyFunSuite
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark

  test("input-row SQLMetrics on the executed band exec: totals exact, " +
    "size-typed for per-task skew observability") {
    // no final orderBy: a global sort's range-partitioner SAMPLING pass
    // re-executes the join and double-counts every accumulator
    val ev = graft.tables.Tables.events(spark, TestSpark.sf0001)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("u1"), col("ts").as("t1"))
    val f = ev.select(col("event_id").as("follow_id"), col("user_id").as("u2"),
      col("ts").as("t2"), col("event_type").as("follow_type"))
    val df = Band.join(p, f, Seq("u1" -> "u2"), "t1", "t2",
      loMicros = 0L, hiMicros = 600000000L, broadcastRight = Some(false))
    val res = df.collect()
    val exec = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: graft.plans.RangeJoinExec => e }.head
    val purchases = ev.where(col("event_type") === "purchase").count()
    assert(exec.metrics("numLeftRows").value == purchases,
      "left input metric must count every purchase row entering the merge")
    val r = exec.metrics("numRightRows").value
    assert(r > 0 && r <= ev.count(),
      s"right input metric must count consumed rows (early-out allowed): $r")
    assert(exec.metrics("numOutputRows").value == res.length)
    assert(exec.metrics("numLeftRows").metricType == "size")
    assert(exec.metrics("numRightRows").metricType == "size")
  }

  /** Evaluate `f` with [[graft.plans.BandRewriteRule]] disabled, so a theta
    * formulation stays on Catalyst's stock sort-merge plan — the INDEPENDENT
    * implementation the native exec is compared against. (joinRangeTheta
    * registers the rewrite on the shared session; without the kill switch
    * these equality tests would silently compare native to native.) */
  private def rewriteOff[A](f: => A): A = {
    spark.conf.set(graft.plans.BandRewriteRule.RewriteConfKey, "false")
    try f finally spark.conf.unset(graft.plans.BandRewriteRule.RewriteConfKey)
  }

  test("native band join equals the theta rewrite on real data") {
    val native = JoinOps.joinRangeNative.fn(spark, TestSpark.sf0001).collect().toSeq
    val theta = rewriteOff(JoinOps.joinRangeTheta.fn(spark, TestSpark.sf0001).collect().toSeq)
    assert(native.nonEmpty && native == theta)
  }

  test("optimizer rewrite: the declarative theta form fires the native band " +
    "exec and returns the identical result") {
    val df = JoinOps.joinRangeTheta.fn(spark, TestSpark.sf0001)
    val rewrittenRows = df.collect().toSeq
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("RangeJoin"), p) // RangeJoinExec or BroadcastRangeJoinExec
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    val stock = rewriteOff {
      val sdf = JoinOps.joinRangeTheta.fn(spark, TestSpark.sf0001)
      val rows = sdf.collect().toSeq
      assert(!sdf.queryExecution.executedPlan.toString.contains("RangeJoin"),
        "kill switch must yield the stock plan")
      rows
    }
    assert(rewrittenRows.nonEmpty && rewrittenRows == stock)
  }

  test("optimizer rewrite: leftover conjuncts survive as a filter above the " +
    "band join; equi-less or band-less joins are untouched") {
    import spark.implicits._
    graft.plans.Band.ensureOptimized(spark)
    val p = (1 to 40).map(i => (i.toLong, (i % 3).toLong, (i * 7 % 50).toLong))
      .toDF("pid", "k", "t1")
    val f = (1 to 40).map(i => (100L + i, (i % 3).toLong, (i * 11 % 50).toLong))
      .toDF("fid", "k2", "t2")
    // extra cross-side conjunct (fid > pid) must survive the rewrite
    val mixed = p.join(f, col("k") === col("k2") && col("t2") > col("t1") &&
      col("t2") <= col("t1") + 10L && col("fid") > col("pid") + 100L)
    val mp = mixed.queryExecution.executedPlan.toString
    assert(mp.contains("RangeJoin"), mp)
    val expected = rewriteOff(p.join(f, col("k") === col("k2") && col("t2") > col("t1") &&
        col("t2") <= col("t1") + 10L && col("fid") > col("pid") + 100L)
      .orderBy("pid", "fid").collect().toSeq)
    assert(mixed.orderBy("pid", "fid").collect().toSeq == expected && expected.nonEmpty)
    // LEFT OUTER with ONLY equi+band → rewrites with native null emission
    val outerCond = col("k") === col("k2") && col("t2") > col("t1") &&
      col("t2") <= col("t1") + 10L
    val outerJoin = p.join(f, outerCond, "left")
    assert(outerJoin.queryExecution.executedPlan.toString.contains("RangeJoin"))
    val outerExpected = rewriteOff(
      p.join(f, outerCond, "left").orderBy(col("pid"), col("fid").asc_nulls_first)
        .collect().map(_.toSeq).toSeq)
    assert(outerJoin.orderBy(col("pid"), col("fid").asc_nulls_first)
      .collect().map(_.toSeq).toSeq == outerExpected)
    assert(outerExpected.exists(_.contains(null)), "fixture must carry unmatched left rows")
    // LEFT OUTER with a leftover conjunct → NOT rewritten (cannot hoist)
    val outerLeftover = p.join(f, outerCond && col("fid") > col("pid") + 100L, "left")
    assert(!outerLeftover.queryExecution.executedPlan.toString.contains("RangeJoin"))
    // no equi key → untouched; one-sided band only → untouched
    val noEqui = p.join(f, col("t2") > col("t1") && col("t2") <= col("t1") + 10L)
    assert(!noEqui.queryExecution.executedPlan.toString.contains("RangeJoin"))
    val noBand = p.join(f, col("k") === col("k2") && col("t2") > col("t1"))
    assert(!noBand.queryExecution.executedPlan.toString.contains("RangeJoin"))
    // empty band (lo > hi) → untouched
    val empty = p.join(f, col("k") === col("k2") && col("t2") > col("t1") + 10L &&
      col("t2") <= col("t1"))
    assert(!empty.queryExecution.executedPlan.toString.contains("RangeJoin"))
  }

  test("boundary semantics: lower bound strict, upper bound inclusive") {
    import spark.implicits._
    // left point at t=1000; band (1000, 1000 + 600] in micros
    val p = Seq((1L, 10L, 1000L)).toDF("pid", "k", "t1")
    val f = Seq(
      (100L, 10L, 1000L), // == t1: excluded (strict lower)
      (101L, 10L, 1001L), // just inside
      (102L, 10L, 1600L), // == t1 + hi: included (inclusive upper)
      (103L, 10L, 1601L), // just past: excluded
      (104L, 11L, 1001L)  // wrong key
    ).toDF("fid", "k2", "t2")
    val got = Band.join(p, f, Seq("k" -> "k2"), "t1", "t2", 0L, 600L)
      .select("pid", "fid").orderBy("fid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 101L), (1L, 102L)))
  }

  test("null keys and null times never match; buffer resets across keys") {
    import spark.implicits._
    val p = Seq(
      (1L, Option(10L), Option(1000L)),
      (2L, Option.empty[Long], Option(1000L)), // null key: emits nothing (inner)
      (3L, Option(20L), Option(1000L)),
      (4L, Option(20L), Option.empty[Long])    // null time: emits nothing
    ).toDF("pid", "k", "t1")
    val f = Seq(
      (100L, Option(10L), Option(1100L)),
      (101L, Option.empty[Long], Option(1100L)), // null key right: discarded
      (102L, Option(20L), Option.empty[Long]),   // null time right: discarded
      (103L, Option(20L), Option(1100L))
    ).toDF("fid", "k2", "t2")
    val got = Band.join(p, f, Seq("k" -> "k2"), "t1", "t2", 0L, 600L)
      .select("pid", "fid").orderBy("pid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // key 10's match must not leak into key 20's band and vice versa
    assert(got.toSeq == Seq((1L, 100L), (3L, 103L)))
  }

  test("left outer: unmatched and null-key/null-time left rows survive with " +
    "nulls, matched rows are identical to inner, on BOTH physical paths") {
    import spark.implicits._
    val p = Seq(
      (1L, Option(10L), Option(1000L)), // matched
      (2L, Option(10L), Option(5000L)), // in key, out of band → null row
      (3L, Option(99L), Option(1000L)), // key absent from right → null row
      (4L, Option.empty[Long], Option(1000L)), // null key → null row (outer keeps it)
      (5L, Option(10L), Option.empty[Long])    // null time → null row
    ).toDF("pid", "k", "t1")
    val f = Seq((100L, 10L, 1100L)).toDF("fid", "k2", "t2")
    for (bc <- Seq(false, true)) {
      val got = Band.join(p, f, Seq("k" -> "k2"), "t1", "t2", 0L, 600L,
          broadcastRight = Some(bc), leftOuter = true)
        .select("pid", "fid").orderBy("pid")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      assert(got.toSeq == Seq((1L, 100L), (2L, -1L), (3L, -1L), (4L, -1L), (5L, -1L)),
        s"broadcast=$bc: $got")
    }
  }

  test("one-to-many fan-out: every in-band right row joins") {
    import spark.implicits._
    val p = Seq((1L, 10L, 1000L), (2L, 10L, 1200L)).toDF("pid", "k", "t1")
    val f = (1 to 5).map(i => (100L + i, 10L, 1000L + i * 100L)).toDF("fid", "k2", "t2")
    val got = Band.join(p, f, Seq("k" -> "k2"), "t1", "t2", 0L, 300L)
      .select("pid", "fid").orderBy("pid", "fid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // pid 1 band (1000,1300]: fids 101,102,103; pid 2 band (1200,1500]: 103,104,105
    assert(got.toSeq == Seq((1L, 101L), (1L, 102L), (1L, 103L),
      (2L, 103L), (2L, 104L), (2L, 105L)))
  }

  test("broadcast exec equals the shuffled merge and never exchanges the fact side") {
    import spark.implicits._
    val e = graft.tables.Tables.events(spark, TestSpark.sf0001)
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("u1"), col("ts").as("t1"))
    val f = e.select(col("event_id").as("fid"), col("user_id").as("u2"), col("ts").as("t2"))
    def run(bc: Boolean) =
      Band.join(p, f, Seq("u1" -> "u2"), "t1", "t2", 0L, 600000000L,
          broadcastRight = Some(bc))
        .select("pid", "fid").orderBy("pid", "fid")
    val shuffled = run(false)
    val broadcast = run(true)
    assert(broadcast.collect().toSeq == shuffled.collect().toSeq)
    val bp = broadcast.queryExecution.executedPlan.toString
    assert(bp.contains("BroadcastRangeJoin"), bp)
    // the fact (left) side must not shuffle: the only exchange is the
    // right side's broadcast
    assert(!bp.contains("Exchange hashpartitioning"), bp)
  }

  test("property: native band join equals the theta rewrite for every band " +
    "shape and strictness combination") {
    import spark.implicits._
    // deterministic fixture: clustered keys, colliding times, both key
    // parities — the shapes that stress buffer admission/eviction edges
    val p = (1 to 60).map(i => (i.toLong, (i % 5).toLong, (i * 37 % 200).toLong))
      .toDF("pid", "k", "t1")
    val f = (1 to 80).map(i => (100L + i, (i % 5).toLong, (i * 23 % 200).toLong))
      .toDF("fid", "k2", "t2")
    for {
      (lo, hi) <- Seq((0L, 10L), (-15L, 15L), (5L, 40L), (0L, 0L), (-200L, 200L))
      loS <- Seq(true, false)
      hiS <- Seq(true, false)
      outer <- Seq(false, true)
    } {
      val native = Band.join(p, f, Seq("k" -> "k2"), "t1", "t2", lo, hi, loS, hiS,
          leftOuter = outer)
        .select("pid", "fid").orderBy(col("pid"), col("fid").asc_nulls_first)
        .collect().map(_.toSeq).toSeq
      val loCmp = if (loS) col("t2") > col("t1") + lo else col("t2") >= col("t1") + lo
      val hiCmp = if (hiS) col("t2") < col("t1") + hi else col("t2") <= col("t1") + hi
      val theta = rewriteOff(p.join(f,
          col("k") === col("k2") && loCmp && hiCmp, if (outer) "left" else "inner")
        .select("pid", "fid").orderBy(col("pid"), col("fid").asc_nulls_first)
        .collect().map(_.toSeq).toSeq)
      assert(native == theta,
        s"band ($lo, $hi) loStrict=$loS hiStrict=$hiS outer=$outer: " +
          s"native ${native.size} rows vs theta ${theta.size}")
    }
  }

  test("plan shape: RangeJoinExec with co-partitioned exchanges, no cartesian") {
    val df = JoinOps.joinRangeNative.fn(spark, TestSpark.sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("RangeJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(
      p.split("== Initial Plan ==").head).size >= 2, p)
  }
}
