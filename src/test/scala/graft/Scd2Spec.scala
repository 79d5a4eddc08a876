package graft

import graft.ops.JoinOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boundary semantics + plan shape of `dim_scd2_asof`:
  *
  *  - [from, to) intervals: a fact at EXACTLY a change timestamp sees the
  *    NEW version (the union trick's kind-ordering tie-break).
  *  - facts before the user's first version get a null attribute.
  *  - the executed plan contains no nested-loop/cartesian join — the as-of
  *    interval semantics compile to the single-shuffle window formulation.
  */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fact at a change instant sees the new version; pre-history facts see null") {
    val df = JoinOps.dimScd2Asof.fn(spark, TestSpark.sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "SCD2 as-of must not plan a pair-space join:\n" + plan)

    val rows = df.collect()
    val events = graft.tables.Tables.events(spark, TestSpark.sf001)
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2))).toSeq
    // reference versions, computed independently in driver-side Scala
    val changes = events.filter(_._1 % 97 == 0)
      .groupBy(e => (e._2, e._3))
      .map { case ((u, ts), es) => (u, ts, "tier_" + es.map(_._1 % 5).max) }
      .toSeq
    val byUser = changes.groupBy(_._1).map { case (u, vs) =>
      u -> vs.sortBy(_._2.getTime).toIndexedSeq
    }
    val expected = events.map { case (id, u, ts) =>
      val tier = byUser.get(u).flatMap { vs =>
        // last version with eff_from <= fact ts  ([from, to) inclusion)
        vs.takeWhile(v => !v._2.after(ts)).lastOption.map(_._3)
      }
      id -> tier
    }.toMap
    assert(rows.length == events.length)
    rows.foreach { r =>
      val got = if (r.isNullAt(4)) None else Some(r.getString(4))
      assert(got == expected(r.getLong(0)),
        s"event ${r.getLong(0)}: got $got expected ${expected(r.getLong(0))}")
    }
    // the fixture must actually exercise both boundary classes. A
    // change-instant fact is any fact at a NON-FIRST version's eff_from —
    // there the [from, to) inclusion is live (old tier loses, new tier
    // wins, and the per-row check above verifies the op picked NEW). The
    // version-source events themselves qualify: they are facts too.
    val changeInstantFacts = events.filter { case (_, u, ts) =>
      byUser.get(u).exists(vs =>
        vs.head._2.getTime < ts.getTime && vs.exists(_._2.getTime == ts.getTime)) }
    val preHistoryNulls = rows.count(_.isNullAt(4))
    assert(preHistoryNulls > 0, "fixture has no pre-first-version facts")
    assert(changeInstantFacts.nonEmpty,
      "fixture has no fact at exactly a version-change instant ([from,to) boundary unexercised)")
    info(s"facts=${rows.length} versions=${changes.size} " +
      s"change-instant facts=${changeInstantFacts.size} pre-history nulls=$preHistoryNulls")
  }
}
