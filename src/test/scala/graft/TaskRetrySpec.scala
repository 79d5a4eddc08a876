package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dets
import graft.tables.Tables

/** Fault-injection rehearsal for the cluster claim every op's scale notes
  * lean on: a failed-and-retried task must re-derive EXACTLY the rows its
  * first attempt would have produced, or partial aggregation double-counts /
  * drops data silently. The rehearsal runs in its OWN `local[4, 2]`
  * (maxFailures=2) session via [[TestSpark.retrySession]] — the shared
  * suite session stays at `local[4]` so a silent retry can never mask
  * flakiness in other specs. A poison expression kills the first attempt
  * of one scan task mid-stream (AFTER emitting some rows — the torn-output
  * case retries must discard), and the result must be bit-identical to the
  * clean run. This holds because every graft plan is deterministic under
  * re-execution: no `rand()`, salts derived from data columns, exact-decimal
  * aggregation buffers (SURVEY.md §7.2) — the properties this spec pins.
  */
class TaskRetrySpec extends AnyFunSuite {

  private def aggregate(spark: org.apache.spark.sql.SparkSession, poison: Boolean) = {
    val killer = udf((x: Double, emitted: Long) => {
      val tc = org.apache.spark.TaskContext.get()
      // fail partition 0's FIRST attempt only, after it has emitted 100 rows
      if (poison && tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0 &&
          emitted > 100 && !TaskRetrySpec.fired.getAndSet(true))
        throw new RuntimeException("graft-injected task failure")
      x
    })
    Tables.lineitem(spark, TestSpark.sf001)
      .select(col("l_returnflag"),
        killer(col("l_quantity"), monotonically_increasing_id()).as("q"),
        Dets.d2(col("l_extendedprice")).as("p"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(Dets.d2(col("q"))).cast("double").as("sum_qty"),
        sum(col("p")).cast("double").as("sum_price"))
      .orderBy("l_returnflag")
      .collect()
      .toSeq
  }

  test("a mid-stream task failure retries to a bit-identical aggregate") {
    TestSpark.retrySession { spark =>
      val clean = aggregate(spark, poison = false)
      TaskRetrySpec.fired.set(false)
      val retried = aggregate(spark, poison = true)
      assert(TaskRetrySpec.fired.get, "poison did not fire — the rehearsal proved nothing")
      assert(retried == clean,
        s"retry changed the result:\n clean=$clean\n retried=$retried")
    }
  }
}

object TaskRetrySpec {
  /** Fire-once latch: attempt 0 dies exactly once; the retry (attempt 1)
    * and every other partition run clean. */
  val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
}
