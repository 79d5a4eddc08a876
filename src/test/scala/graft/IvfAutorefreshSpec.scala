package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LlmOps
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Contract for the drift-triggered autorefresh
  * (`sim_search_ann_ivf_autorefresh` — round-14 verdict #3: the
  * report→retrain loop, closed):
  *
  *   1. The measured drift ppm is exact: this corpus's append delta is the
  *      id % 5 == 0 fifth, so [[LlmOps.ivfDriftPpm]] must equal
  *      (delta / total) × 10⁶ computed straight off the embeddings table.
  *   2. FIRED branch (default 10 % floor < 20 % drift): the op's ranking
  *      equals the retrain-and-swap key's row-exactly — the trigger really
  *      executed the swap, not some third construction.
  *   3. NO-OP branch (conf'd floor above the measured drift): the op's
  *      ranking equals the CURRENT append index's probe — below threshold
  *      the full-Lloyd's retrain must not run.
  */
class IvfAutorefreshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  private def run() =
    LlmOps.simSearchAnnIvfAutorefresh.fn(spark, d).collect().map(_.toSeq).toSeq

  test("measured drift ppm equals the corpus's exact base/delta split") {
    val emb = Tables.embeddings(spark, d)
    val total = emb.count()
    val delta = emb.where(pmod(col("vec_id"), lit(5)) === 0).count()
    assert(LlmOps.ivfDriftPpm(spark, d) == delta * 1000000L / total)
  }

  test("above the floor the trigger fires: result equals retrain-and-swap") {
    val fired = run()
    val retrain = LlmOps.simSearchAnnIvfRetrain.fn(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(fired.nonEmpty && fired == retrain)
  }

  test("below a conf'd floor the trigger is a no-op: result equals the " +
    "current append index's probe") {
    spark.conf.set("graft.ivf.refresh.ppm", "900000")
    try {
      val held = run()
      val current = LlmOps.simSearchAnnIvfAppend.fn(spark, d)
        .collect().map(_.toSeq).toSeq
      assert(held.nonEmpty && held == current)
      assert(held != LlmOps.simSearchAnnIvfRetrain.fn(spark, d)
          .collect().map(_.toSeq).toSeq,
        "the two branches must be distinguishable on this corpus, or the " +
          "branch assertions above prove nothing")
    } finally spark.conf.unset("graft.ivf.refresh.ppm")
  }
}
