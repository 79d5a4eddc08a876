package graft

import graft.ops.PipelineOps
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The selection-policy claims behind `pipeline_budget_select` (the oracle
  * proves the emitted rows; this spec proves the policy they encode):
  *
  *  1. Prefix property: within each source, the selected set is exactly a
  *     PREFIX of the (ttr desc, doc_id) quality ranking — no cherry-picking,
  *     no gaps.
  *  2. Budget fill: per source, the selected token mass reaches the budget
  *     (or the stratum is exhausted), and overshoots by at most one
  *     document — the pack_sequences start-offset rule.
  */
class BudgetSelectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("selection is a quality-prefix per stratum and fills the token budget") {
    val d = TestSpark.sf001
    val sel = PipelineOps.pipelineBudgetSelect.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(sel.nonEmpty)
    val selBySrc = sel.groupBy(_._2)

    val all = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n"),
        expr("CAST((size(array_distinct(split(text, ' '))) * 1000L) DIV size(split(text, ' ')) AS BIGINT)")
          .as("ttr"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._2)

    all.foreach { case (src, docs) =>
      val ranked = docs.sortBy { case (id, _, _, ttr) => (-ttr, id) }
      val budget = docs.map(_._3).sum / 5
      val selected = selBySrc.getOrElse(src, Array.empty).map(_._1).toSet
      assert(selected.nonEmpty, s"source $src selected nothing")

      // prefix property: the selected set is the first |selected| of the ranking
      val prefix = ranked.take(selected.size).map(_._1).toSet
      assert(selected == prefix, s"source $src: selection is not a quality prefix")

      // budget fill + bounded overshoot
      val selTok = ranked.take(selected.size).map(_._3).sum
      val exhausted = selected.size == docs.length
      assert(exhausted || selTok >= budget,
        s"source $src stopped at $selTok tokens below budget $budget without exhausting")
      val lastDoc = ranked(selected.size - 1)._3
      assert(selTok - lastDoc < budget,
        s"source $src overshot by more than the final document")
    }
  }
}
