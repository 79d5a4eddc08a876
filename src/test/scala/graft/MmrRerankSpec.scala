package graft

import graft.ops.LlmOps
import org.scalatest.funsuite.AnyFunSuite

/** Independent replay of `sim_search_mmr_rerank`'s unrolled greedy (the
  * oracle replays it in SQL from the same staged sims; this spec replays it
  * in plain Scala from the staged files — a third formulation):
  *
  *  1. The three picks per query are exactly what a literal MMR loop
  *     (λ = 0.7, ties to lowest id) selects from the staged candidate sims.
  *  2. Picks are distinct and drawn from the query's candidate set.
  *  3. Diversity is real where it matters: pick2 is NOT always the
  *     second-highest-sim candidate — on at least one query the redundancy
  *     penalty changes the selection vs plain top-3.
  */
class MmrRerankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("unrolled MMR equals a literal greedy loop over the staged sims") {
    val d = TestSpark.sf001
    val picked = LlmOps.simSearchMmrRerank.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

    val qc = spark.read.parquet(LlmOps.mmrQcStagePath(d)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val cc = spark.read.parquet(LlmOps.mmrCcStagePath(d)).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3))).toMap

    var diversityFired = false
    qc.foreach { case (q, sims) =>
      // literal greedy MMR, ties to lowest neighbor_id
      var selected = Vector.empty[Long]
      (1 to 3).foreach { _ =>
        val best = sims.keys.filterNot(selected.contains).toSeq.map { n =>
          val penalty = if (selected.isEmpty) 0.0
            else selected.map(p => cc((q, n, p))).max
          val score = if (selected.isEmpty) sims(n) else 0.7 * sims(n) - 0.3 * penalty
          (n, score)
        }.minBy { case (n, sc) => (-sc, n) }
        selected :+= best._1
      }
      assert(picked(q) == selected, s"query $q: op picked ${picked(q)}, greedy picked $selected")
      assert(selected.distinct.size == 3 && selected.forall(sims.contains))

      val top3 = sims.toSeq.sortBy { case (n, s) => (-s, n) }.take(3).map(_._1)
      if (picked(q) != top3) diversityFired = true
    }
    assert(diversityFired,
      "the redundancy penalty never changed any selection vs plain top-3 — MMR is vacuous here")
  }
}
