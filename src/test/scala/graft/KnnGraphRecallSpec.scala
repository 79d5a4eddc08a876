package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LlmOps

/** Contract for `embed_knn_graph`'s ANN production path: the banded LSH
  * candidate stage must (a) recover a pinned floor of the EXACT mutual-kNN
  * graph's edges — uniform random embeddings are LSH's worst case (no
  * cluster structure), so the floor here is conservative and real clustered
  * corpora only do better — and (b) do strictly less work than the pair
  * space (candidate rows ≪ n(n-1)/2), the property that makes the plan
  * survive a 100× corpus. The driver hash itself can't see recall (the
  * staged-candidate oracle verifies the pipeline DOWNSTREAM of the
  * approximation); this spec is where the approximation quality is pinned —
  * the AnnCrossoverSpec idiom applied to the graph key.
  */
class KnnGraphRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ANN mutual-kNN graph holds the recall floor against the exact graph " +
    "and its candidate stage stays below the pair space") {
    val d = TestSpark.sf0001
    val exact = LlmOps.exactKnnGraph(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = graft.SparkEntry.queries("embed_knn_graph")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // every ANN edge is a real candidate-verified mutual edge over the
    // candidate subgraph; it can add edges the exact graph rejects (a missed
    // true neighbor frees a top-5 slot) — precision is not the contract,
    // recall of the exact edges is
    val recall = ann.intersect(exact).size.toDouble / exact.size
    val n = graft.tables.Tables.embeddings(spark, d).count()
    val candidates = LlmOps.knnGraphCandidates(spark, d).count()
    val pairSpace = n * (n - 1) / 2
    info(f"exact=${exact.size} ann=${ann.size} recall=$recall%.3f " +
      f"candidates=$candidates/$pairSpace (${candidates.toDouble / pairSpace}%.2f of pair space)")
    assert(recall >= 0.60, f"recall $recall%.3f below the pinned floor 0.60")
    assert(candidates <= pairSpace * 0.6,
      s"candidate stage scanned $candidates of $pairSpace pairs — the bucketing is not pruning")
  }

  test("graft.knn.lsh.bits is a monotone work knob: wider codes strictly " +
    "shrink the candidate stage") {
    val d = TestSpark.sf0001
    def candidatesAt(bits: Int): Long =
      graft.ops.Housekeeping.withSessionConfDefaulted(spark,
        Seq(LlmOps.KnnLshBitsConf -> bits.toString),
        Map(LlmOps.KnnLshBitsConf -> "6")) {
        LlmOps.knnGraphCandidates(spark, d).count()
      }
    val at6 = candidatesAt(6)
    val at8 = candidatesAt(8)
    val at10 = candidatesAt(10)
    info(s"candidates at 6/8/10 bits: $at6 / $at8 / $at10")
    assert(at6 > at8 && at8 > at10,
      s"candidate work must shrink as the code widens: $at6 / $at8 / $at10")
  }
}
