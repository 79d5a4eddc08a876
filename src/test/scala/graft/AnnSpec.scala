package graft

import graft.ops.LlmOps
import org.scalatest.funsuite.AnyFunSuite

/** LSH-bucketed ANN vs the brute-force baseline: deterministic output and a
  * recall floor (random uniform embeddings are LSH's worst case, so the
  * floor is modest — the assertion is that the machinery finds real
  * neighbors, not hash noise). */
class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ann_lsh: deterministic and recall@5 above floor vs brute force") {
    val ann1 = LlmOps.simSearchAnnLsh.fn(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val ann2 = LlmOps.simSearchAnnLsh.fn(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(ann1.sameElements(ann2))

    val brute = LlmOps.simSearchKnnPerQuery.fn(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = ann1.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(approx.keySet == brute.keySet, "every query must produce candidates")
    val recalls = brute.map { case (q, truth) =>
      (approx(q) & truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@5 = $mean%.2f")
    assert(mean >= 0.3, f"mean recall $mean%.2f below floor")
  }
}
