package graft

import graft.ops.LlmOps
import org.scalatest.funsuite.AnyFunSuite

/** `dedup_cluster_keep`'s core: the keep decision must be per CONNECTED
  * COMPONENT, not per pair: a chain A~B, B~C where A and C never pair
  * directly still collapses to one survivor. Also: isolated pairs keep their
  * own minimum, and every doc in any pair appears exactly once in the
  * output. */
class ClusterKeepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("transitive chain collapses to one component; components keep their min id") {
    import spark.implicits._
    // components: {1,2,3} (chain via 2), {10,11}, {20,21,22,23} (star on 20)
    val pairs = Seq(
      (2L, 3L), (1L, 2L),
      (10L, 11L),
      (20L, 21L), (20L, 22L), (20L, 23L))
      .toDF("doc_a", "doc_b")
    val got = LlmOps.ccKeep(pairs).collect().map(r => (r.getLong(0), r.getLong(1)))
    graft.ops.Housekeeping.releaseAll()
    val want = Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L)
    assert(got.toSeq == want)
  }

  test("empty pair list yields an empty keep table, not a crash") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = LlmOps.ccKeep(empty).collect()
    graft.ops.Housekeeping.releaseAll()
    assert(got.isEmpty)
  }

  test("long path converges (diameter > a couple of rounds)") {
    import spark.implicits._
    // path 0-1-2-...-9: worst-case diameter for min propagation
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = LlmOps.ccKeep(pairs).collect().map(r => (r.getLong(0), r.getLong(1)))
    graft.ops.Housekeeping.releaseAll()
    assert(got.forall(_._2 == 0L) && got.length == 10)
  }
}
