package graft

import graft.ops.LlmOps
import org.scalatest.funsuite.AnyFunSuite

/** The operational guard on the two declared-exact pair ops
  * (dedup_embedding_cosine / sim_search_topk): above the configured pair
  * budget the all-pairs stage must refuse LOUDLY at plan time — the 100×
  * caller gets an actionable error naming the approximate families, never a
  * quiet quadratic job. */
class PairBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("blockedAllPairs refuses above the pair budget with an actionable message") {
    spark.conf.set("graft.pair.budget", "100") // sf0.001 has 20 vectors = 190 pairs
    try {
      val e = intercept[IllegalArgumentException] {
        LlmOps.blockedAllPairs(spark, TestSpark.sf0001)
      }
      assert(e.getMessage.contains("pair budget"), e.getMessage)
      assert(e.getMessage.contains("sim_search_ann_lsh"), e.getMessage)
      assert(e.getMessage.contains("graft.pair.budget"), e.getMessage)
    } finally spark.conf.unset("graft.pair.budget")
  }

  test("within budget the exact stage runs unchanged") {
    assert(LlmOps.dedupEmbeddingCosine.fn(spark, TestSpark.sf0001).collect().nonEmpty)
  }

  test("image-phash banding inherits the budget guard and refuses loudly") {
    spark.conf.set("graft.pair.budget", "1") // any bucket with 2+ members busts this
    try {
      val e = intercept[IllegalArgumentException] {
        graft.ops.MultimodalOps.dedupImagePhash.fn(spark, TestSpark.sf0001).collect()
      }
      assert(e.getMessage.contains("graft.pair.budget"), e.getMessage)
    } finally spark.conf.unset("graft.pair.budget")
  }
}
