package graft

import graft.ops.LlmOps
import org.scalatest.funsuite.AnyFunSuite

/** Planted-duplicates fixture for MinHash+LSH near-dedup (FIXTURES.md §2):
  * recall 1.0 on planted near-dupe pairs, precision 1.0 after the
  * verify-Jaccard step, byte-identical across runs (fixed seeds). */
class NearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val vocab = Array("key", "agg", "row", "scan", "slow", "fast", "table",
    "value", "part", "hash", "merge", "batch", "spark", "order", "data", "column",
    "join", "small", "line", "customer", "query", "big", "window", "stream", "sort",
    "group", "filter", "the", "a", "index")

  private def doc(seed: Int, n: Int): Array[String] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(vocab(rnd.nextInt(vocab.length)))
  }

  /** 10 unique docs, 10 near-dup pairs (one word edited in a 40-word doc —
    * Jaccard on 3-gram shingles ≈ 0.92), 10 unrelated docs. */
  private def fixture() = {
    import spark.implicits._
    val uniques = (0 until 10).map(i => (i.toLong, doc(1000 + i, 40).mkString(" ")))
    val pairs = (0 until 10).flatMap { i =>
      val base = doc(2000 + i, 40)
      val edited = base.clone()
      edited(20) = if (base(20) == "spark") "query" else "spark" // 1-word edit
      Seq((100L + 2 * i, base.mkString(" ")), (101L + 2 * i, edited.mkString(" ")))
    }
    val unrelated = (0 until 10).map(i => (200L + i, doc(3000 + i, 40).mkString(" ")))
    (uniques ++ pairs ++ unrelated).toDF("doc_id", "text")
  }

  test("planted near-duplicates: recall and precision 1.0, deterministic") {
    val docs = fixture()
    val expected = (0 until 10).map(i => (100L + 2 * i, 101L + 2 * i)).toSet
    val found = LlmOps.nearDupPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((expected -- found).isEmpty, s"missed pairs: ${expected -- found}")   // recall
    assert((found -- expected).isEmpty, s"false positives: ${found -- expected}") // precision
    // determinism: second run byte-identical
    val again = LlmOps.nearDupPairs(docs).collect().map(_.toString).toSeq
    val first = LlmOps.nearDupPairs(docs).collect().map(_.toString).toSeq
    assert(again == first)
  }

  test("near-dedup is idempotent on the real documents table") {
    val docs = graft.tables.Tables.documents(spark, TestSpark.sf0001)
    val once = LlmOps.nearDupPairs(docs).collect().map(_.toString).toSeq
    val twice = LlmOps.nearDupPairs(docs).collect().map(_.toString).toSeq
    assert(once == twice)
  }
}
