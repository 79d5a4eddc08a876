package graft

import graft.ops.LlmOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The oracle-upgrade proof for `dedup_simhash` (the same playbook that
  * upgraded dedup_near_minhash in round 7): the banded candidate stage is
  * the ONLY approximation in the op — emitted pairs are verified exactly by
  * bit_count(xor) ≤ 7 — so proving the banded result EQUAL to the exact
  * all-pairs Hamming join on every test sf makes the exact all-pairs DuckDB
  * query a valid hash oracle.
  *
  * Pigeonhole says NO pair at Hamming ≤ 7 escapes the 8×8-bit chunks (≤ 7
  * flipped bits cannot touch all 8 chunks), and since round 9 no bucket is
  * ever dropped (the former >64-member hot-bucket cap became a plan-time
  * pair-space budget guard — refuse loudly, never lose recall), so parity
  * holds by construction at every sf that runs; this spec keeps the
  * empirical proof as a regression against any future banding change.
  */
class SimhashRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def recallParity(sfDir: String): (Int, Int) = {
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val banded = LlmOps.simhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = graft.ops.Housekeeping.cacheBounded("simhash_recall_sigs",
      LlmOps.simhashSignatures(docs))
    val exact = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("h"))
      .where(col("h") <= 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((exact -- banded).isEmpty,
      s"$sfDir: banding missed true pairs: ${exact -- banded}")
    assert((banded -- exact).isEmpty,
      s"$sfDir: banding emitted false pairs: ${banded -- exact}")
    (banded.size, exact.size)
  }

  test("banded simhash pairs == exact all-pairs Hamming<=7 at sf0.001") {
    val (b, e) = recallParity(TestSpark.sf0001)
    info(s"sf0.001: $b banded == $e exact")
  }

  test("banded simhash pairs == exact all-pairs Hamming<=7 at sf0.01") {
    val (b, e) = recallParity(TestSpark.sf001)
    info(s"sf0.01: $b banded == $e exact")
  }

  test("banded simhash pairs == exact all-pairs Hamming<=7 at sf0.1") {
    val (b, e) = recallParity(TestSpark.sf01)
    info(s"sf0.1: $b banded == $e exact")
  }
}
