package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{LlmOps, StreamingOps}

/** Contract for `stream_dedup_minhash` — the foreachBatch-maintained MinHash
  * band index (round-12 verdict #6):
  *
  *   1. FOLD EQUALITY — on closed input the streamed fold (per-batch
  *      self-dedup + probe of the standing index) reconstructs EXACTLY the
  *      batch `dedup_near_minhash` pair set: nothing lost at a delivery
  *      boundary, nothing duplicated when a pair's bands match in several
  *      batches' indexes.
  *   2. STATE GROWTH — the standing index grows LINEARLY in documents seen,
  *      pinned as exact counts (16 band rows + 1 shingle row per signed
  *      document), never as accumulated pair state: a run that kept pair or
  *      candidate state would blow these counts immediately.
  */
class StreamDedupMinhashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("streamed fold equals the batch near-dup pair set on closed input") {
    val streamed = StreamingOps.streamDedupMinhash.fn(spark, d)
      .collect().map(_.toSeq).toSeq
    val batch = LlmOps.dedupNearMinhash.fn(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("standing index state is linear in documents: 16 band rows + 1 " +
    "shingle row per signed doc, no pair state") {
    StreamingOps.streamDedupMinhash.fn(spark, d).collect() // (re)build the index
    val idx = StreamingOps.lastMinhashIdxRoot
    assert(idx != null)
    // signed docs = those with >= 3 words (the shingling floor)
    val signedDocs = graft.tables.Tables.documents(spark, d)
      .where(size(split(col("text"), " ")) >= 3).count()
    val bandRows = spark.read.parquet(s"$idx/bands").count()
    val shingleRows = spark.read.parquet(s"$idx/shingles").count()
    assert(bandRows == signedDocs * 16,
      s"band index must hold exactly 16 rows per signed doc: $bandRows vs ${signedDocs * 16}")
    assert(shingleRows == signedDocs,
      s"shingle table must hold exactly one row per signed doc: $shingleRows vs $signedDocs")
  }
}
