package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{LlmOps, TableManifest}

/** Contract for the incremental IVF index ([[LlmOps.ivfAppendIndexPath]]):
  *
  *   1. EQUIVALENCE — probe(v2, i.e. base build + delta append against
  *      frozen centroids) must equal, ROW-EXACTLY after ranking, a probe of
  *      one full-corpus reassignment against the same frozen centroids (the
  *      rebuild the append replaces).
  *   2. WORK ∝ DELTA — the append's new files (v2 ∖ v1) hold exactly the
  *      delta rows, and every v1 file is referenced by v2 untouched: an
  *      append never rewrites the base (the DedupScaleSpec discipline
  *      applied to index maintenance).
  *   3. SNAPSHOT ISOLATION — probe(v1) sees no delta vector: a reader
  *      holding the old manifest mid-append reads the old index, full stop.
  */
class IvfAppendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("probe(after append) equals probe(full rebuild against the frozen " +
    "centroids) row-exactly") {
    val idx = LlmOps.ivfAppendIndexPath(spark, d)
    val appended = LlmOps.rankCandidates(LlmOps.ivfManifestProbe(spark, d, idx, 2L))
      .collect().map(_.toSeq).toSeq
    val rebuilt = LlmOps.rankCandidates(LlmOps.ivfAppendRebuildCandidates(spark, d, idx))
      .collect().map(_.toSeq).toSeq
    assert(appended.nonEmpty && appended == rebuilt)
  }

  test("append work is proportional to the delta: new files hold exactly the " +
    "delta rows and no v1 file is rewritten") {
    val idx = LlmOps.ivfAppendIndexPath(spark, d)
    val cells = idx.resolve("cells")
    val v1 = TableManifest.filesAsOf(cells, 1L).map(_.toString).toSet
    val v2 = TableManifest.filesAsOf(cells, 2L).map(_.toString).toSet
    assert(v1.subsetOf(v2), "v2 must retain every v1 file by reference")
    val newFiles = (v2 -- v1).toSeq
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("/gen2/")),
      s"append files must land in gen2 only, got $newFiles")
    val deltaCount = graft.tables.Tables.embeddings(spark, d)
      .where(pmod(col("vec_id"), lit(5)) === 0).count()
    val appendedRows = spark.read.parquet(newFiles: _*).count()
    assert(appendedRows == deltaCount,
      s"gen2 holds $appendedRows rows, delta is $deltaCount — append did more (or less) than the delta")
  }

  test("streamed ingest equals the batch append: probe(stream final) ≡ " +
    "probe(batch v2) row-exactly") {
    val streamed = LlmOps.streamAnnIvfAppend.fn(spark, d).collect().map(_.toSeq).toSeq
    val batch = LlmOps.rankCandidates(
        LlmOps.ivfManifestProbe(spark, d, LlmOps.ivfAppendIndexPath(spark, d), 2L))
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("snapshot isolation: a v1 probe never sees a delta vector") {
    val idx = LlmOps.ivfAppendIndexPath(spark, d)
    val v1Neighbors = LlmOps.ivfManifestProbe(spark, d, idx, 1L)
      .select("neighbor_id").distinct().collect().map(_.getLong(0))
    assert(v1Neighbors.nonEmpty && v1Neighbors.forall(_ % 5 != 0))
    // and the appended probe DOES surface delta vectors as candidates
    val v2Neighbors = LlmOps.ivfManifestProbe(spark, d, idx, 2L)
      .select("neighbor_id").distinct().collect().map(_.getLong(0))
    assert(v2Neighbors.exists(_ % 5 == 0), "v2 probe should see the delta")
  }
}
