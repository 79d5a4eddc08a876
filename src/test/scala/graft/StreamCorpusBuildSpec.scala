package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{PipelineOps, StreamingOps}

/** Contract for `stream_corpus_build` — the five-stage corpus build run as a
  * foreachBatch fold (round-14 verdict #4):
  *
  *   1. FOLD EQUALITY — on closed input the fold's per-split stats equal the
  *      batch `pipeline_corpus_build` BIT-FOR-BIT (the driver oracle proves
  *      the same against DuckDB's CTE chain; this pins Spark-vs-Spark).
  *   2. STATE PRIMARY KEYS under re-upload — delivery 2 re-sends every 17th
  *      earlier document; the folded docstate must still hold each gated
  *      doc_id exactly once, and the dictionary generations must be
  *      DISJOINT shingle sets (the additive-hits decomposition's
  *      precondition).
  *   3. IDEMPOTENT COMMITS — every batch leaves its `_b<id>.done` marker.
  */
class StreamCorpusBuildSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("streamed fold equals the batch corpus build on closed input") {
    val streamed = StreamingOps.streamCorpusBuild.fn(spark, d)
      .collect().map(_.toSeq).toSeq
    val batch = PipelineOps.pipelineCorpusBuild.fn(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("folded state keeps its primary keys under re-upload, dictionary " +
    "generations stay disjoint, batches commit idempotently") {
    StreamingOps.streamCorpusBuild.fn(spark, d).collect() // (re)build state
    val root = StreamingOps.lastRoot("corpus", d)
    assert(root != null)
    def read(sub: String) =
      spark.read.option("recursiveFileLookup", "true").parquet(s"$root/$sub")
    // docstate: exactly one row per gated doc, despite re-uploads
    val state = read("docstate")
    assert(state.groupBy("doc_id").count().where(col("count") =!= 1).isEmpty,
      "docstate must hold each doc exactly once")
    val gatedDocs = PipelineOps.corpusGate(
      graft.tables.Tables.documents(spark, d)).count()
    assert(state.count() == gatedDocs,
      "docstate must hold exactly the gated docs")
    // dictionary: generations are disjoint and union to the full raw src0
    // shingle dictionary
    val dict = read("dict")
    assert(dict.groupBy("s").count().where(col("count") =!= 1).isEmpty,
      "dictionary generations must be disjoint")
    val fullDict = graft.ops.LlmOps.shingleArrays(
        graft.tables.Tables.documents(spark, d)
          .where(col("source") === "src0").select("doc_id", "text"))
      .select(explode(col("shingles")).as("s")).distinct().count()
    assert(dict.count() == fullDict,
      "dictionary union must equal the full raw src0 shingle set")
    (0L to 2L).foreach { b =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, s"_b$b.done")),
        s"batch $b commit marker missing")
    }
  }
}
