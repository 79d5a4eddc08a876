package graft

import graft.ops.{LlmOps, StreamingOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The lane-routing claims behind `stream_quality_gate` (the oracle proves
  * the fold's per-doc verdicts equal the batch op's):
  *
  *  1. Exactly-once routing: every document appears ONCE across both lanes,
  *     despite delivery 2 re-uploading every 17th earlier doc.
  *  2. Lane purity: the clean lane is all keep=true with empty reasons; the
  *     quarantine lane all keep=false with non-empty machine-readable
  *     reasons.
  *  3. Commit discipline: all three batches left `_b<id>.done` markers and
  *     batchId-keyed generation dirs; generations hold disjoint doc_id sets
  *     (the anti-join actually dropped the re-uploads).
  *  4. The fold equals the batch op row-for-row (the oracle's claim,
  *     re-proven in-JVM against `text_quality_filter`).
  */
class StreamQualityGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream gate routes each doc once, lanes are pure, batches committed idempotently") {
    val d = TestSpark.sf0001
    // 3-delivery micro-fixture (a session-local conf — the bench default is
    // 2): batch 2 probes TWO standing generations, pinning multi-generation
    // accumulation beyond what the minimal fixture exercises
    val s3 = spark.newSession()
    s3.conf.set("graft.stream.deliveries", "3")
    val out = StreamingOps.streamQualityGate.fn(s3, d).cache()
    try {
      val n = graft.tables.Tables.documents(s3, d).count()
      assert(out.count() == n, "every doc routed")
      assert(out.select("doc_id").distinct().count() == n, "each doc routed exactly once")

      val root = StreamingOps.lastRoot("qgate", d)
      val clean = s3.read.option("recursiveFileLookup", "true").parquet(s"$root/clean")
      val quar = s3.read.option("recursiveFileLookup", "true").parquet(s"$root/quarantine")
      assert(clean.where(!col("keep") || col("reasons") =!= "").count() == 0, "clean lane purity")
      assert(quar.where(col("keep") || col("reasons") === "").count() == 0, "quarantine lane purity")
      assert(quar.count() > 0, "the corpus plants quality failures — quarantine must fire")

      (0L to 2L).foreach { b =>
        assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, s"_b$b.done")),
          s"batch $b commit marker missing")
      }
      // generations hold disjoint ids — the re-uploads in delivery 2 were
      // dropped by the anti-join, not re-routed
      val gens = (0 to 2).flatMap { b =>
        Seq(s"$root/clean/b$b", s"$root/quarantine/b$b")
          .filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          .map(p => s3.read.parquet(p).select("doc_id").collect().map(_.getLong(0)).toSet)
      }
      val total = gens.map(_.size).sum
      assert(gens.reduce(_ ++ _).size == total, "generation doc_id sets overlap")

      // fold ≡ batch verdicts
      val batchVerdicts = LlmOps.textQualityFilter.fn(s3, d)
      assert(out.exceptAll(batchVerdicts).isEmpty && batchVerdicts.exceptAll(out).isEmpty,
        "stream fold diverged from the batch verdict table")
    } finally out.unpersist()
  }
}
