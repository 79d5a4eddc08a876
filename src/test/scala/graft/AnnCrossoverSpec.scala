package graft

import graft.ops.LlmOps
import org.scalatest.funsuite.AnyFunSuite

/** The claim "bucketed ANN beats brute force" must hold at sizes where
  * similarity COMPUTE dominates — but asserting it via wall-clock flakes on a
  * shared-host VM (round 3: a 134 M-vs-30 K compute margin still lost a
  * 0.5× timing race under host load). So this spec asserts the WORK
  * directly: the number of (query, neighbor) rows that pay an exact cosine —
  * [[LlmOps.lshCandidates]] / [[LlmOps.ivfCandidates]], the exact join
  * outputs the ops rank — versus the n(n−1)/2 pair space brute force scores.
  * Candidate counts are deterministic (fixed corpus, fixed hyperplanes,
  * fixed-seed k-means), so this can never flake: a failure means the
  * bucketing genuinely degenerated. */
class AnnCrossoverSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ann candidate work is a small fraction of the brute-force pair space") {
    val n = 16384
    val dim = 64
    val dir = java.nio.file.Files.createTempDirectory("ann_crossover")
    try {
      // Deterministic pseudo-random corpus, same SplitMix64 scheme as the
      // engine's fixed-seed hyperplanes (different seed space: offset by n·dim
      // so corpus vectors are not the hyperplanes themselves).
      val rows = (0 until n).map { i =>
        (i.toLong, Array.tabulate(dim)(j =>
          graft.functions.MinHashSig.splitmix64((n.toLong * dim) + i.toLong * dim + j)
            .toFloat / Long.MaxValue.toFloat))
      }
      import spark.implicits._
      rows.toDF("vec_id", "embedding").repartition(8)
        .write.mode("overwrite").parquet(dir.resolve("embeddings.parquet").toString)

      val brutePairs = n.toLong * (n - 1) / 2 // ≈ 134 M at n = 16384

      // LSH: candidate rows = bucket-join matches across 4 tables × 7 probes.
      val lshCand = LlmOps.lshCandidates(spark, dir.toString).count()
      info(f"n=$n: lsh candidates $lshCand vs brute pairs $brutePairs (${100.0 * lshCand / brutePairs}%.2f%%)")
      assert(lshCand > 0, "lsh produced no candidates — bucketing is broken, not frugal")
      assert(lshCand < brutePairs / 20,
        s"lsh candidate work $lshCand is not < 5% of the $brutePairs brute-force pair space")

      // IVF: search-time candidates from the probe⋈inverted-file join, plus
      // the fixed training cost (every vector scores all K centroids for
      // Iters+1 assignment passes) accounted arithmetically.
      val ivfCand = LlmOps.ivfCandidates(spark, dir.toString).count()
      val ivfTrain = 16L * n * 3 // K=16 scorings/vector, 2 training passes, +1 pass of slack
      info(f"n=$n: ivf candidates $ivfCand + train $ivfTrain vs brute pairs $brutePairs (${100.0 * (ivfCand + ivfTrain) / brutePairs}%.2f%%)")
      assert(ivfCand > 0, "ivf produced no candidates — probing is broken, not frugal")
      assert(ivfCand + ivfTrain < brutePairs / 20,
        s"ivf work ${ivfCand + ivfTrain} is not < 5% of the $brutePairs brute-force pair space")

      // And the full ops still produce a complete top-5 per query at this
      // corpus size (work counting must not have replaced correctness).
      assert(LlmOps.simSearchAnnLsh.fn(spark, dir.toString).count() == 50L)
      assert(LlmOps.simSearchAnnIvf.fn(spark, dir.toString).count() == 50L)
    } finally graft.ops.Housekeeping.deleteRecursively(dir)
  }
}
