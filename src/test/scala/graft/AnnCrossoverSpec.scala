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

      // Pinned recall@5 floor vs brute-force ground truth — so a tuning
      // change (bands, probes, K, NProbe) that silently degrades recall
      // fails THIS test instead of a user. The fixture is deterministic, so
      // these are regression bars, not statistical hopes: measured on this
      // corpus lsh = 0.98 avg (round-14 auto-sized query-side probe),
      // ivf = probe = 0.48 avg (uniform-random embeddings are the
      // documented WORST case for a coarse quantizer — no cluster
      // structure; real embedding corpora sit far higher).
      def top5(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
        df.collect().map(r => (r.getLong(0), r.getLong(2)))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val exact = top5(LlmOps.simSearchKnnPerQuery.fn(spark, dir.toString))
      def recall(got: Map[Long, Set[Long]]): Double = {
        val per = exact.keys.toSeq.sorted
          .map(q => (got.getOrElse(q, Set.empty) & exact(q)).size / 5.0)
        per.sum / per.size
      }
      val lshR = recall(top5(LlmOps.simSearchAnnLsh.fn(spark, dir.toString)))
      val ivfR = recall(top5(LlmOps.simSearchAnnIvf.fn(spark, dir.toString)))
      val probeR = recall(top5(LlmOps.simSearchAnnProbe.fn(spark, dir.toString)))
      info(f"recall@5 vs brute force: lsh=$lshR%.3f ivf=$ivfR%.3f probe=$probeR%.3f")
      // raised from 0.80 in round 14: the auto-sized query-side probe (16
      // tables × 11 bits × Hamming-2 at this n) measures 0.980 at 0.07% of
      // the pair space — 0.90 leaves real margin without tolerating decay
      assert(lshR >= 0.90, f"lsh recall@5 $lshR%.3f fell below the 0.90 floor")
      assert(ivfR >= 0.45, f"ivf recall@5 $ivfR%.3f fell below the 0.45 floor")
      assert(probeR == ivfR,
        f"probe recall $probeR%.3f != trainer recall $ivfR%.3f — the persisted index diverged")
    } finally graft.ops.Housekeeping.deleteRecursively(dir)
  }
}
