package graft

import graft.ops.LlmOps
import org.scalatest.funsuite.AnyFunSuite

/** The claim "bucketed ANN beats brute force" is not observable at the bench
  * sf (2 000 vectors ⇒ both queries are scheduling/codegen overhead, ~0.7 s
  * warm either way — measured). This spec synthesizes a corpus at a size
  * where similarity COMPUTE dominates (16 384 vectors ⇒ 134 M brute-force
  * pairs vs ~30 K ANN candidate pairs) and asserts the crossover: warm ANN
  * wall time under half of warm brute-force wall time. */
class AnnCrossoverSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ann_lsh beats brute-force topk at a compute-bound corpus size") {
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

      // Warm both plans at the tiny sf first so one-time codegen compile
      // stays out of the comparison.
      LlmOps.simSearchAnnLsh.fn(spark, TestSpark.sf0001).count()
      LlmOps.simSearchTopk.fn(spark, TestSpark.sf0001).count()

      def timed(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime(); val c = f; (c, (System.nanoTime() - t0) / 1e9)
      }
      // Wall-clock assertion on a possibly-loaded machine: measure up to
      // twice and keep the better ratio — the compute margin (134 M vs ~30 K
      // pairs) is so wide that two consecutive flukes would mean a real
      // regression, which is exactly what should fail the build.
      def measure(): (Long, Double, Long, Double) = {
        val (annRows, annSec) = timed(LlmOps.simSearchAnnLsh.fn(spark, dir.toString).count())
        val (bruteRows, bruteSec) = timed(LlmOps.simSearchTopk.fn(spark, dir.toString).count())
        (annRows, annSec, bruteRows, bruteSec)
      }
      val first = measure()
      val (annRows, annSec, bruteRows, bruteSec) =
        if (first._2 < 0.5 * first._4) first else measure()
      info(f"n=$n: ann $annSec%.2f s ($annRows rows) vs brute $bruteSec%.2f s ($bruteRows rows)")
      assert(annRows > 0 && bruteRows > 0)
      assert(annSec < 0.5 * bruteSec,
        f"ann $annSec%.2f s is not < 0.5 x brute $bruteSec%.2f s at n=$n (after retry)")

      // The IVF family must cross over too: k-means training (a few passes
      // over n vectors) plus probe-limited search stays far under the 134 M
      // exact pairs. The brute-force baseline is the expensive half of this
      // spec, so REUSE the warm measurement from the LSH block above; only
      // the IVF side gets the retry-once treatment.
      def measureIvf(): (Long, Double) =
        timed(LlmOps.simSearchAnnIvf.fn(spark, dir.toString).count())
      val f2 = measureIvf()
      val (ivfRows, ivfSec) = if (f2._2 < 0.5 * bruteSec) f2 else measureIvf()
      info(f"n=$n: ivf $ivfSec%.2f s ($ivfRows rows) vs brute $bruteSec%.2f s (reused)")
      assert(ivfRows > 0)
      assert(ivfSec < 0.5 * bruteSec,
        f"ivf $ivfSec%.2f s is not < 0.5 x brute $bruteSec%.2f s at n=$n (after retry)")
    } finally graft.ops.Housekeeping.deleteRecursively(dir)
  }
}
