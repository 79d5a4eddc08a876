package graft

import graft.ops.PipelineOps
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the training-data pipeline trio beyond the DuckDB oracle's
  * value equality: rates/proportions land in their designed bands, split
  * decisions are content-keyed (exact duplicates never straddle a split),
  * and packing respects capacity up to single-document overflow. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("sample_stratified: per-stratum rates near design (10% en / 20% rest)") {
    import spark.implicits._
    val total = graft.tables.Tables.documents(spark, sf)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = PipelineOps.sampleStratified.fn(spark, sf)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    total.foreach { case (lang, n) =>
      val rate = kept.getOrElse(lang, 0L).toDouble / n
      val want = if (lang == "en") 0.1 else 0.2
      // small strata (64-218 docs) ⇒ wide band; the oracle pins exact values
      assert(math.abs(rate - want) < 0.12, f"$lang rate $rate%.2f vs design $want%.2f")
    }
  }

  test("split: proportions near 80/10/10 and exact duplicates share a split") {
    import spark.implicits._
    val got = PipelineOps.splitTrainValTest.fn(spark, sf)
    val byKind = got.groupBy("split").count().as[(String, Long)].collect().toMap
    val n = byKind.values.sum.toDouble
    assert(math.abs(byKind("train") / n - 0.8) < 0.08, byKind.toString)
    assert(byKind.keySet == Set("train", "val", "test"))
    // content keying: identical text ⇒ identical split
    val dupSplits = graft.tables.Tables.documents(spark, sf)
      .join(got, "doc_id")
      .groupBy("text").agg(org.apache.spark.sql.functions.countDistinct("split").as("k"))
      .where(org.apache.spark.sql.functions.col("k") > 1).count()
    assert(dupSplits == 0L, "an exact-duplicate text landed in two splits")
  }

  test("pack: bins are dense per lang and overflow is bounded by one doc") {
    import org.apache.spark.sql.functions._
    val packed = PipelineOps.packSequences.fn(spark, sf).cache()
    try {
      val bins = packed.groupBy("lang", "bin")
        .agg(sum("n_tokens").as("toks"), max("n_tokens").as("mx"))
      // a bin never exceeds capacity by more than its one overflowing doc
      assert(bins.where(col("toks") > lit(2048) + col("mx")).count() == 0L)
      // bins are consecutive from 0 per lang (no empty bins skipped)
      val gaps = bins.groupBy("lang")
        .agg(max("bin").as("mb"), countDistinct("bin").as("nb"))
        .where(col("nb") =!= col("mb") + 1).count()
      assert(gaps == 0L)
    } finally packed.unpersist()
  }
}
