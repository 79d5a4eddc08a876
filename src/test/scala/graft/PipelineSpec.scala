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

  /** The composite corpus-build job must agree with its standalone stages:
    * its total document count equals what the individual quality, dedup,
    * and decontamination ops independently predict for the same corpus. */
  test("pipeline_corpus_build totals equal the standalone stages' composition") {
    import org.apache.spark.sql.functions._
    val docs = graft.tables.Tables.documents(spark, sf)
    val quality = graft.ops.LlmOps.textQualityFilter.fn(spark, sf)
      .where(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val meta = docs.select(col("doc_id"), col("source"), md5(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // dedup keepers among quality survivors: min doc_id per content hash
    val keepers = meta.filter(m => quality(m._1)).groupBy(_._3)
      .map { case (_, ms) => ms.map(_._1).min }.toSet
    // training pool: keepers outside the eval source
    val pool = meta.filter(m => keepers(m._1) && m._2 != "src0").map(_._1).toSet
    // contamination flags from the standalone op (per-doc fraction is
    // doc-local given the src0 dictionary, so they transfer to the subset)
    val contaminated = graft.ops.LlmOps.dedupDecontaminate.fn(spark, sf)
      .where(col("contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    graft.ops.Housekeeping.releaseAll()
    val expected = (pool -- contaminated).size.toLong
    val got = PipelineOps.pipelineCorpusBuild.fn(spark, sf)
      .agg(sum("n_docs")).first().getLong(0)
    graft.ops.Housekeeping.releaseAll()
    assert(got == expected, s"composite n_docs $got != standalone composition $expected")
  }

  test("sample_weighted_hash: deterministic, exact vs an MD5 recompute, full weights kept") {
    import spark.implicits._
    val sf = TestSpark.sf0001
    val run1 = PipelineOps.sampleWeightedHash.fn(spark, sf).as[(Long, Long)].collect().toSeq
    val run2 = PipelineOps.sampleWeightedHash.fn(spark, sf).as[(Long, Long)].collect().toSeq
    assert(run1 == run2, "hash-thresholded sample must be bit-identical across runs")
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text", "n_chars").as[(Long, String, Long)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = docs.flatMap { case (id, text, nChars) =>
      val ppm = math.min(1000000L, nChars * 2000)
      val hex = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(6)
      val thr = f"${ppm * 16777216L / 1000000L}%06x".takeRight(6)
      if (nChars * 2000 >= 1000000L || hex < thr) Some((id, ppm)) else None
    }.toSeq.sortBy(_._1)
    assert(run1 == expected)
    // the sample is a real subset and every full-weight doc survives
    assert(expected.size < docs.length, "fixture degenerate: nothing was sampled out")
    val fullWeight = docs.collect { case (id, _, n) if n * 2000 >= 1000000L => id }.toSet
    assert(fullWeight.subsetOf(run1.map(_._1).toSet), "full-weight docs must always be kept")
    assert(fullWeight.nonEmpty && expected.size > fullWeight.size,
      "fixture degenerate: sample adds nothing beyond full-weight docs")
  }

  test("embed_gram_exact matches a driver-side integer recompute and Cauchy-Schwarz") {
    import spark.implicits._
    val got = PipelineOps.embedGramExact.fn(spark, TestSpark.sf0001)
      .as[(Int, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val vecs = graft.tables.Tables.embeddings(spark, TestSpark.sf0001)
      .select("embedding").as[Seq[Float]].collect()
    val dim = vecs.head.length
    val quant = vecs.map { v =>
      val d = v.map(_.toDouble).toArray
      val maxabs = d.map(math.abs).max
      val scale = if (maxabs == 0) 0.0 else 127.0 / maxabs
      d.map(x => math.floor(x * scale + 0.5).toLong)
    }
    val expected = (for (i <- 1 to dim; j <- i to dim) yield
      (i, j) -> quant.map(q => q(i - 1) * q(j - 1)).sum).toMap
    assert(got == expected)
    assert(got.size == dim * (dim + 1) / 2)
    for (i <- 1 to dim; j <- i to dim) {
      val (dii, djj, dij) = (got((i, i)), got((j, j)), got((i, j)))
      assert(dij.toDouble * dij <= dii.toDouble * djj * (1 + 1e-12), s"CS violated at ($i,$j)")
    }
  }
}
