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
  // 3-delivery micro-fixture (session-local conf; the bench default is 2):
  // batch 2 probes TWO standing generations, pinning multi-generation
  // accumulation and per-batch prune records beyond the minimal fixture
  private lazy val s3 = {
    val s = spark.newSession()
    s.conf.set("graft.stream.deliveries", "3")
    s
  }

  test("streamed fold equals the batch corpus build on closed input") {
    val streamed = StreamingOps.streamCorpusBuild.fn(s3, d)
      .collect().map(_.toSeq).toSeq
    val batch = PipelineOps.pipelineCorpusBuild.fn(s3, d)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("folded state keeps its primary keys under re-upload, dictionary " +
    "generations stay disjoint, batches commit idempotently") {
    StreamingOps.streamCorpusBuild.fn(s3, d).collect() // (re)build state
    val root = StreamingOps.lastRoot("corpus", d)
    assert(root != null)
    def read(sub: String) =
      s3.read.option("recursiveFileLookup", "true").parquet(s"$root/$sub")
    // docstate: exactly one row per gated doc, despite re-uploads
    val state = read("docstate")
    assert(state.groupBy("doc_id").count().where(col("count") =!= 1).isEmpty,
      "docstate must hold each doc exactly once")
    val gatedDocs = PipelineOps.corpusGate(
      graft.tables.Tables.documents(s3, d)).count()
    assert(state.count() == gatedDocs,
      "docstate must hold exactly the gated docs")
    // dictionary: generations are disjoint and union to the full raw src0
    // shingle dictionary
    val dict = read("dict")
    assert(dict.groupBy("s").count().where(col("count") =!= 1).isEmpty,
      "dictionary generations must be disjoint")
    val fullDict = graft.ops.LlmOps.shingleArrays(
        graft.tables.Tables.documents(s3, d)
          .where(col("source") === "src0").select("doc_id", "text"))
      .select(explode(col("shingles")).as("s")).distinct().count()
    assert(dict.count() == fullDict,
      "dictionary union must equal the full raw src0 shingle set")
    (0L to 2L).foreach { b =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, s"_b$b.done")),
        s"batch $b commit marker missing")
    }
  }

  test("standing state is manifest tables with zone maps: per-batch probes " +
    "prune their file lists, the pool index is inverted (round 16)") {
    StreamingOps.streamCorpusBuild.fn(s3, d).collect() // (re)build state
    val root = StreamingOps.lastRoot("corpus", d)
    // all three standing tables committed three stats-covered versions
    Seq("docstate" -> "doc_id", "dict" -> "skey", "shingles" -> "skey").foreach {
      case (sub, statsCol) =>
        val p = java.nio.file.Paths.get(root, sub)
        val (version, files) = ops.TableManifest.read(p)
        assert(version == 3, s"$sub: three deliveries must commit three versions: $version")
        val stats = ops.TableManifest.statsOf(p, version)
        assert(files.forall(stats.contains), s"$sub: every file must carry $statsCol stats")
    }
    // the pool index is EXPLODED (skey, s, doc_id) — the inverted layout
    // whose probe cost is ∝ hits, never ∝ pool
    val pool = s3.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/shingles")
    assert(pool.columns.toSet == Set("doc_id", "s", "skey"),
      s"pool index must be inverted rows: ${pool.columns.mkString(",")}")
    // batches 1 and 2 recorded every standing-side prune they ran (on this
    // toy fixture the probe point sets are large relative to 8-file
    // generations, so the fractions are 1.0 — the GEOMETRY that makes them
    // shrink at scale is pinned by the single-point probes below)
    val pruned = (1L to 2L).flatMap { b =>
      Seq("state", "dict", "hits", "reval").flatMap { tag =>
        Option(StreamingOps.lastRoot(s"corpus_prune_${tag}_b$b", d)).map { rec =>
          val Array(p, t) = rec.split("/").map(_.toInt)
          assert(t > 0 && p <= t, s"batch $b $tag prune $rec")
          tag
        }
      }
    }
    Seq("state", "dict", "hits", "reval").foreach(tag =>
      assert(pruned.contains(tag), s"the $tag prune must have run: $pruned"))
    // zone-map geometry: a SINGLE point probes ≤ ~1 file per generation of
    // each clustered standing table — a small batch probing a 100 TB
    // standing table reads a vanishing file fraction
    Seq("docstate", "dict", "shingles").foreach { sub =>
      val p = java.nio.file.Paths.get(root, sub)
      val (version, files) = ops.TableManifest.read(p)
      val stats = ops.TableManifest.statsOf(p, version)
      val pt = stats.values.head._1
      val hit = ops.TableManifest.pruneForPoints(files, stats, Seq(pt))
      assert(hit.nonEmpty && hit.size < files.size,
        s"$sub: a single-point prune must skip files: ${hit.size} of ${files.size}")
      assert(ops.TableManifest.pruneForPoints(files, stats, Nil).isEmpty)
    }
  }

  test("revalidation work scales with HITS, not pool size: a fixed probe " +
    "touches the same file count against a 10x pool (DedupScaleSpec idiom)") {
    // two synthetic inverted pool indexes in the op's exact layout —
    // (skey, s, doc_id) range-clustered on skey, footer zone maps — one 10x
    // the other, at matched file granularity (rows per file held constant)
    def build(n: Long, parts: Int): (java.nio.file.Path, Seq[java.nio.file.Path],
        Map[java.nio.file.Path, (Long, Long)]) = {
      val root = ops.Housekeeping.scratchDir(s"reval_scale_$n")
      val df = spark.range(n).select(col("id").as("doc_id"),
          concat(lit("tok"), pmod(col("id"), lit(997))).as("s"))
        .withColumn("skey", StreamingOps.shingleBucketKey(col("s")))
      StreamingOps.commitClusteredGen(df, s"$root/b0", root, 1, "skey",
        Nil, Map.empty, parts)
      val (v, files) = ops.TableManifest.read(root)
      (root, files, ops.TableManifest.statsOf(root, v))
    }
    val (rootS, filesS, statsS) = build(2000L, 8)
    val (rootB, filesB, statsB) = build(20000L, 80)
    try {
      assert(filesB.size >= filesS.size * 8, "the 10x pool must carry ~10x files")
      // the probe: one new dictionary shingle's bucket key (the reval
      // point-set shape) — pruned I/O must NOT grow with the pool
      val pts = Seq(StreamingOps.MinhashBuckets / 2L)
      val prunedS = ops.TableManifest.pruneForPoints(filesS, statsS, pts)
      val prunedB = ops.TableManifest.pruneForPoints(filesB, statsB, pts)
      assert(prunedS.size <= 2 && prunedB.size <= 2,
        s"a single bucket point must touch <= 2 clustered files: " +
          s"${prunedS.size} vs ${prunedB.size}")
      info(s"pool 2k: ${prunedS.size}/${filesS.size} files; " +
        s"pool 20k: ${prunedB.size}/${filesB.size} files")
    } finally Seq(rootS, rootB).foreach(ops.Housekeeping.deleteRecursively)
  }
}
