package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** SURVEY.md §2 category K — LLM-data-pipeline operators over the
  * `documents` / `embeddings` tables: dedup (exact + MinHash-LSH near-dup),
  * similarity search, text analysis, and the multimodal-column join.
  *
  * Scale notes (100 TB):
  *  - exact dedup is a hash groupBy → two-phase aggregate, shuffle = one row
  *    per distinct hash;
  *  - MinHash-LSH is the scale path for near-dedup: candidate generation is
  *    an equi-join on (band, band_hash) buckets — shuffle proportional to
  *    bucket sizes, never the n² pair space; only candidates pay the exact
  *    Jaccard verification;
  *  - brute-force cosine top-k is the correctness baseline; the KNN variant
  *    broadcasts the (small) query set so the big side streams through one
  *    stage. A production ANN would LSH/IVF-bucket the embedding column the
  *    same way MinHash buckets shingles (§4.3, designed-not-built);
  *  - all similarity math uses fixed left-to-right fold order
  *    (aggregate/zip_with), so doubles are deterministic.
  */
object LlmOps {

  // ---------------------------------------------------------------- dedup

  val dedupExact: Op = Op(
    "dedup_exact",
    (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), (count(lit(1)) - 1).as("n_dups"))
        .orderBy("h"),
    Some("SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) - 1 AS n_dups " +
      "FROM documents GROUP BY 1 ORDER BY h"))

  /** Order-insensitive exact dedup: the dedup key is the hash of the SORTED
    * token multiset (bag of words), so documents that differ only by word
    * order — shuffled scrapes, re-serialized field orders — collapse into one
    * group where byte-exact dedup sees distinct texts. The raw corpus has no
    * bag-duplicates, so the op derives its own adversarial input the way the
    * incremental ops derive their deltas: every doc_id ≡ 0 mod 7 also
    * contributes a word-REVERSED copy (doc_id + 1 000 000) — each such copy
    * must collapse onto its original (keep = min doc_id = the original),
    * which the oracle proves group by group.
    *
    * Scale notes (100 TB): identical shape to [[dedupExact]] — per-row
    * sort+hash in the scan projection (token sort is per-doc CPU, no
    * shuffle), then one two-phase groupBy on the 16-byte bag hash. */
  val dedupBagOfWords: Op = Op(
    "dedup_bag_of_words",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val scrambled = docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          array_join(reverse(split(col("text"), " ")), " ").as("text"))
      docs.unionAll(scrambled)
        .groupBy(md5(array_join(array_sort(split(col("text"), " ")), " ")).as("bag_h"))
        .agg(min(col("doc_id")).as("keep_id"), (count(lit(1)) - 1).as("n_dups"))
        .orderBy("bag_h")
    },
    Some("WITH u AS (SELECT doc_id, text FROM documents UNION ALL " +
      "SELECT doc_id + 1000000, array_to_string(list_reverse(string_split(text, ' ')), ' ') " +
      "FROM documents WHERE doc_id % 7 = 0) " +
      "SELECT md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS bag_h, " +
      "MIN(doc_id) AS keep_id, COUNT(*) - 1 AS n_dups FROM u GROUP BY 1 ORDER BY bag_h"))

  /** Incremental snapshot dedup — the shape a standing 100 TB corpus
    * actually runs: a small DELTA of new uploads (here doc_id ≡ 0 mod 5, the
    * "new snapshot") checked against the big standing CORPUS (the rest), not
    * all-pairs over everything. Spelled as a left join of the delta against
    * the corpus's distinct content-hash index: at width the hash index is a
    * bucketed table on disk and only the delta shuffles — cost ∝ delta, not
    * corpus. Emits the keep/drop verdict per delta doc. */
  val dedupIncrementalExact: Op = Op(
    "dedup_incremental_exact",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val corpusIdx = docs.where(col("doc_id") % 5 =!= 0)
        .select(md5(col("text")).as("h")).distinct()
        .withColumn("dup", lit(true))
      docs.where(col("doc_id") % 5 === 0)
        .withColumn("h", md5(col("text")))
        .join(corpusIdx, Seq("h"), "left")
        .select(col("doc_id"), coalesce(col("dup"), lit(false)).as("dup_of_corpus"))
        .orderBy("doc_id")
    },
    Some("SELECT doc_id, EXISTS (SELECT 1 FROM documents c WHERE c.doc_id % 5 <> 0 " +
      "AND md5(c.text) = md5(n.text)) AS dup_of_corpus " +
      "FROM documents n WHERE n.doc_id % 5 = 0 ORDER BY doc_id"))

  /** Deterministic MinHash: shingles hash once via xxhash64; the 64
    * permutations are the fused codegen loop in
    * [[graft.functions.MinHashSig]] (fixed SplitMix64-derived seeds). */
  private val NumPerm = 64
  private val Bands = 16
  private val RowsPerBand = NumPerm / Bands

  private def shingled(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    docs
      .withColumn("words", words)
      .where(size(col("words")) >= 3)
      .withColumn("shingles", array_distinct(
        transform(sequence(lit(0), size(col("words")) - 3), i =>
          concat_ws(" ", element_at(col("words"), i + 1),
            element_at(col("words"), i + 2), element_at(col("words"), i + 3)))))
  }

  private def withSignature(docs: DataFrame): DataFrame =
    docs
      .withColumn("hs", transform(col("shingles"), sh => xxhash64(sh)))
      .withColumn("sig", graft.functions.GraftFunctions.minhashSig(col("hs"), NumPerm))

  /** Signature+shingle table, materialized once: the table is tiny (one row
    * per doc) but its expression tree is big, and it feeds three join
    * branches — uncached, Spark inlines the tree into every branch and pays
    * codegen + recompute per copy. At 100 TB this is "write the signature
    * table once, then join against it". */
  private def signedBase(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    Housekeeping.cacheBounded("minhash_base",
      withSignature(shingled(docs.select("doc_id", "text")))
        .select(col("doc_id"), col("shingles"), col("sig")))
  }

  /** (doc_id, band, band-hash) LSH bucket rows for a signature table — the
    * band index. At width this is the standing table a pipeline persists
    * bucketed by (band, bh); here it is derived in-plan from the signature
    * base. Shared by the self-join candidate stage and the incremental
    * delta-probe stage. */
  private def bandBuckets(base: DataFrame): DataFrame = {
    val bandCols = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b) +: (0 until RowsPerBand).map(r =>
          element_at(col("sig"), b * RowsPerBand + r + 1)): _*).as("bh"))
    }
    base
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** One micro-batch's contribution to a STANDING MinHash index — the
    * (doc_id, shingles, sig) base computed once for the batch (the caller
    * caches/unpersists around its uses). Same fixed-seed signatures and
    * banding as [[nearDupPairs]], so all recall arguments carry over; used
    * by `stream_dedup_minhash`'s foreachBatch index maintenance. */
  def minhashBatchBase(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    withSignature(shingled(docs.select("doc_id", "text")))
      .select(col("doc_id"), col("shingles"), col("sig"))
  }

  /** The (doc_id, band, bh) LSH bucket rows of a signature base — what the
    * streaming op appends to its standing band index each micro-batch. */
  def minhashBands(base: DataFrame): DataFrame = bandBuckets(base)

  /** LSH banding candidate generation over a signature table: distinct
    * (doc_a, doc_b) pairs sharing at least one (band, band-hash) bucket —
    * exactly the rows that pay an exact Jaccard verification. */
  private def candidatesFrom(base: DataFrame): DataFrame = {
    val buckets = bandBuckets(base)
    buckets.as("l").join(buckets.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** The WORK of the bucketed near-dup plan — candidate pairs before
    * verification. Exposed (like [[lshCandidates]]/[[ivfCandidates]]) so
    * DedupScaleSpec can assert candidate count grows ~linearly with planted
    * duplicates instead of quadratically with the corpus. */
  def minhashCandidates(docs: DataFrame): DataFrame = candidatesFrom(signedBase(docs))

  /** Near-duplicate pairs via MinHash + LSH banding, verified by exact
    * Jaccard >= 0.8 on shingle sets. Fixed seeds (the permutation index)
    * make the whole pipeline byte-deterministic (SURVEY §7.4#5).
    * Core of dedup_near_minhash, exposed for the planted-duplicates fixture
    * (NearDupSpec). Input: (doc_id, text). */
  def nearDupPairs(docs: DataFrame): DataFrame = {
      val base = signedBase(docs)
      val cand = candidatesFrom(base)
      val sh = base.select(col("doc_id"), col("shingles"))
      cand
        .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))))
        .where(col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
  }

  /** Oracle note: the OUTPUT of this op is exact — every emitted pair is
    * verified by exact Jaccard on shingle sets, and a pair at J ≥ 0.8 escapes
    * all 16 bands with probability (1−0.8⁴)¹⁶ ≈ 2·10⁻⁴ per pair; with fixed
    * seeds the escape set is deterministic, and NearDupSpec proves it is
    * EMPTY on every test corpus (recall parity against the exact shingle
    * self-join at threshold 0.8, asserted at sf0.001/0.01/0.1). That makes
    * the exact pair CTE a valid hash oracle: candidates are where the
    * approximation lives, and on these corpora it misses nothing. The
    * Jaccard double is one IEEE division of identical exact integers on both
    * engines, so values hash-match bit-for-bit. */
  val dedupNearMinhash: Op = Op(
    "dedup_near_minhash",
    (s, d) => nearDupPairs(Tables.documents(s, d)),
    Some("WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
      "g AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(w) - 2), " +
      "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s FROM t WHERE len(w) >= 3), " +
      "sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY 1), " +
      "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter FROM g a " +
      "JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "j AS (SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS jaccard " +
      "FROM p JOIN sz na ON na.doc_id = doc_a JOIN sz nb ON nb.doc_id = doc_b " +
      "WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.8) " +
      "SELECT doc_a, doc_b, jaccard FROM j ORDER BY doc_a, doc_b"))

  /** Incremental NEAR-dup: the MinHash-LSH spelling of
    * [[dedupIncrementalExact]] — a small DELTA of new uploads probed against
    * the standing corpus's band index, never all-pairs over the union.
    * Exposed for the planted-duplicates fixture in NearDupSpec. Same
    * fixed-seed signatures and banding as [[nearDupPairs]], so the recall
    * argument (and NearDupSpec's recall-1.0 proof at J ≥ 0.8) carries over
    * unchanged: a delta×corpus pair shares a (band, band-hash) bucket under
    * exactly the same condition as in the full self-join — banding is
    * per-document and symmetric.
    *
    * Scale shape (100 TB): the corpus band index is the standing table —
    * written once, bucketed by (band, bh) on disk (the sink_bucketed_join
    * layout), signatures never recomputed; per increment only the delta is
    * shingled/signed/banded, and the bucket equi-join shuffles delta-sized
    * rows against the co-located index. Cost ∝ delta, not corpus — the same
    * contract as the exact incremental op. */
  private def incBases(delta: DataFrame, corpus: DataFrame): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(delta.sparkSession)
    // Two signature bases (cache barriers for the same plan-branch recompute
    // reason as nearDupPairs'): each feeds its band explode AND the shingle
    // side of the verification joins.
    (Housekeeping.cacheBounded("minhash_inc_delta",
        withSignature(shingled(delta.select("doc_id", "text")))
          .select(col("doc_id"), col("shingles"), col("sig"))),
      Housekeeping.cacheBounded("minhash_inc_corpus",
        withSignature(shingled(corpus.select("doc_id", "text")))
          .select(col("doc_id"), col("shingles"), col("sig"))))
  }

  private def candidatesBetween(deltaBase: DataFrame, corpusBase: DataFrame): DataFrame =
    bandBuckets(deltaBase).as("l")
      .join(bandBuckets(corpusBase).as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          // a doc present in BOTH delta and corpus (overlapping snapshots)
          // would otherwise pair with itself at jaccard 1.0 — guard here so
          // the public incremental API needs no disjointness precondition
          col("l.doc_id") =!= col("r.doc_id"))
      .select(col("l.doc_id").as("doc_id"), col("r.doc_id").as("dup_of"))
      .distinct()

  /** The WORK of the incremental probe — (delta, corpus) candidate pairs
    * before verification, exposed so DedupScaleSpec can assert the count
    * tracks the delta, not the corpus. */
  def incrementalCandidates(delta: DataFrame, corpus: DataFrame): DataFrame = {
    val (deltaBase, corpusBase) = incBases(delta, corpus)
    candidatesBetween(deltaBase, corpusBase)
  }

  def incrementalNearDupPairs(delta: DataFrame, corpus: DataFrame): DataFrame = {
    val (deltaBase, corpusBase) = incBases(delta, corpus)
    candidatesBetween(deltaBase, corpusBase)
      .join(deltaBase.select(col("doc_id"), col("shingles").as("sh_a")), "doc_id")
      .join(corpusBase.select(col("doc_id").as("dup_of"), col("shingles").as("sh_b")), "dup_of")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= 0.8)
      .select("doc_id", "dup_of", "jaccard")
      .orderBy("doc_id", "dup_of")
  }

  /** Delta = doc_id ≡ 0 mod 5 (the same "new snapshot" split as
    * dedup_incremental_exact); corpus = the rest. Oracle: the exact
    * delta×corpus Jaccard pairs at ≥ 0.8 — valid for the same reason as
    * dedup_near_minhash's (verification is exact; candidate recall proven
    * 1.0 at this threshold; the Jaccard double is one IEEE division of
    * identical exact integers on both engines). */
  val dedupIncrementalMinhash: Op = Op(
    "dedup_incremental_minhash",
    (s, d) => {
      val docs = Tables.documents(s, d)
      incrementalNearDupPairs(
        docs.where(col("doc_id") % 5 === 0), docs.where(col("doc_id") % 5 =!= 0))
    },
    Some("WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
      "g AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(w) - 2), " +
      "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s FROM t WHERE len(w) >= 3), " +
      "sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY 1), " +
      "p AS (SELECT a.doc_id AS doc_id, b.doc_id AS dup_of, COUNT(*) AS inter FROM g a " +
      "JOIN g b ON a.s = b.s AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0 GROUP BY 1, 2), " +
      "j AS (SELECT p.doc_id, dup_of, CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS jaccard " +
      "FROM p JOIN sz na ON na.doc_id = p.doc_id JOIN sz nb ON nb.doc_id = dup_of " +
      "WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.8) " +
      "SELECT doc_id, dup_of, jaccard FROM j ORDER BY doc_id, dup_of"))

  /** The (doc_id, sig) SimHash signature table: 64-bit signature via bit
    * voting over shingle hashes ([[graft.functions.SimHash64]]). This is the
    * stage a production pipeline PERSISTS (signatures are tiny and reusable
    * across dedup runs); [[dedupSimhash]] writes it to parquet and both the
    * banding and the DuckDB oracle read it back. */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    shingled(docs.select("doc_id", "text"))
      .withColumn("hs", transform(col("shingles"), sh => xxhash64(sh)))
      .withColumn("sig", graft.functions.GraftFunctions.simhash64(col("hs")))
      .select("doc_id", "sig")
  }

  /** SimHash near-dedup: candidates from 8×8-bit chunk banding over a
    * MATERIALIZED signature table (Hamming ≤ 7 ⇒ at least one chunk
    * identical — pigeonhole), verified by bit_count(xor) ≤ 7. The threshold
    * suits this corpus's feature-set sizes (hundreds of shingles → a
    * one-word edit moves ~4 signature bits; an unrelated pair sits at ~32).
    * Deterministic; planted fixture in TextSpec; recall parity vs the exact
    * all-pairs Hamming set proven in SimhashRecallSpec. Scale shape = same
    * bucket-join as MinHash-LSH. */
  def simhashPairsFromSigs(base: DataFrame): DataFrame = {
    val chunkCols = (0 until 8).map { c =>
      struct(lit(c).as("band"),
        expr(s"shiftrightunsigned(sig, ${8 * c}) & 255").as("bh"))
    }
    val rawBuckets = base
      .select(col("doc_id"), col("sig"), explode(array(chunkCols: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    // Hot-bucket guard (round-9 upgrade of the former >64-member cap, which
    // silently DROPPED hot buckets — recall-unsound beyond the sfs where
    // SimhashRecallSpec had proved the dropped set empty): the banding's
    // join cost is Σ bsz·(bsz−1)/2 over (band, value) buckets, and a
    // pathologically homogeneous corpus can make one bucket quadratic.
    // Instead of losing recall, price the pair space at plan time from the
    // ≤ 8×256-row bucket-size table (one tiny agg job) and refuse loudly
    // over budget — the same `graft.pair.budget` contract as the
    // declared-exact pair ops. Within budget the banding is EXACT by
    // pigeonhole at EVERY sf, which is what licenses the all-pairs DuckDB
    // oracle with no sf envelope.
    val pairSpace = rawBuckets.groupBy("band", "bh").agg(count(lit(1)).as("bsz"))
      .agg(coalesce(sum(expr("bsz * (bsz - 1) DIV 2")), lit(0L)).as("p"))
      .first().getLong(0)
    val budget = base.sparkSession.conf
      .get(PairBudgetConf, PairBudgetDefault.toString).toLong
    require(pairSpace <= budget,
      s"simhash banding refused: bucket pair space $pairSpace exceeds $PairBudgetConf=" +
        s"$budget (pathologically homogeneous corpus — hot buckets dominate). " +
        "Pre-cluster or shard the corpus, or set the budget explicitly to accept the cost.")
    val buckets = rawBuckets.select("doc_id", "sig", "band", "bh")
    buckets.as("l").join(buckets.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))).as("hamming"))
      .where(col("hamming") <= 7) // filter before distinct: shrink the dedup input
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** [[simhashPairsFromSigs]] over an in-memory signature base — kept for
    * the synthetic-fixture specs. The cache is the barrier that stops the
    * signature subtree being inlined into the bucket-size aggregate and both
    * sides of the self-join (same recompute trap as nearDupPairs' base). */
  def simhashPairs(docs: DataFrame): DataFrame =
    simhashPairsFromSigs(
      Housekeeping.cacheBounded("simhash_base", simhashSignatures(docs)))

  /** sf-scoped staging path for the persisted signature table — written by
    * the query, read by both the banding and the DuckDB oracle; deliberately
    * outside Housekeeping so Verify's releaseAll() can't delete it before
    * the oracle pass (same [[Stage]] pattern as SourceSinkOps.csvStagePath). */
  def simhashStagePath(sfDir: String): String = Stage.root(sfDir) + "/simhash_sigs"

  /** Oracle note (the round-7 minhash playbook, adapted): the emitted pairs
    * are EXACT given the signatures — every pair is verified by
    * bit_count(xor) ≤ 7, the banding loses nothing by pigeonhole (≤ 7
    * flipped bits cannot touch all 8 chunks), and since round 9 no bucket
    * is ever dropped: a hot-bucket pair-space budget guard refuses a
    * pathological corpus loudly instead of silently capping (see
    * [[simhashPairsFromSigs]]), so the ALL-PAIRS Hamming oracle is valid at
    * every sf that runs, not just the spec-proven ones
    * (SimhashRecallSpec keeps the parity proof as a regression:
    * banded == exact at sf0.001/0.01/0.1, measured 25/22/234 pairs).
    * The signature FUNCTION itself (xxhash64 +
    * bit voting) is engine-specific and therefore inside the staged table,
    * not re-derived by DuckDB — it is covered by FunctionsSpec unit tests;
    * what the oracle independently verifies is everything downstream of the
    * signatures: banding recall, the cap, the join, and the Hamming values.
    * bit_count/xor on signed int64 agree bit-for-bit across engines. */
  val dedupSimhash: Op = Op(
    "dedup_simhash",
    (s, d) => {
      simhashSignatures(Tables.documents(s, d))
        .write.mode("overwrite").parquet(simhashStagePath(d))
      simhashPairsFromSigs(s.read.parquet(simhashStagePath(d)))
    },
    Some("WITH s AS (SELECT doc_id, sig FROM " +
      s"read_parquet('${Stage.token}/simhash_sigs/*.parquet')) " +
      "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
      "CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming " +
      "FROM s a JOIN s b ON a.doc_id < b.doc_id " +
      "WHERE bit_count(xor(a.sig, b.sig)) <= 7 ORDER BY doc_a, doc_b"))

  /** A shingle present in more than this many documents carries no near-dup
    * evidence (it's corpus boilerplate) but drives the self-join fan-out
    * quadratically — df² pairs per hot shingle. Dropping hot shingles from
    * BOTH the intersection and the per-doc sizes keeps Jaccard self-consistent
    * over the filtered shingle universe; the oracle applies the identical
    * cutoff. At the test sfs no shingle exceeds df 25 (measured), so the
    * result equals the unfiltered computation there — the guard exists for
    * the 100 TB corpus where one boilerplate shingle would otherwise fan out
    * to ~10¹⁰ pairs. */
  val NgramMaxDf = 100

  /** Exploded (doc_id, shingle) rows — the shared shingling of every dedup
    * op, exposed (with [[NgramMaxDf]]) for DedupScaleSpec's work-count
    * assertions over the shingle document-frequency table.
    *
    * CAUTION (measured in ngramPairs, §7.2): exploding an UNCACHED shingle
    * array lets InferFiltersFromGenerate re-derive the whole O(words²)
    * shingle tree inside the injected not-null/size filter. Consumers that
    * explode more than trivially should cache [[shingleArrays]] first. */
  def shingleRows(docs: DataFrame): DataFrame =
    shingled(docs.select("doc_id", "text"))
      .select(col("doc_id"), explode(col("shingles")).as("s"))

  /** Per-doc distinct shingle ARRAYS (doc_id, shingles) — the cache-barrier
    * form consumers should materialize before exploding (see the
    * InferFiltersFromGenerate note on [[shingleRows]]). */
  def shingleArrays(docs: DataFrame): DataFrame =
    shingled(docs.select("doc_id", "text")).select(col("doc_id"), col("shingles"))

  /** Exact n-gram Jaccard near-dedup — fully relational (shingle-array per
    * doc → explode → document-frequency cutoff → equi-join on shingle →
    * shared counts → Jaccard), so the oracle can mirror it with DuckDB list
    * lambdas.
    *
    * The per-doc shingle ARRAY (not the exploded rows) is what's cached:
    * Catalyst's InferFiltersFromGenerate injects a
    * `size(shingles)>0 AND isnotnull(shingles)` filter under the explode, and
    * without the cache barrier that filter re-derives the whole shingle tree
    * with `split(text)` inlined into every element_at — an O(words²)-per-doc
    * blowup (measured 12× on this query at sf0.1). Against the materialized
    * array the injected filter is O(1), and per-doc sizes come straight from
    * `size(shingles)` with no shuffle. */
  /** (doc_a, doc_b, jaccard) near-dup pairs at threshold 0.5 — the shared
    * core of `dedup_ngram_jaccard` (which just orders it) and
    * `dedup_cluster_keep` (which runs connected components over it); takes
    * the documents frame directly so DedupScaleSpec can drive it with a
    * synthetic boilerplate corpus. */
  def ngramPairs(docs: DataFrame): DataFrame = {
    val base = Housekeeping.cacheBounded("ngram_shingles",
      shingled(docs.select("doc_id", "text"))
        .select(col("doc_id"), col("shingles")))
    val exploded = base.select(col("doc_id"), explode(col("shingles")).as("s"))
    // df-cutoff: the skew guard — see NgramMaxDf. One groupBy over the
    // exploded rows; then the occurrences are filtered by ANTI-joining the
    // HOT set (df > cutoff) rather than inner-joining the COOL set: by Zipf,
    // shingles above any df cutoff are the vocabulary HEAD — a tiny fraction
    // of distinct shingles — so the join's small side shrinks from
    // ~all-distinct-shingles to the head (guide §2.3, shuffle fewer bytes;
    // §3.1 — AQE sees the aggregate's true size and picks a broadcast anti
    // join at runtime, leaving the occurrence side unshuffled). Every
    // shingle is either hot or cool, so the anti-join keeps exactly the
    // rows the cool inner join kept. NULL-semantics caveat: left_anti KEEPS
    // null-keyed rows an inner join would drop — row-identical here only
    // because `s` is never null (shingles are concat_ws over split() words,
    // and explode of the non-null array yields non-null elements).
    // The cutoff result feeds THREE plan branches (per-doc sizes + both
    // sides of the self-join): materialize it once or the explode + groupBy
    // + anti-join subtree executes three times (same plan-branch recompute
    // trap as the shingle arrays themselves, one level up).
    val sh = Housekeeping.cacheBounded("ngram_cool",
      exploded.join(
        exploded.groupBy("s").agg(count(lit(1)).as("df")).where(col("df") > NgramMaxDf)
          .select("s"), Seq("s"), "left_anti"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** The oracle-side spelling of [[ngramPairs]], as CTEs ending in
    * `j(doc_a, doc_b, jaccard)` — shared by the two ops the same way. */
  private val ngramPairCtes: String =
    "t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
      "g0 AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(w) - 2), " +
      "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s FROM t WHERE len(w) >= 3), " +
      s"g AS (SELECT doc_id, s FROM g0 WHERE s IN (SELECT s FROM g0 GROUP BY 1 HAVING COUNT(*) <= $NgramMaxDf)), " +
      "sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY 1), " +
      "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter FROM g a " +
      "JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "j AS (SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS jaccard " +
      "FROM p JOIN sz na ON na.doc_id = doc_a JOIN sz nb ON nb.doc_id = doc_b " +
      "WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5)"

  /** The pair stage is SHARED with dedup_cluster_keep through a
    * materialization memo ([[Housekeeping.memoPut]]): the jaccard query is
    * the producer — it always recomputes and writes the pair table (the
    * materialization cost stays inside its own measurement), cluster_keep
    * reads it back instead of re-running the shingle self-join. Exactly the
    * production shape: one near-dup pair table on disk, several consumers.
    * Values survive the parquet round-trip bit-identically (exact IEEE
    * doubles), so both the memo-hit and memo-miss paths hash identically. */
  private def ngramMemoKey(d: String) = s"ngram_pairs_v1|$d"

  val dedupNgramJaccard: Op = Op(
    "dedup_ngram_jaccard",
    (s, d) => {
      val path = Housekeeping.memoPut("ngram_pairs", ngramMemoKey(d),
        dir => ngramPairs(Tables.documents(s, d)).write.mode("overwrite")
          .parquet(dir.resolve("pairs").toString))
      s.read.parquet(path.resolve("pairs").toString).orderBy("doc_a", "doc_b")
    },
    Some(s"WITH $ngramPairCtes SELECT doc_a, doc_b, jaccard FROM j ORDER BY doc_a, doc_b"))

  /** The end of the near-dup pipeline: the KEEP decision. Near-dup pairs form
    * a graph; what a 100 TB dedup job actually emits is one survivor per
    * connected component (keep the smallest doc_id, drop the rest). Min-label
    * propagation to fixpoint: every node starts labeled with itself, each
    * round takes the min of its own and its neighbors' labels — converges in
    * diameter rounds to the component minimum, each round one equi-join +
    * min-aggregate (the classic iterative-CC shape; at extreme graph sizes
    * you'd switch to large-star/small-star to cut round count, same join
    * primitives). The convergence check collects ONE number per round; near-dup
    * components are shallow (dup groups, diameter ≤ a handful), so rounds stay
    * single-digit at any corpus size. Oracle: DuckDB WITH RECURSIVE reaches
    * the identical fixpoint (min over reachable labels = component min). */
  /** Connected-components keep decision over an undirected (doc_a, doc_b)
    * pair list — the core of dedup_cluster_keep, exposed for the planted
    * transitive-chain fixture in ClusterKeepSpec.
    *
    * Each round's plan references the previous labels twice (join + union),
    * so WITHOUT lineage truncation the logical tree doubles per round and
    * Catalyst analysis goes exponential long before execution does (a path
    * graph of diameter 9 already hangs planning). `localCheckpoint` — the
    * standard iterative-algorithm pattern — materializes each round and cuts
    * the lineage flat; on a cluster you would use reliable `checkpoint()` if
    * executor loss mid-train matters. */
  def ccKeep(pr: DataFrame): DataFrame = {
    val edges = Housekeeping.cacheBounded("cc_edges",
      pr.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pr.select(col("doc_b").as("src"), col("doc_a").as("dst"))))
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .transform(Housekeeping.iterationBarrier)
    // labels only ever DECREASE under min-propagation, so the label sum is
    // strictly decreasing until fixpoint — convergence is one overflow-safe
    // aggregate per round, not a join. (The one number collected per round.)
    // sum over an EMPTY frame is SQL NULL — null-guard it or an empty pair
    // list (no near-dups in the corpus) NPEs on the compareTo below.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("label").cast("decimal(38,0)")).as("s")).first().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var cur = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < 64) {
      iter += 1
      val next = edges.join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("label"))
        .union(labels)
        .groupBy("node").agg(min("label").as("label"))
        .transform(Housekeeping.iterationBarrier)
      val ns = labelSum(next)
      labels = next
      converged = ns.compareTo(cur) == 0
      cur = ns
    }
    // Silent truncation would emit labels that are NOT the component minima
    // (multiple "survivors" per component) and quietly diverge from the
    // oracle's true fixpoint — refuse instead. 64 rounds covers any
    // realistic near-dup component diameter; a corpus that exceeds it needs
    // the large-star/small-star recurrence, not a bigger cap.
    require(converged,
      s"connected-components min-label propagation did not converge in $iter rounds")
    labels.select(col("node").as("doc_id"), col("label").as("keep_id"))
      .orderBy("doc_id")
  }

  val dedupClusterKeep: Op = Op(
    "dedup_cluster_keep",
    (s, d) => ccKeep(
      // consumer side of the shared pair stage (see dedupNgramJaccard): read
      // the materialized pair table when its inputs match, else compute
      Housekeeping.memoGet("ngram_pairs", ngramMemoKey(d))
        .map(p => s.read.parquet(p.resolve("pairs").toString))
        .getOrElse(ngramPairs(Tables.documents(s, d)))),
    Some(s"WITH RECURSIVE $ngramPairCtes, " +
      "e AS (SELECT doc_a AS src, doc_b AS dst FROM j UNION ALL SELECT doc_b, doc_a FROM j), " +
      "cc(node, label) AS (SELECT DISTINCT src, src FROM e " +
      "UNION SELECT e.dst, cc.label FROM cc JOIN e ON e.src = cc.node) " +
      "SELECT node AS doc_id, MIN(label) AS keep_id FROM cc GROUP BY 1 ORDER BY doc_id"))

  /** Benchmark DECONTAMINATION — the training-data op that runs beside
    * dedup in every serious pipeline: flag training documents whose content
    * overlaps a held-out evaluation set (here source 'src0' plays the
    * benchmark; everything else is the training pool), so eval scores are
    * not inflated by memorized training copies. Overlap metric: fraction of
    * the training doc's distinct word-3-gram shingles that appear in ANY
    * benchmark doc; ≥ 0.5 ⇒ contaminated. Threshold membership is engine-
    * stable WITHOUT needing a margin: the fraction is one IEEE division of
    * identical exact integers on both engines, so even the sf0.1 doc that
    * lands on exactly 0.5 (77/154) compares identically. (Planted
    * cross-source duplicates sit at 1.0; background overlap ≤ 0.494.)
    *
    * Scale shape: the benchmark shingle dictionary is DISTINCT shingles of
    * the eval set — eval sets are tiny relative to a 100 TB training corpus,
    * so it is the broadcast side; the training side streams through one
    * equi-join stage plus a per-doc count aggregate. No pair space anywhere. */
  val dedupDecontaminate: Op = Op(
    "dedup_decontaminate",
    (s, d) => {
      // Materialize the shingle arrays once: they feed THREE plan branches
      // (bench dictionary, per-doc sizes, hit join) and uncached each branch
      // re-derives the whole split/transform tree — the same measured
      // recompute trap as ngramPairs (cache barrier pattern, §7.2).
      val sh = Housekeeping.cacheBounded("decon_shingles",
        shingled(Tables.documents(s, d).select("doc_id", "source", "text"))
          .select(col("doc_id"), col("source"), col("shingles")))
      val bench = sh.where(col("source") === "src0")
        .select(explode(col("shingles")).as("s")).distinct()
      val train = sh.where(col("source") =!= "src0")
        .select(col("doc_id"), explode(col("shingles")).as("s"))
      val hits = train.join(broadcast(bench), "s")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      train.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_shingles"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("contaminated",
          col("n_hits").cast("double") / col("n_shingles") >= 0.5)
        .orderBy("doc_id")
    },
    Some("WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents), " +
      "g AS (SELECT doc_id, source, unnest(list_distinct(list_transform(generate_series(1, len(w) - 2), " +
      "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s FROM t WHERE len(w) >= 3), " +
      "bench AS (SELECT DISTINCT s FROM g WHERE source = 'src0'), " +
      "train AS (SELECT doc_id, s FROM g WHERE source <> 'src0'), " +
      "sz AS (SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY 1), " +
      "hit AS (SELECT doc_id, COUNT(*) AS n_hits FROM train JOIN bench USING (s) GROUP BY 1) " +
      "SELECT sz.doc_id, n_shingles, COALESCE(n_hits, 0) AS n_hits, " +
      "CAST(COALESCE(n_hits, 0) AS DOUBLE) / n_shingles >= 0.5 AS contaminated " +
      "FROM sz LEFT JOIN hit ON hit.doc_id = sz.doc_id ORDER BY sz.doc_id"))

  /** Every unordered distinct embedding pair exactly once, with its cosine —
    * the EXACT all-pairs stage shared by `dedup_embedding_cosine` and
    * `sim_search_topk`, spelled as a block-matrix theta-join shard instead of
    * the `vec_id_a < vec_id_b` non-equi join Spark would plan as a
    * BroadcastNestedLoopJoin (which at 100 TB means broadcasting the whole
    * corpus — memory-fatal before it is even slow).
    *
    * Why not LSH/IVF candidate pruning here (the approximate families below):
    * full recall at threshold 0.4 on THIS corpus is information-theoretically
    * out of reach for bucketing — the qualifying pairs are the upper tail of
    * an isotropic corpus (measured: min qualifying cosine 0.40001, median
    * 0.42; background ≈ 0 ± 0.125 at dim 64), so per-hyperplane-bit collision
    * is p₁ = 1 − acos(0.4)/π ≈ 0.631 vs background p₂ = 0.5. Driving per-pair
    * miss below 1e-5 (needed: ~10³ qualifying pairs across sfs) requires e.g.
    * b=4 bits × 67 tables — which admits 1 − (1 − 0.5⁴)⁶⁷ ≈ 99% of background
    * pairs as candidates. Concentration of measure: every bucketing family
    * degenerates to ~all-pairs at this similarity gap. The honest scale form
    * of an EXACT threshold op is therefore sharded exact:
    *
    * Block-matrix sharding (the classic distributed theta-join partitioning):
    * block g = vec_id mod B; the B(B+1)/2 unordered block pairs (g1 ≤ g2) are
    * a tiny broadcast table; each side replicates to its block pairs (~B/2×)
    * and the pair space is computed under an EQUI-join on (g1, g2) — shuffle
    * is n·(B+1)/2 rows across B(B+1)/2 uniform keys of (n/B)² work each, no
    * broadcast of the corpus, no nested loop, parallelism chosen by B ~
    * √(2·cores) (B=16 → 136 keys over 32 cores here; on a 1000-executor
    * cluster raise B, same plan). Output ids are normalized (least, greatest)
    * so each unordered pair appears exactly once; cosine is symmetric in
    * IEEE double (same left-to-right index fold either way), so side
    * assignment cannot change the value. */
  private val PairBlocks = 16

  /** Operational guard on the two declared-exact pair ops: the pair space is
    * n(n−1)/2 BY CONTRACT (full-recall exact threshold — see the rebuttal
    * above for why it cannot be bucketed), so a 100× corpus must get a loud
    * refusal at plan time, not a quiet quadratic job. The default budget
    * (10⁸ unordered pairs ≈ minutes of work at these row widths) is
    * overridable per session via `graft.pair.budget` for a caller who has
    * priced the quadratic cost and wants it anyway. The row count is one
    * parquet-metadata count, paid before any job is launched. */
  private val PairBudgetConf = "graft.pair.budget"
  private val PairBudgetDefault = 100000000L

  private def requirePairBudget(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    val n = Tables.embeddings(s, d).count()
    val pairs = BigInt(n) * (n - 1) / 2
    val budget = s.conf.get(PairBudgetConf, PairBudgetDefault.toString).toLong
    require(pairs <= budget,
      s"exact all-pairs stage refused: $n vectors -> $pairs unordered pairs exceeds the " +
        s"pair budget $budget. Exact-threshold recall cannot be bucketed (see " +
        s"LlmOps.blockedAllPairs scaladoc); at this scale use the approximate families " +
        s"(sim_search_ann_lsh / sim_search_ann_ivf / sim_search_ann_probe), or set " +
        s"$PairBudgetConf explicitly to accept the quadratic cost.")
  }

  def blockedAllPairs(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    requirePairBudget(s, d)
    import s.implicits._
    val blockPairs = broadcast(
      (for { g1 <- 0 until PairBlocks; g2 <- g1 until PairBlocks } yield (g1, g2))
        .toDF("g1", "g2"))
    val a = withVec(Tables.embeddings(s, d), "vec_id_a", "va", "na")
      .withColumn("ga", pmod(col("vec_id_a"), lit(PairBlocks)).cast("int"))
      .join(blockPairs, col("ga") === col("g1"))
    val b = withVec(Tables.embeddings(s, d), "vec_id_b", "vb", "nb")
      .withColumn("gb", pmod(col("vec_id_b"), lit(PairBlocks)).cast("int"))
      .join(blockPairs.select(col("g1").as("h1"), col("g2").as("h2")), col("gb") === col("h2"))
    a.join(b, col("g1") === col("h1") && col("g2") === col("h2") &&
        (col("g1") < col("g2") || col("vec_id_a") < col("vec_id_b")))
      .select(
        least(col("vec_id_a"), col("vec_id_b")).as("vec_id_a"),
        greatest(col("vec_id_a"), col("vec_id_b")).as("vec_id_b"),
        cosine(col("va"), col("vb"), col("na"), col("nb")).as("sim"))
  }

  /** Embedding-space near-dedup: pairs with cosine ≥ 0.4, ids only. The 0.4
    * boundary has ≥1e-5 margin from every actual pair value across all sfs
    * while DuckDB's float32 cosine diverges from our double math by ≤1e-7
    * (both measured) — so threshold membership can't flip. Pair generation is
    * the sharded exact stage [[blockedAllPairs]] (see there for why bucketed
    * candidate pruning cannot reach full recall at this threshold);
    * PlanShapeSpec asserts no BroadcastNestedLoopJoin remains. */
  val dedupEmbeddingCosine: Op = Op(
    "dedup_embedding_cosine",
    (s, d) =>
      blockedAllPairs(s, d)
        .where(col("sim") >= 0.4)
        .select("vec_id_a", "vec_id_b")
        .orderBy("vec_id_a", "vec_id_b"),
    Some("SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b FROM embeddings a " +
      "JOIN embeddings b ON a.vec_id < b.vec_id " +
      "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4 " +
      "ORDER BY vec_id_a, vec_id_b"))

  /** The 100 TB scale path for similarity search: multi-table
    * random-hyperplane LSH. Independent sign-bit tables bucket the corpus
    * (hyperplanes derived from SplitMix64 — fixed seeds); each query probes
    * its bucket plus every in-radius bit flip in every table; only
    * candidates pay exact cosine, then a per-query top-5 window. The corpus
    * never pays the n² pair space — the join is an equi-join on
    * (table, bucket). Sizing is the shared auto policy ([[lshParams]],
    * round 14): width ⌈log₂ n⌉ − 3 (occupancy ≈ 8), radius/table count
    * widen at scale, and the QUERY side doubles the tables because its work
    * is ∝ queries, not pairs — 0.98 recall@5 at 0.07% of the pair space on
    * the 16384 uniform worst-case fixture (AnnCrossoverSpec pins ≥ 0.90).
    *
    * Tuning note: uniform random embeddings are LSH's worst case (no
    * cluster structure — the 5th neighbor is barely above random); on real
    * clustered embeddings the same plan prunes far harder. Approximate ⇒ no
    * SQL oracle; AnnSpec measures recall against the brute-force baseline
    * and asserts determinism.
    *
    * `lshCandidates` is the bucket-join output — one row per (table, probe)
    * match, i.e. exactly the rows that pay an exact cosine — exposed so
    * AnnCrossoverSpec can assert the WORK of the bucketed plan (candidate
    * row count ≪ n²/2) rather than wall-clock, which flakes under host load;
    * the op dedups and ranks it. Deterministic: fixed hyperplanes, fixed
    * corpus. */
  def lshCandidates(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
      graft.functions.GraftFunctions.register(s)
      // SHARED LSH sizing policy with the kNN-graph generator (round 14):
      // width tracks the corpus (occupancy ≈ 8), probe radius and table
      // count widen at scale — the same graft.knn.lsh.{bits,probe,tables}
      // confs override. Query-side probing doubles the tables (recall is
      // cheap when work is ∝ queries); at the 500-vector testdata this
      // resolves to 8 tables × 6 bits × radius 1.
      val (nTables, nBits, radius) =
        lshParams(s, Tables.embeddings(s, d).count(), querySide = true)
      // All table buckets in one fused codegen call
      // ([[graft.functions.HyperplaneBuckets]]) — the literal-plane
      // when-chain spelling this replaced generated 1 536 literals whose
      // Janino compile dominated the query at bench scale.
      def buckets(vec: String): Column =
        graft.functions.GraftFunctions.hyperplaneBuckets(col(vec), nTables, nBits)
      val corpus = withVec(Tables.embeddings(s, d), "neighbor_id", "vc", "nc")
        .select(col("neighbor_id"), col("vc"), col("nc"),
          posexplode(buckets("vc")).as(Seq("t", "bucket")))
      // per table: the exact bucket plus every in-radius flip (multi-probe) —
      // one Generate over the flattened (table, probe-bucket) struct array,
      // so the (tiny, broadcast) query side costs a single stage to compile.
      val probeMasks = probeMaskArray(nBits, radius)
      val queries = withVec(Tables.embeddings(s, d), "query_id", "vq", "nq")
        .where(col("query_id") < 10)
        .withColumn("bs", buckets("vq"))
        .select(col("query_id"), col("vq"), col("nq"),
          explode(flatten(transform(sequence(lit(0), lit(nTables - 1)), t =>
            transform(probeMasks, m => struct(t.as("qt"),
              element_at(col("bs"), t + 1).bitwiseXOR(m).as("qbucket")))))).as("pr"))
        .select(col("query_id"), col("vq"), col("nq"),
          col("pr.qt").as("qt"), col("pr.qbucket").as("qbucket"))
      broadcast(queries).join(corpus,
          col("qt") === col("t") && col("qbucket") === col("bucket") &&
            col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosine(col("vq"), col("vc"), col("nq"), col("nc")).as("sim"))
  }

  /** Oracle for the ANN family (the persisted-intermediate playbook): the
    * APPROXIMATION is the candidate set — staged (with its Spark-computed
    * sim) by each op — and everything downstream is exact. DuckDB ranks by
    * the STAGED sim (identical on both sides — doubles round-trip parquet
    * bit-exactly), so ranks can never flip on cross-engine floating-point
    * accumulation order; what DuckDB independently verifies is (a) the whole
    * rank/dedup/top-k pipeline and (b) that ITS OWN
    * list_cosine_similarity agrees with the staged sim within 1e-5 on every
    * ranked pair — a candidate whose sim drifts beyond the epsilon is
    * EXCLUDED by the WHERE, so a real cosine bug surfaces as a loud
    * row-count/hash mismatch. Candidate generation itself is covered by
    * AnnCrossoverSpec's pinned recall floors and work counts. */
  private def annRerankOracle(stagePath: String): String =
    "SELECT query_id, rank, neighbor_id FROM (SELECT c.query_id, c.neighbor_id, " +
      "CAST(row_number() OVER (PARTITION BY c.query_id ORDER BY " +
      "c.sim DESC, c.neighbor_id) AS INT) AS rank " +
      s"FROM read_parquet('$stagePath/*.parquet') c " +
      "JOIN embeddings a ON a.vec_id = c.query_id " +
      "JOIN embeddings b ON b.vec_id = c.neighbor_id " +
      "WHERE abs(list_cosine_similarity(a.embedding, b.embedding) - c.sim) <= 1e-5) " +
      "WHERE rank <= 5 ORDER BY query_id, rank"

  def annLshStagePath(sfDir: String): String = Stage.root(sfDir) + "/ann_lsh_cand"
  def annIvfStagePath(sfDir: String): String = Stage.root(sfDir) + "/ann_ivf_cand"
  def annProbeStagePath(sfDir: String): String = Stage.root(sfDir) + "/ann_probe_cand"

  /** Materialize the deduped candidate set (cache barrier — the candidate
    * join computes once for the staged write AND the ranking), stage it at
    * `path` for the DuckDB re-rank, and rank the cached rows. Doubles
    * survive the parquet round trip bit-exactly, so ranking the cache and
    * re-ranking the file are over identical values. */
  private def stageAndRank(key: String, cand: DataFrame, path: String): DataFrame = {
    val cached = Housekeeping.cacheBounded(key, cand)
    // one file, not shuffle-partition-many: the candidate set is a
    // probe-BATCH artifact (queries × probed candidates, ~10³ rows here),
    // never corpus-sized — 32 tiny files cost more in task/file overhead
    // than the whole write
    cached.coalesce(1).write.mode("overwrite").parquet(path)
    rankCandidates(cached)
  }

  val simSearchAnnLsh: Op = Op(
    "sim_search_ann_lsh",
    (s, d) => {
      // a neighbor can match several probes/tables: per-pair max is the
      // cheap dedup (partial-aggregates map-side; sim is identical across
      // copies, so max == the value) — a distinct() here shuffled the
      // whole candidate set on a double column for the same effect.
      stageAndRank("ann_lsh_cand",
        lshCandidates(s, d).groupBy("query_id", "neighbor_id").agg(max(col("sim")).as("sim")),
        annLshStagePath(d))
    },
    Some(annRerankOracle(Stage.token + "/ann_lsh_cand")))

  /** The other classic ANN family: IVF (inverted file). A coarse k-means
    * quantizer splits the corpus into K cells; a query probes only its
    * NProbe nearest cells and pays exact cosine on those candidates — the
    * corpus-side cost at 100 TB is one equi-join on `cell` against a
    * materialized inverted file (this key rebuilds per run as the declared
    * trainer; `sim_search_ann_probe` below is the production build-once/
    * probe-many lifecycle over the persisted index).
    *
    * Determinism: Lloyd's algorithm runs a FIXED 2 iterations from a fixed
    * seed assignment (vec_id mod K); per-dimension centroid means aggregate
    * in exact DECIMAL (order-free sums) before a final double cast, so
    * centroids — and therefore cells, candidates, and ranking — are
    * bit-identical across shuffle partitionings. The K-row centroid table is
    * an AGGREGATE RESULT collected to the driver each iteration and re-seeded
    * as a local DataFrame — the same driver loop every k-means trainer runs —
    * which keeps each iteration's lineage flat instead of compounding the
    * whole training history into every downstream plan (measured: the pure
    * cache-chained spelling planned 260+ Exchange references and paid ~2 s of
    * planning/codegen at bench scale for identical results).
    *
    * K=16/NProbe=4 scans ~25% of a uniform corpus — like the LSH variant,
    * uniform-random embeddings are the worst case (no cluster structure for
    * the quantizer to find); AnnIvfSpec holds the same recall floor, and on
    * real clustered embeddings the same plan prunes far harder. Approximate
    * ⇒ no SQL oracle.
    *
    * `ivfCandidates` is the probe⋈inverted-file join output — exactly the
    * corpus rows that pay an exact cosine at search time (training adds
    * K·n·Iters centroid scorings on top, accounted arithmetically in
    * AnnCrossoverSpec) — exposed for the same work-count assertion as
    * [[lshCandidates]]; the op ranks it. */
  private val IvfK = 16
  private val IvfNProbe = 4
  private val IvfIters = 2

  private def dot(a: Column, b: Column) = graft.functions.GraftFunctions.dot(a, b)

  /** cell → centroid vector (+norm) from an assignment, via exact-decimal
    * per-dimension means (empty cells simply drop out of the groupBy).
    * K rows are collected and re-seeded as a flat local table — the same
    * driver loop every k-means trainer runs — which keeps each iteration's
    * lineage flat instead of compounding the whole training history into
    * every downstream plan (see [[ivfCandidates]] scaladoc). */
  private def ivfCentroidsOf(s: org.apache.spark.sql.SparkSession,
                             assigned: DataFrame): DataFrame = {
    val computed = assigned
      .select(col("cell"), posexplode(col("vc")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg(avg(col("x").cast("decimal(27,12)")).cast("double").as("m"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        p => p.getField("m")).as("cv"))
      .withColumn("ncv", sqrt(dot(col("cv"), col("cv"))))
    val rows = computed.collect().toSeq
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava), computed.schema)
  }

  /** Nearest-FROZEN-centroid assignment, one pass: K is tiny, so the
    * centroid table broadcasts and the argmax is a map-side struct-max
    * aggregate keyed by vector id (ties break to the highest cell id —
    * deterministic because the sims themselves are deterministic doubles).
    * Shared by each Lloyd's iteration AND the incremental delta-append
    * ([[ivfAppendIndexPath]]), where its cost ∝ the rows it is given. */
  private def assignToCells(corpus: DataFrame, cents: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(cents)) // every vector scores all K centroids
      .select(col("neighbor_id"), col("vc"), col("nc"), col("cell"),
        (dot(col("vc"), col("cv")) / (col("nc") * col("ncv"))).as("csim"))
      .groupBy("neighbor_id")
      .agg(max(struct(col("csim"), col("cell"))).getField("cell").as("cell"),
        first(col("vc")).as("vc"), first(col("nc")).as("nc"))

  /** Fixed-seed, fixed-iteration Lloyd's training over an arbitrary corpus:
    * the (neighbor_id, vc, nc, cell) assignment — deterministic
    * (exact-decimal centroid means, ties to the highest cell id), so every
    * build of the same corpus produces the bit-identical inverted file. */
  private def ivfTrain(s: org.apache.spark.sql.SparkSession, corpus: DataFrame): DataFrame = {
    val seed = corpus.withColumn("cell", (col("neighbor_id") % IvfK).cast("int"))
    (1 to IvfIters).foldLeft(seed) { (assigned, _) =>
      assignToCells(corpus, ivfCentroidsOf(s, assigned))
    }
  }

  private def ivfTrained(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    ivfTrain(s, Housekeeping.cacheBounded("ivf_corpus",
      withVec(Tables.embeddings(s, d), "neighbor_id", "vc", "nc")))

  /** Query side of the IVF search: each of the 10 fixed queries scores the K
    * broadcast centroids and keeps its NProbe nearest cells. */
  private def ivfProbes(s: org.apache.spark.sql.SparkSession, d: String,
                        cents: DataFrame): DataFrame = {
    val wProbe = Window.partitionBy("query_id").orderBy(col("csim").desc, col("cell").asc)
    withVec(Tables.embeddings(s, d), "query_id", "vq", "nq")
      .where(col("query_id") < 10)
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("vq"), col("nq"), col("cell"),
        (dot(col("vq"), col("cv")) / (col("nq") * col("ncv"))).as("csim"))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= IvfNProbe)
      .select("query_id", "vq", "nq", "cell")
  }

  /** rank candidates → the (query_id, rank, neighbor_id) contract shape. */
  private[graft] def rankCandidates(cand: DataFrame): DataFrame = {
    val wRank = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    cand
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  def ivfCandidates(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
      graft.functions.GraftFunctions.register(s)
      val index = Housekeeping.cacheBounded("ivf_index", ivfTrained(s, d))
      val probes = ivfProbes(s, d, ivfCentroidsOf(s, index))
      // each corpus vector lives in exactly one cell and probe cells are
      // distinct per query ⇒ candidate pairs are already unique: no dedup
      // stage before the ranking window
      broadcast(probes).join(index, Seq("cell"))
        .where(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          (dot(col("vq"), col("vc")) / (col("nq") * col("nc"))).as("sim"))
  }

  val simSearchAnnIvf: Op = Op(
    "sim_search_ann_ivf",
    (s, d) => stageAndRank("ann_ivf_cand", ivfCandidates(s, d), annIvfStagePath(d)),
    Some(annRerankOracle(Stage.token + "/ann_ivf_cand")))

  /** The persisted IVF lifecycle the per-run trainer above deliberately skips:
    * BUILD ONCE — train the quantizer, write the inverted file as a
    * cell-PARTITIONED parquet layout (`cells/cell=<c>/…`) plus the K-row
    * centroid table — then PROBE MANY times against the files. Keyed by the
    * corpus dir through the same content-key memo as the ngram pair table
    * ([[Housekeeping.memoPut]]): the first caller pays the build inside its
    * own measurement, every later caller (and every later bench pass) reads
    * the index from disk. Training is bit-deterministic (see [[ivfTrained]]),
    * so build-then-probe and the per-run trainer return identical rankings —
    * AnnIvfSpec asserts exact equality. */
  private def ivfMemoKey(d: String) = s"ivf_index_v1|$d"

  def ivfIndexPath(s: org.apache.spark.sql.SparkSession, d: String): java.nio.file.Path =
    Housekeeping.memoGet("ivf_index_store", ivfMemoKey(d)).getOrElse {
      Housekeeping.memoPut("ivf_index_store", ivfMemoKey(d), dir => {
        graft.functions.GraftFunctions.register(s)
        val trained = Housekeeping.cacheBounded("ivf_index", ivfTrained(s, d))
        // partitionBy(cell): K directories — at 100 TB each holds that cell's
        // shard of the corpus, and a probe reads ONLY its probed cells' files
        trained.write.mode("overwrite").partitionBy("cell")
          .parquet(dir.resolve("cells").toString)
        ivfCentroidsOf(s, trained).write.mode("overwrite")
          .parquet(dir.resolve("centroids").toString)
      })
    }

  /** Probe-only search against a persisted index: NO k-means stages, no
    * corpus-side exchange — the probed cell ids (≤ K ints, the same driver
    * round-trip class as the centroid collect) become a static partition
    * filter, so the scan touches only NProbe×queries cell directories and
    * the tiny probe table broadcasts onto it. PlanShapeSpec asserts both
    * properties on the executed plan. */
  def ivfProbe(s: org.apache.spark.sql.SparkSession, d: String,
               idx: java.nio.file.Path): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val cents = s.read.parquet(idx.resolve("centroids").toString)
    val probes = ivfProbes(s, d, cents)
    val probedCells = probes.select("cell").distinct().collect().map(_.getInt(0))
    val index = s.read.parquet(idx.resolve("cells").toString)
      .where(col("cell").isin(probedCells.toIndexedSeq.map(Int.box): _*))
    broadcast(probes).join(index, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("vq"), col("vc")) / (col("nq") * col("nc"))).as("sim"))
  }

  val simSearchAnnProbe: Op = Op(
    "sim_search_ann_probe",
    (s, d) => stageAndRank("ann_probe_cand", ivfProbe(s, d, ivfIndexPath(s, d)), annProbeStagePath(d)),
    Some(annRerankOracle(Stage.token + "/ann_probe_cand")))

  // ---------------------------------------------- incremental IVF maintenance

  /** INCREMENTAL IVF index maintenance (round 13; the round-12 verdict's
    * #5): corpus growth must not force a rebuild. The index is built ONCE on
    * the base corpus (vectors with id % 5 ≠ 0) — Lloyd's training freezes
    * the centroids — then the delta (id % 5 = 0, the later-arriving fifth)
    * is appended by ONE single-pass nearest-frozen-centroid assignment over
    * ONLY the delta rows plus one [[TableManifest]] rename-commit:
    *
    *   v1 = base cell files;  v2 = v1 files (untouched, retained by
    *   reference) + the delta's new cell files.
    *
    * Work ∝ delta (the DedupScaleSpec discipline — IvfAppendSpec asserts the
    * gen2 files hold exactly the delta rows and v2 references every v1 file
    * byte-identically), readers get snapshot isolation for free (a probe of
    * v1 mid-append never sees a torn index), and because assignment against
    * FROZEN centroids is deterministic, probe(v2) is ROW-EXACTLY equal to a
    * probe of a full one-pass reassignment of the whole corpus against the
    * same centroids (the rebuild the append replaces — also IvfAppendSpec).
    * Cell files carry `cell` as a data column and live under
    * `cell_dir=<c>/` directories, so the probe prunes at the MANIFEST level:
    * the file list is filtered to the probed cells before Spark ever lists
    * or opens a file — file skipping from metadata, the Delta/Iceberg read
    * pattern, which keeps working when one cell spans generations. */
  private def ivfAppendMemoKey(d: String) = s"ivf_append_v2|$d"

  def ivfAppendIndexPath(s: org.apache.spark.sql.SparkSession, d: String): java.nio.file.Path =
    Housekeeping.memoGet("ivf_append_store", ivfAppendMemoKey(d)).getOrElse {
      Housekeeping.memoPut("ivf_append_store", ivfAppendMemoKey(d), dir => {
        graft.functions.GraftFunctions.register(s)
        val corpus = withVec(Tables.embeddings(s, d), "neighbor_id", "vc", "nc")
        val cellsDir = dir.resolve("cells")
        // BUILD (once): train on the base corpus, freeze the centroids, and
        // store the base's FINAL one-pass assignment against those frozen
        // centroids (not the training iteration's cells, which were made
        // against the second-to-last centroids) — so base ∪ delta is, by
        // construction, exactly a full reassignment against the frozen
        // centroids and the append-equals-rebuild contract holds row-exactly
        val base = corpus.where(pmod(col("neighbor_id"), lit(5)) =!= 0)
        val cents = ivfCentroidsOf(s, ivfTrain(s, base))
        cents.write.mode("overwrite").parquet(dir.resolve("centroids").toString)
        assignToCells(base, cents).withColumn("cell_dir", col("cell"))
          .write.partitionBy("cell_dir").parquet(cellsDir.resolve("gen1").toString)
        TableManifest.commit(cellsDir, 1,
          TableManifest.parquetFiles(cellsDir.resolve("gen1")))
        // APPEND (∝ delta): assign ONLY the delta against the frozen
        // centroids, write its cell files, commit v2 = v1 ∪ gen2 by rename
        val delta = corpus.where(pmod(col("neighbor_id"), lit(5)) === 0)
        assignToCells(delta, cents).withColumn("cell_dir", col("cell"))
          .write.partitionBy("cell_dir").parquet(cellsDir.resolve("gen2").toString)
        TableManifest.commit(cellsDir, 2,
          TableManifest.filesAsOf(cellsDir, 1) ++
            TableManifest.parquetFiles(cellsDir.resolve("gen2")))
      })
    }

  /** Probe an [[ivfAppendIndexPath]] index AS OF a manifest version:
    * manifest-level file skipping down to the probed cells (no directory
    * listing, no partition discovery — the file list IS the metadata), then
    * the same broadcast-probes equi-join as every IVF probe. */
  def ivfManifestProbe(s: org.apache.spark.sql.SparkSession, d: String,
                       idx: java.nio.file.Path, version: Long): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    cellFileProbe(s, d, s.read.parquet(idx.resolve("centroids").toString),
      TableManifest.filesAsOf(idx.resolve("cells"), version))
  }

  /** Shared tail of every file-list IVF probe: prune the cell files to the
    * probed cells, then the standard broadcast-probes equi-join. */
  private def cellFileProbe(s: org.apache.spark.sql.SparkSession, d: String,
                            cents: DataFrame, cellFiles: Seq[java.nio.file.Path]): DataFrame = {
    val probes = ivfProbes(s, d, cents)
    val probedCells = probes.select("cell").distinct().collect().map(_.getInt(0)).toSet
    val files = cellFiles
      .filter(f => probedCells.exists(c => f.toString.contains(s"cell_dir=$c/")))
    // Every probed cell being empty is a legal index state (fresh index, all
    // probed cells vacant) — a zero-file parquet read cannot infer a schema,
    // so carry the known cell-file schema explicitly instead of throwing.
    val index =
      if (files.nonEmpty) s.read.parquet(files.map(_.toString): _*)
      else {
        import org.apache.spark.sql.types._
        s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          StructType(Seq(
            StructField("neighbor_id", LongType), StructField("vc", ArrayType(DoubleType)),
            StructField("nc", DoubleType), StructField("cell", IntegerType))))
      }
    broadcast(probes).join(index, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("vq"), col("vc")) / (col("nq") * col("nc"))).as("sim"))
  }

  /** The rebuild the append replaces, as a test hook (IvfAppendSpec): one
    * full-corpus pass against the SAME frozen centroids, probed in memory —
    * must equal probe(v2) row-exactly. */
  def ivfAppendRebuildCandidates(s: org.apache.spark.sql.SparkSession, d: String,
                                 idx: java.nio.file.Path): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val cents = s.read.parquet(idx.resolve("centroids").toString)
    val full = assignToCells(withVec(Tables.embeddings(s, d), "neighbor_id", "vc", "nc"), cents)
    val probes = ivfProbes(s, d, cents)
    broadcast(probes).join(full, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("vq"), col("vc")) / (col("nq") * col("nc"))).as("sim"))
  }

  /** Assign raw (vec_id, embedding) rows to their nearest FROZEN centroid —
    * the shared delta-append step: the batch appender and the streaming
    * ingest both call exactly this, which is what makes their indexes
    * byte-equal in content. */
  def ivfAssignAgainst(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    assignToCells(withVec(vectors, "neighbor_id", "vc", "nc"), centroids)
  }

  def annIvfAppendStagePath(sfDir: String): String = Stage.root(sfDir) + "/ann_ivf_append_cand"

  val simSearchAnnIvfAppend: Op = Op(
    "sim_search_ann_ivf_append",
    (s, d) => stageAndRank("ann_ivf_append_cand",
      ivfManifestProbe(s, d, ivfAppendIndexPath(s, d), 2L), annIvfAppendStagePath(d)),
    Some(annRerankOracle(Stage.token + "/ann_ivf_append_cand")))

  def annIvfStreamStagePath(sfDir: String): String = Stage.root(sfDir) + "/ann_ivf_stream_cand"

  /** STREAMING vector ingest against the incremental IVF index (round 13):
    * new embeddings arrive in micro-batches; each batch is assigned to its
    * nearest FROZEN centroid ([[ivfAssignAgainst]] — the exact step the
    * batch appender runs, work ∝ batch), its cell files land under a fresh
    * generation dir, and the index advances by ONE optimistic
    * [[TableManifest.commitIfVersion]] CAS per batch — readers holding any
    * earlier manifest keep a consistent snapshot throughout the ingest.
    * Because assignment is per-row against frozen centroids, the streamed
    * index's CONTENT equals the batch append's regardless of batch count or
    * order; StreamIvfAppendSpec asserts probe(streamed) ≡ probe(batch v2)
    * row-exactly. Probe + oracle are the standard staged-candidate re-rank.
    *
    * Scale notes (100 TB ingest): this is the production lifecycle of a
    * vector index under continuous writes — bounded per-batch work, one
    * metadata CAS per commit, no rebuild, no reader locks; centroid refresh
    * (when drift accumulates) is a separate offline retrain + index swap. */
  val streamAnnIvfAppend: Op = Op(
    "stream_ann_ivf_append",
    (s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val batchIdx = ivfAppendIndexPath(s, d) // frozen centroids live here
      val cents = Housekeeping.cacheBounded("ivf_stream_cents",
        s.read.parquet(batchIdx.resolve("centroids").toString))
      val root = Housekeeping.tempDirBounded("ivf_stream_idx",
        Housekeeping.scratchDir("ivf_stream_idx"))
      val cellsDir = root.resolve("cells")
      // base index: the standing 4/5 corpus assigned against the frozen
      // centroids — BYTE-IDENTICAL to the memoized staged store's gen1 by
      // construction, so the run-local mutable root is seeded by a driver-
      // side file copy instead of re-running the base assignment job per
      // invocation (round 17; fixture economics, not semantics — the
      // manifest is committed fresh against the copied paths)
      Housekeeping.copyTree(batchIdx.resolve("centroids"), root.resolve("centroids"))
      Housekeeping.copyTree(batchIdx.resolve("cells").resolve("gen1"),
        cellsDir.resolve("gen0"))
      val vecs = Tables.embeddings(s, d).select("vec_id", "embedding")
      TableManifest.commit(cellsDir, 1,
        TableManifest.parquetFiles(cellsDir.resolve("gen0")))
      // the delta streams in: two deliveries of the id % 5 == 0 fifth
      val srcDir = Housekeeping.scratchDir("ivf_stream_src")
      val ckpt = Housekeeping.scratchDir("ivf_stream_ckpt").toString
      val delta = vecs.where(pmod(col("vec_id"), lit(5)) === 0)
      try {
        (0 to 1).foreach(k => StreamingOps.stageDelivery(
          delta.where(pmod(col("vec_id"), lit(2)) === k), srcDir, s"delivery$k.parquet"))
        val q = s.readStream.schema(delta.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir.toString)
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            // generation dirs are keyed by batchId and the commit is
            // idempotent PER BATCH: a re-executed batch (checkpoint restart /
            // retry) whose files the live manifest already references is a
            // no-op, and a retry of a batch that died mid-write overwrites
            // its own partial (unreferenced) files before committing — the
            // CAS alone only guards CONCURRENT writers, not the same writer
            // retrying.
            val genDir = cellsDir.resolve(s"genb$batchId")
            val (cur, curFiles) = TableManifest.read(cellsDir)
            if (!curFiles.exists(_.toString.contains(s"/genb$batchId/"))) {
              ivfAssignAgainst(batch, cents)
                .withColumn("cell_dir", col("cell"))
                .write.mode("overwrite").partitionBy("cell_dir").parquet(genDir.toString)
              val ok = TableManifest.commitIfVersion(cellsDir, cur,
                curFiles ++ TableManifest.parquetFiles(genDir))
              require(ok, s"ivf stream append lost the CAS at version $cur — " +
                "a concurrent writer mutated the index mid-ingest")
            }
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        stageAndRank("ann_ivf_stream_cand",
          ivfManifestProbe(s, d, root, TableManifest.read(cellsDir)._1),
          annIvfStreamStagePath(d))
      } finally Seq(srcDir.toString, ckpt).foreach(p =>
        Housekeeping.deleteRecursively(java.nio.file.Paths.get(p)))
    },
    Some(annRerankOracle(Stage.token + "/ann_ivf_stream_cand")))

  /** Driver-side parquet FOOTER row count — metadata-only (no scan tasks,
    * no data pages touched): the testbed stand-in for the per-file row
    * counts a production manifest carries inline, used by the streaming
    * autorefresh's drift check so the decision never reads vector data. */
  private def footerRowCount(files: Seq[java.nio.file.Path]): Long = {
    val conf = new org.apache.hadoop.conf.Configuration()
    files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f.toString), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** The appended share (ppm) of a streaming refresh index, derived from
    * ITS OWN manifest: appended rows live in `genb*` generations, trained
    * rows in `gen0`/`genr*` — and because a retrain SWAPS (carries no prior
    * files), the live manifest's genb share is exactly the drift since the
    * last (re)train. Empty index ⇒ 0 drift (the round-15 ADVICE guard). */
  private[graft] def streamDriftPpm(root: java.nio.file.Path): Long = {
    val (_, files) = TableManifest.read(root)
    val cells = files.filter(_.toString.contains("/cells/"))
    val tot = footerRowCount(cells)
    if (tot == 0L) 0L
    else footerRowCount(cells.filter(_.toString.contains("/genb"))) * 1000000L / tot
  }

  /** Per-batch autorefresh decisions, keyed by "sfDir|b<batchId>" — the
    * spec hook StreamIvfAutorefreshSpec pins both branches against. */
  private[graft] val streamRefreshLog =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def annIvfStreamRefreshStagePath(sfDir: String): String =
    Stage.root(sfDir) + "/ann_ivf_stream_refresh_cand"

  /** STREAMING DRIFT-TRIGGERED AUTOREFRESH (round 16; the round-15
    * verdict's #4) — [[streamAnnIvfAppend]]'s per-batch CAS with the drift
    * check FOLDED IN, closing the index lifecycle loop mid-stream instead
    * of waiting for an offline tick: each micro-batch (1) appends its
    * nearest-frozen-centroid assignment as a new generation via the
    * idempotent batchId-keyed CAS, then (2) re-derives the index's appended
    * share off the MANIFEST ALONE ([[streamDriftPpm]] — footer row counts,
    * zero data I/O) and, when the share crosses `graft.ivf.refresh.ppm`
    * (default 10 %), retrains the full committed corpus and SWAPS quantizer
    * + inverted file in one atomic manifest version (the
    * [[ivfRetrainIndexPath]] layout: every version carries BOTH centroid
    * and cell files, so a reader can never mix generations). Post-swap the
    * appended share is zero by construction, so a replayed batch's drift
    * check is a natural no-op — no retrain marker needed. Deliveries are
    * uneven ON PURPOSE: the first lands 1/15 of the corpus (~7.7 %
    * appended — below the floor, an explicit logged no-op), the second
    * brings the share to 20 % — above it, firing the mid-stream retrain.
    * Because training is bit-deterministic over a row SET, the swapped
    * index's probe equals the offline retrain key's probe ROW-EXACTLY
    * (StreamIvfAutorefreshSpec pins both branches; a sky-high conf'd floor
    * proves the never-fires stream equals the pure append index).
    *
    * Scale notes (100 TB ingest): per-batch cost is the bounded assignment
    * + one metadata CAS + a footer-count walk of the manifest's file list;
    * the retrain — when the stream itself decides it has drifted — is the
    * declared full-Lloyd's price, amortized across every batch since the
    * last refresh, and the swap is one rename under concurrent readers.
    * Oracle: the standard staged-candidate re-rank, valid for WHICHEVER
    * branch ran last. */
  val streamAnnIvfAutorefresh: Op = Op(
    "stream_ann_ivf_autorefresh",
    (s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      graft.functions.GraftFunctions.register(s)
      val batchIdx = ivfAppendIndexPath(s, d) // frozen base centroids
      val floor = s.conf.getOption("graft.ivf.refresh.ppm")
        .map(_.toLong).getOrElse(100000L)
      val root = Housekeeping.tempDirBounded("ivf_streamref_idx",
        Housekeeping.scratchDir("ivf_streamref_idx"))
      // seed the run-local mutable root from the memoized staged store by
      // driver-side file copy (see streamAnnIvfAppend — identical content
      // by construction; the per-invocation base assignment job is the
      // staged store's gen1)
      Housekeeping.copyTree(batchIdx.resolve("centroids"),
        root.resolve("centroids/gen0"))
      Housekeeping.copyTree(batchIdx.resolve("cells").resolve("gen1"),
        root.resolve("cells/gen0"))
      val vecs = Tables.embeddings(s, d).select("vec_id", "embedding")
      TableManifest.commit(root, 1,
        TableManifest.parquetFiles(root.resolve("centroids/gen0")) ++
          TableManifest.parquetFiles(root.resolve("cells/gen0")))
      val srcDir = Housekeeping.scratchDir("ivf_streamref_src")
      val ckpt = Housekeeping.scratchDir("ivf_streamref_ckpt").toString
      val delta = vecs.where(pmod(col("vec_id"), lit(5)) === 0)
      try {
        StreamingOps.stageDelivery(delta.where(pmod(col("vec_id"), lit(3)) === 0),
          srcDir, "delivery0.parquet")
        StreamingOps.stageDelivery(delta.where(pmod(col("vec_id"), lit(3)) =!= 0),
          srcDir, "delivery1.parquet")
        val q = s.readStream.schema(delta.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir.toString)
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            val ss = batch.sparkSession
            // 1) APPEND — the batchId-keyed idempotent CAS: assignment is
            // against the COMMITTED version's centroids (a prior batch may
            // have swapped them). Idempotence is MANIFEST-based, like the
            // sibling [[streamAnnIvfAppend]]: a replay whose append already
            // committed sees its /genb{batchId}/ files in curFiles and must
            // NOT re-run the mode("overwrite") write — that would delete the
            // committed part files (new runs produce different UUID part
            // names) and then double-commit the generation (round-16
            // ADVICE). The marker is only a fast path for a replay AFTER
            // this batch's own swap dropped the genb files from the
            // manifest — it is created once the append is durably in the
            // manifest (either branch), never before.
            val marker = root.resolve(s"_b$batchId.appended")
            if (!java.nio.file.Files.exists(marker)) {
              val (cur, curFiles) = TableManifest.read(root)
              if (!curFiles.exists(_.toString.contains(s"/genb$batchId/"))) {
                val cents = ss.read.parquet(curFiles
                  .filter(_.toString.contains("/centroids/")).map(_.toString): _*)
                val genDir = root.resolve(s"cells/genb$batchId")
                ivfAssignAgainst(batch, cents)
                  .withColumn("cell_dir", col("cell"))
                  .write.mode("overwrite").partitionBy("cell_dir").parquet(genDir.toString)
                val ok = TableManifest.commitIfVersion(root, cur,
                  curFiles ++ TableManifest.parquetFiles(genDir))
                require(ok, s"ivf stream autorefresh lost the append CAS at " +
                  s"version $cur — a concurrent writer mutated the index mid-ingest")
              }
              java.nio.file.Files.createFile(marker)
            }
            // 2) DRIFT CHECK — every batch, off the manifest alone; fires
            // the retrain+swap when the appended share crosses the floor
            val ppm = streamDriftPpm(root)
            if (ppm >= floor) {
              streamRefreshLog.put(s"$d|b$batchId", s"retrain:$ppm")
              val (cur2, f2) = TableManifest.read(root)
              val corpusNow = ss.read.parquet(f2
                .filter(_.toString.contains("/cells/")).map(_.toString): _*)
                .select("neighbor_id", "vc", "nc")
              val newCents = ivfCentroidsOf(ss, ivfTrain(ss, corpusNow))
              newCents.write.mode("overwrite")
                .parquet(root.resolve(s"centroids/genr$batchId").toString)
              assignToCells(corpusNow, newCents).withColumn("cell_dir", col("cell"))
                .write.mode("overwrite").partitionBy("cell_dir")
                .parquet(root.resolve(s"cells/genr$batchId").toString)
              val ok2 = TableManifest.commitIfVersion(root, cur2,
                TableManifest.parquetFiles(root.resolve(s"centroids/genr$batchId")) ++
                  TableManifest.parquetFiles(root.resolve(s"cells/genr$batchId")))
              require(ok2, s"ivf stream autorefresh lost the swap CAS at " +
                s"version $cur2 — a concurrent writer mutated the index mid-swap")
            } else streamRefreshLog.put(s"$d|b$batchId", s"noop:$ppm")
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        stageAndRank("ann_ivf_stream_refresh_cand",
          ivfSwapProbe(s, d, root, TableManifest.read(root)._1),
          annIvfStreamRefreshStagePath(d))
      } finally Seq(srcDir.toString, ckpt).foreach(p =>
        Housekeeping.deleteRecursively(java.nio.file.Paths.get(p)))
    },
    Some(annRerankOracle(Stage.token + "/ann_ivf_stream_refresh_cand")))

  def annIvfRetrainStagePath(sfDir: String): String = Stage.root(sfDir) + "/ann_ivf_retrain_cand"

  /** OFFLINE CENTROID RETRAIN + ATOMIC INDEX SWAP (round 14; the round-13
    * verdict's #3) — the refresh the append lifecycle's scaladoc deferred:
    * after enough frozen-centroid appends the quantizer drifts away from the
    * data, so the corpus is periodically RETRAINED from scratch and the new
    * index generation swapped in atomically. Layout: ONE manifest whose
    * versions reference BOTH the centroid files and the cell files (paths
    * under `centroids/gen<N>/` and `cells/gen<N>/`), so quantizer and
    * inverted file swap in the SAME atomic rename — there is no instant at
    * which a reader can pair new cells with old centroids or vice versa.
    *
    *   v1 = gen1 centroids (trained on the base 4/5 corpus — the frozen
    *        quantizer the append path accumulated drift against) + the FULL
    *        corpus assigned against them: exactly the post-append state;
    *   v2 = gen2 centroids (full Lloyd's retrain over base ∪ delta) + the
    *        full corpus REASSIGNED — ZERO v1 files carried: a swap, not an
    *        append. v1's files are never touched, so readers holding v1 keep
    *        a consistent old index until an explicit vacuum (snapshot
    *        isolation, the same contract as the append path).
    *
    * Because training is bit-deterministic ([[ivfTrained]]'s discipline),
    * probe(v2) equals a from-scratch build's probe ROW-EXACTLY
    * ([[ivfRetrainRebuildCandidates]]; IvfRetrainSpec asserts equality, the
    * zero-file-overlap swap, and v1 isolation).
    *
    * Scale notes (100 TB): retrain cost is the one full Lloyd's pass — the
    * price the append path amortizes away between refreshes — but the SWAP
    * is one metadata rename regardless of corpus size, and probes keep
    * manifest-level cell pruning across the swap. */
  private def ivfRetrainMemoKey(d: String) = s"ivf_retrain_v1|$d"

  def ivfRetrainIndexPath(s: org.apache.spark.sql.SparkSession, d: String): java.nio.file.Path =
    Housekeeping.memoGet("ivf_retrain_store", ivfRetrainMemoKey(d)).getOrElse {
      Housekeeping.memoPut("ivf_retrain_store", ivfRetrainMemoKey(d), dir => {
        graft.functions.GraftFunctions.register(s)
        val corpus = Housekeeping.cacheBounded("ivf_retrain_corpus",
          withVec(Tables.embeddings(s, d), "neighbor_id", "vc", "nc"))
        // one generation = one centroid table + the full corpus's inverted
        // file against it; the returned file list is what the version commits
        def writeGen(gen: Int, cents: DataFrame): Seq[java.nio.file.Path] = {
          cents.write.mode("overwrite").parquet(dir.resolve(s"centroids/gen$gen").toString)
          assignToCells(corpus, cents).withColumn("cell_dir", col("cell"))
            .write.mode("overwrite").partitionBy("cell_dir")
            .parquet(dir.resolve(s"cells/gen$gen").toString)
          TableManifest.parquetFiles(dir.resolve(s"centroids/gen$gen")) ++
            TableManifest.parquetFiles(dir.resolve(s"cells/gen$gen"))
        }
        val base = corpus.where(pmod(col("neighbor_id"), lit(5)) =!= 0)
        TableManifest.commit(dir, 1, writeGen(1, ivfCentroidsOf(s, ivfTrain(s, base))))
        TableManifest.commit(dir, 2, writeGen(2, ivfCentroidsOf(s, ivfTrain(s, corpus))))
      })
    }

  /** Probe a retrain/swap index AS OF a manifest version: the version's file
    * list carries the centroid generation AND its cell files together, so
    * the reader's quantizer and inverted file can never mix generations. */
  def ivfSwapProbe(s: org.apache.spark.sql.SparkSession, d: String,
                   idx: java.nio.file.Path, version: Long): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val (centFiles, cellFiles) = TableManifest.filesAsOf(idx, version)
      .partition(_.toString.contains("/centroids/"))
    cellFileProbe(s, d, s.read.parquet(centFiles.map(_.toString): _*), cellFiles)
  }

  /** The from-scratch rebuild the swap replaces, probed in memory — must
    * equal probe(v2) row-exactly (IvfRetrainSpec). */
  def ivfRetrainRebuildCandidates(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val corpus = withVec(Tables.embeddings(s, d), "neighbor_id", "vc", "nc")
    val cents = ivfCentroidsOf(s, ivfTrain(s, corpus))
    broadcast(ivfProbes(s, d, cents)).join(assignToCells(corpus, cents), Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("vq"), col("vc")) / (col("nq") * col("nc"))).as("sim"))
  }

  val simSearchAnnIvfRetrain: Op = Op(
    "sim_search_ann_ivf_retrain",
    (s, d) => stageAndRank("ann_ivf_retrain_cand",
      ivfSwapProbe(s, d, ivfRetrainIndexPath(s, d), 2L), annIvfRetrainStagePath(d)),
    Some(annRerankOracle(Stage.token + "/ann_ivf_retrain_cand")))

  def ivfDriftStagePath(sfDir: String): String = Stage.root(sfDir) + "/ivf_drift_cells"

  /** IVF DRIFT REPORT — the monitoring op that closes the index lifecycle
    * loop (build → probe → append → **drift-report** → retrain → swap): the
    * append path keeps the quantizer FROZEN, so after enough appends the
    * centroids no longer describe the data and recall decays silently. This
    * report reads NOTHING but the index's own manifests: per cell, the v1
    * (build-time) occupancy vs the current v2 occupancy, each cell's
    * appended fraction, a hot-cell flag (cell over 2× the average — the
    * probe-cost skew signal), and the global appended fraction — the number
    * an operator thresholds to trigger [[simSearchAnnIvfRetrain]]'s
    * retrain-and-swap. Cost at 100 TB: one pass over the index FILES (not
    * the corpus) per version — two map-side-combinable per-cell counts, a
    * key-to-key join on |cells| rows, one broadcast 1-row total; in a real
    * deployment the per-file row counts already sit in the manifest and
    * this becomes pure metadata work. Share math is integer (×10⁶,
    * integer-div; totals cast BIGINT — DuckDB SUM(BIGINT) is HUGEINT
    * otherwise). Per-cell counts are staged ([[Stage]] playbook) and the
    * oracle recomputes the report from the same bytes; IvfDriftSpec pins
    * the staged counts against the corpus's exact base/delta split. */
  /** Build + stage the per-cell v1/v2 occupancy counts off the append
    * index's own manifests — the measured half of the drift report, shared
    * by the report key and the autorefresh decision ([[ivfDriftPpm]]):
    * both must read the SAME staged artifact or the monitor and the
    * trigger could disagree. */
  private val driftCellsStagedFor =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ivfDriftCellsStaged(s: org.apache.spark.sql.SparkSession,
                                  d: String): DataFrame = {
    // the MEASUREMENT is memoized per sfDir (round-16 ADVICE): an
    // autorefresh run plus a drift-report run in one JVM pay the per-cell
    // counting and the parquet restage ONCE. Only the staged PATH is
    // memoized — each caller re-reads the tiny artifact through its own
    // session, because a Dataset object shared across test/executor
    // threads can carry a dead plan session (SparkPlan.session NPE under
    // parallel suites).
    val path = driftCellsStagedFor.computeIfAbsent(d, _ => {
      val cellsDir = ivfAppendIndexPath(s, d).resolve("cells")
      def perCell(version: Long, name: String): DataFrame =
        s.read.parquet(TableManifest.filesAsOf(cellsDir, version).map(_.toString): _*)
          .groupBy(col("cell").cast("int").as("cell"))
          .agg(count(lit(1)).as(name))
      // v2 ⊇ v1 by the append contract (v1 files retained by reference), so
      // right-join on the v2 side; a cell trained but left empty at build
      // time can still gain delta rows → n_base coalesces to 0
      perCell(1L, "n_base").join(perCell(2L, "n_total"), Seq("cell"), "right")
        .na.fill(0L, Seq("n_base"))
        .coalesce(1).write.mode("overwrite").parquet(ivfDriftStagePath(d))
      ivfDriftStagePath(d)
    })
    s.read.parquet(path)
  }

  /** The index's global appended fraction (ppm), read OFF THE STAGED DRIFT
    * CELLS — the one number the autorefresh thresholds. Driver-side over
    * a 2-long aggregate row; same integer math as the report's
    * `index_added_ppm` column. An EMPTY index (zero cells → null sums)
    * reports 0 drift: nothing was appended to nothing, and an autorefresh
    * must not fire on it (the round-15 ADVICE NPE/zero-division guard). */
  private[graft] def ivfDriftPpm(s: org.apache.spark.sql.SparkSession, d: String): Long = {
    val r = ivfDriftCellsStaged(s, d)
      .agg(sum(col("n_total")).as("tot"), sum(col("n_base")).as("totb")).first()
    if (r.isNullAt(0) || r.getLong(0) == 0L) 0L
    else (r.getLong(0) - r.getLong(1)) * 1000000L / r.getLong(0)
  }

  val simSearchIvfDriftReport: Op = Op(
    "sim_search_ivf_drift_report",
    (s, d) => {
      val staged = ivfDriftCellsStaged(s, d)
      val t = staged.agg(sum(col("n_total")).as("tot"), sum(col("n_base")).as("totb"),
        count(lit(1)).as("ncells"))
      staged.crossJoin(broadcast(t))
        .select(col("cell"), col("n_base"), col("n_total"),
          (col("n_total") - col("n_base")).as("n_added"),
          expr("CAST(((n_total - n_base) * 1000000) DIV n_total AS BIGINT)")
            .as("added_frac_ppm"),
          // n_total > (tot*2) DIV ncells ≡ n_total * ncells > tot * 2 for
          // positive integers, without the per-cell Long multiply that wraps
          // on Spark but raises on DuckDB at extreme occupancies
          when(col("n_total") > expr("(tot * 2) DIV ncells"), 1)
            .otherwise(0).cast("int").as("hot_flag"),
          expr("CAST(((tot - totb) * 1000000) DIV tot AS BIGINT)").as("index_added_ppm"))
        .orderBy("cell")
    },
    Some("WITH c AS (SELECT cell, n_base, n_total FROM read_parquet('" +
      Stage.token + "/ivf_drift_cells/*.parquet')), " +
      "t AS (SELECT CAST(SUM(n_total) AS BIGINT) AS tot, " +
      "CAST(SUM(n_base) AS BIGINT) AS totb, COUNT(*) AS ncells FROM c) " +
      "SELECT cell, n_base, n_total, n_total - n_base AS n_added, " +
      "(n_total - n_base) * 1000000 // n_total AS added_frac_ppm, " +
      "CAST(CASE WHEN n_total > tot * 2 // ncells THEN 1 ELSE 0 END AS INT) AS hot_flag, " +
      "(tot - totb) * 1000000 // tot AS index_added_ppm " +
      "FROM c, t ORDER BY cell"))

  def annIvfAutorefreshStagePath(sfDir: String): String =
    Stage.root(sfDir) + "/ann_ivf_autorefresh_cand"

  /** DRIFT-TRIGGERED AUTOREFRESH (round 15; the round-14 verdict's #3) —
    * the op that CLOSES the index lifecycle loop the drift report only
    * monitored: read the staged drift cells ([[ivfDriftPpm]] — the same
    * artifact `sim_search_ivf_drift_report` publishes), threshold the
    * global appended fraction against `graft.ivf.refresh.ppm` (default
    * 100 000 ppm = 10 %), and
    *
    *   - ABOVE the floor: execute the retrain-and-swap
    *     ([[ivfRetrainIndexPath]] — full Lloyd's over base ∪ delta, new
    *     quantizer + inverted file committed as one atomic manifest
    *     version) and probe the swapped v2;
    *   - BELOW it: probe the CURRENT append index as-is — an explicit
    *     no-op, because a retrain that fires on every tick would pay the
    *     full-corpus Lloyd's pass the append path exists to amortize.
    *
    * This corpus's append delta is exactly 1/5 of the index (200 000 ppm),
    * so the default floor FIRES and the staged probe must equal the
    * retrain key's row-exactly; IvfAutorefreshSpec pins both branches (a
    * sky-high conf'd floor proves the no-op path equals the append
    * probe) and the measured ppm itself. Scale notes (100 TB): the
    * decision costs one metadata-only pass over the index manifests; the
    * retrain — when it fires — is the declared full-Lloyd's price, and
    * the swap one rename. Oracle: the standard staged-candidate re-rank,
    * valid for WHICHEVER branch ran, because DuckDB re-verifies every
    * staged candidate's cosine and the downstream ranking is exact. */
  val simSearchAnnIvfAutorefresh: Op = Op(
    "sim_search_ann_ivf_autorefresh",
    (s, d) => {
      val ppm = ivfDriftPpm(s, d)
      val floor = s.conf.getOption("graft.ivf.refresh.ppm")
        .map(_.toLong).getOrElse(100000L)
      val cand =
        if (ppm >= floor) ivfSwapProbe(s, d, ivfRetrainIndexPath(s, d), 2L)
        else {
          val idx = ivfAppendIndexPath(s, d)
          ivfManifestProbe(s, d, idx, TableManifest.read(idx.resolve("cells"))._1)
        }
      stageAndRank("ann_ivf_autorefresh_cand", cand, annIvfAutorefreshStagePath(d))
    },
    Some(annRerankOracle(Stage.token + "/ann_ivf_autorefresh_cand")))

  /** Product-quantization ANN (PQ + ADC re-rank) — the memory-compressed
    * third leg of the ANN family: each vector is split into [[PqM]]
    * subvectors and each subvector replaced by the id of its nearest
    * per-subspace centroid ([[PqK]] per subspace; fixed-seed
    * [[PqIters]]-iteration Lloyd's under the same determinism discipline as
    * [[ivfTrained]] — exact-decimal centroid means, fixed-order-fold double
    * distances, ties to the lowest cell id), collapsing the corpus to
    * M·log₂K = 16 bits of code per vector plus its stored norm. Search is
    * asymmetric distance computation: a query scores the M·K-row codebook
    * once (partial dot per (sub, cell)), every corpus vector's approximate
    * dot is then an M-term table lookup — spelled as a broadcast equi-join
    * on (sub, cell) plus a FIXED-ORDER fold over the collected partials
    * (array_sort by sub → aggregate), so the double sum is bit-stable under
    * any partitioning. The ADC shortlist (top-[[PqShortlist]] per query by
    * approximate sim, ties to the lowest neighbor id) pays exact cosine on
    * full vectors and the usual top-5 window ranks it — the standard PQ
    * re-rank lifecycle, oracled by the same persisted-candidate playbook as
    * the other ANN keys (the approximation IS the staged shortlist;
    * everything downstream is exact and DuckDB re-verifies every staged sim
    * against its own cosine).
    *
    * Scale notes (100 TB): the codebook is M·K = 64 rows (driver-bounded
    * exactly like the IVF centroid table); corpus-side cost is one scan
    * emitting M code rows per vector and a broadcast join — no pair space,
    * and nothing shuffles at corpus width except the code rows themselves.
    * The codes table is ~1/128 of the raw vector bytes, which is the entire
    * point: at 100 TB the ADC pass runs over codes that fit in cluster
    * memory when raw vectors never could, and only shortlist·queries full
    * vectors are ever fetched for the exact re-rank. AnnPqSpec pins the
    * recall floor on the uniform-random corpus (PQ's worst case — no
    * cluster structure for the codebooks to exploit) and the shortlist
    * work bound. */
  private val PqM = 4
  private val PqK = 16
  private val PqIters = 2
  private val PqShortlist = 48

  /** (id, sub, sv) subvector rows; dsub derives from the vector length so
    * the split never hardcodes the embedding dim. */
  private def pqSubrows(vec: DataFrame, idCol: String): DataFrame = {
    val dsub = (size(col("v")) / PqM).cast("int")
    vec.select(col(idCol), col("v"), explode(sequence(lit(0), lit(PqM - 1))).as("sub"))
      .select(col(idCol), col("sub"), slice(col("v"), col("sub") * dsub + 1, dsub).as("sv"))
  }

  /** Per-subspace centroids of an assignment: exact-decimal per-dimension
    * means keyed by (sub, cell); the ≤ M·K-row result is collected and
    * re-seeded flat per Lloyd iteration (see [[ivfCentroidsOf]] for why the
    * driver round-trip beats compounding the training lineage). */
  private def pqCentroidsOf(s: org.apache.spark.sql.SparkSession,
                            assigned: DataFrame): DataFrame = {
    val computed = assigned
      .select(col("sub"), col("cell"), posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy("sub", "cell", "pos")
      .agg(avg(col("x").cast("decimal(27,12)")).cast("double").as("m"))
      .groupBy("sub", "cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        p => p.getField("m")).as("cv"))
    val rows = computed.collect().toSeq
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava), computed.schema)
  }

  /** Nearest-centroid codes for subvector rows: L2 argmin
    * (d² = |sv|² − 2·sv·cv + |cv|², all fixed-order dots), ties to the
    * lowest cell id via the lexicographic struct-min. Keeps `sv` so the
    * next Lloyd iteration can recompute means from the same rows. */
  private def pqAssign(subrows: DataFrame, cents: DataFrame, idCol: String): DataFrame =
    subrows.join(broadcast(cents), Seq("sub"))
      .select(col(idCol), col("sub"), col("sv"), col("cell"),
        (dot(col("sv"), col("sv")) - lit(2.0) * dot(col("sv"), col("cv")) +
          dot(col("cv"), col("cv"))).as("d2"))
      .groupBy(idCol, "sub")
      .agg(min(struct(col("d2"), col("cell"))).getField("cell").as("cell"),
        first(col("sv")).as("sv"))

  /** Fixed-seed, fixed-iteration per-subspace Lloyd's: (neighbor_id, sub,
    * cell, sv) — deterministic, so every build of the same corpus yields
    * bit-identical codes. */
  private def pqTrained(s: org.apache.spark.sql.SparkSession,
                        subrows: DataFrame): DataFrame = {
    val seed = subrows.withColumn("cell",
      ((col("neighbor_id") + col("sub")) % PqK).cast("int"))
    (1 to PqIters).foldLeft(seed) { (assigned, _) =>
      pqAssign(subrows, pqCentroidsOf(s, assigned), "neighbor_id")
    }
  }

  /** ADC shortlist → exact-cosine candidate rows (query_id, neighbor_id,
    * sim) for [[stageAndRank]]. Exposed for AnnPqSpec's recall/work
    * assertions. */
  def pqCandidates(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val corpus = Housekeeping.cacheBounded("pq_corpus",
      withVec(Tables.embeddings(s, d), "neighbor_id", "vc", "nc"))
    val subrows = Housekeeping.cacheBounded("pq_subrows",
      pqSubrows(corpus.select(col("neighbor_id"), col("vc").as("v")), "neighbor_id"))
    val trained = Housekeeping.cacheBounded("pq_codes", pqTrained(s, subrows))
    val cents = pqCentroidsOf(s, trained)
    val codes = trained.select("neighbor_id", "sub", "cell")
    val queries = Housekeeping.cacheBounded("pq_queries",
      withVec(Tables.embeddings(s, d), "query_id", "vq", "nq").where(col("query_id") < 10))
    // queries×M×K ADC lookup table — one partial dot per (query, sub, cell)
    val lut = pqSubrows(queries.select(col("query_id"), col("vq").as("v")), "query_id")
      .join(broadcast(cents), Seq("sub"))
      .select(col("query_id"), col("sub"), col("cell"), dot(col("sv"), col("cv")).as("pdot"))
    // Dense per-query ADC LUT (round 18, guide §4 — codegen-friendly hot
    // path): pivot the (query, sub, cell, pdot) rows into ONE 64-slot array
    // per query indexed sub·PqK + cell (cells no training row ever produced
    // are padded 0.0 — no code word can reference them, since codes are
    // assignments against the same centroid table). The probe then reads
    // each of the M terms with element_at — whole-stage-codegen arithmetic —
    // instead of re-grouping M joined rows per (query, neighbor) pair
    // through an interpreted collect_list/array_sort/aggregate fold, and
    // the probe's row count drops from Q·M·N joined rows to Q·N.
    val lutDense = lut.groupBy("query_id")
      .agg(map_from_entries(collect_list(struct(
        (col("sub") * PqK + col("cell")).as("k"), col("pdot").as("v")))).as("m"))
      .select(col("query_id"),
        transform(sequence(lit(0), lit(PqM * PqK - 1)),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("lut"))
    // Per-neighbor code word as an M-array in sub order: every neighbor
    // carries exactly subs 0..PqM-1 (pqAssign groups on (id, sub)), so the
    // sorted positions ARE the subs.
    val codeWords = codes.groupBy("neighbor_id")
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("cell")))),
        x => x.getField("cell")).as("cells"))
    // adot = 0.0 + Σ_sub lut[sub·PqK + cells[sub]] — the identical
    // left-to-right IEEE fold the collect_list/array_sort/aggregate
    // spelling produced, so every adot (hence the shortlist) is bit-equal.
    val adot = (0 until PqM).foldLeft(lit(0.0)) { (acc, sub) =>
      acc + element_at(col("lut"),
        (lit(sub * PqK) + element_at(col("cells"), sub + 1) + lit(1)).cast("int"))
    }
    val wShort = Window.partitionBy("query_id")
      .orderBy(col("asim").desc, col("neighbor_id").asc)
    val shortlist = codeWords.crossJoin(broadcast(lutDense))
      .select(col("query_id"), col("neighbor_id"), adot.as("adot"))
      .join(corpus.select("neighbor_id", "nc"), "neighbor_id")
      .join(broadcast(queries.select("query_id", "nq")), "query_id")
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("asim", col("adot") / (col("nq") * col("nc")))
      .withColumn("sr", row_number().over(wShort))
      .where(col("sr") <= PqShortlist)
    shortlist.select("query_id", "neighbor_id")
      .join(corpus, "neighbor_id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("vq"), col("vc"), col("nq"), col("nc")).as("sim"))
  }

  def annPqStagePath(sfDir: String): String = Stage.root(sfDir) + "/ann_pq_cand"

  val simSearchAnnPq: Op = Op(
    "sim_search_ann_pq",
    (s, d) => stageAndRank("ann_pq_cand", pqCandidates(s, d), annPqStagePath(d)),
    Some(annRerankOracle(Stage.token + "/ann_pq_cand")))

  /** HYBRID retrieval with reciprocal-rank fusion — the two-channel search
    * every production RAG stack runs: a LEXICAL channel (distinct-word
    * overlap scored through an inverted-index equi-join — word → postings,
    * never query×corpus) and a VECTOR channel (exact cosine, broadcast
    * queries) each produce a per-query top-20; RRF fuses them as
    * Σ 10⁶ div (60 + rank) over the channels a doc appears in (the
    * standard k=60 constant) — ranks are INTEGERS, so the fusion needs no
    * cross-engine float score calibration, which is exactly why RRF is the
    * fusion rule of choice in practice. Final contract: top-5 per query by
    * (fused score, doc id).
    *
    * Oracle: lexical ranks recompute exactly in SQL (integer overlap
    * counts); the vector channel stages its top-20 with Spark sims and
    * DuckDB re-ranks on the staged value with the 1e-5 cosine-parity guard
    * per pair (the ANN-family playbook); fusion and the final window are
    * recomputed end to end.
    *
    * Scale notes (100 TB): the lexical channel is the inverted-index join
    * (rows ∝ postings of the query terms, with the usual df-cutoff guard
    * available for stopword-heavy queries); the vector channel composes
    * with ANY of the ANN keys — swap the exact scorer for
    * `sim_search_ann_probe`'s cell-partitioned probe and fusion is
    * unchanged, because RRF consumes only ranks. */
  val simSearchHybridRrf: Op = Op(
    "sim_search_hybrid_rrf",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, d)
      val qText = docs.where(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("text"))
      // lexical: inverted-index overlap → per-query top-20
      val qw = qText.select(col("query_id"),
        explode(array_distinct(split(col("text"), " "))).as("wd"))
      val dwords = docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("wd"))
      val wLex = Window.partitionBy("query_id")
        .orderBy(col("overlap").desc, col("doc_id").asc)
      val lex = broadcast(qw).join(dwords, "wd")
        .where(col("doc_id") =!= col("query_id"))
        .groupBy("query_id", "doc_id").agg(count(lit(1)).as("overlap"))
        .withColumn("rank_lex", row_number().over(wLex))
        .where(col("rank_lex") <= 20)
        .select("query_id", "doc_id", "rank_lex")
      // vector: exact cosine top-20, staged for the oracle's parity re-rank
      val corpus = withVec(Tables.embeddings(s, d), "neighbor_id", "vc", "nc")
      val queries = withVec(Tables.embeddings(s, d), "query_id", "vq", "nq")
        .where(col("query_id") < 10)
      val wVec = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
      val vecTop = Housekeeping.cacheBounded("hybrid_vec",
        broadcast(queries).join(corpus, col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            cosine(col("vq"), col("vc"), col("nq"), col("nc")).as("sim"))
          .withColumn("rank_vec", row_number().over(wVec))
          .where(col("rank_vec") <= 20))
      vecTop.select("query_id", "neighbor_id", "sim")
        .coalesce(1).write.mode("overwrite").parquet(hybridStagePath(d))
      val vec = vecTop.select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank_vec"))
      // RRF fusion over the channel union; ranks are ints, fusion is exact
      val wFuse = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id").asc)
      lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(expr("cast(1000000 div (60 + rank_lex) as bigint)"), lit(0L)) +
            coalesce(expr("cast(1000000 div (60 + rank_vec) as bigint)"), lit(0L)))
        .withColumn("rank", row_number().over(wFuse))
        .where(col("rank") <= 5)
        .select("query_id", "rank", "doc_id", "rrf")
        .orderBy("query_id", "rank")
    },
    Some("WITH qd AS (SELECT doc_id AS query_id, text FROM documents WHERE doc_id < 10), " +
      "qw AS (SELECT query_id, unnest(list_distinct(string_split(text, ' '))) AS wd FROM qd), " +
      "dw AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS wd FROM documents), " +
      "ov AS (SELECT qw.query_id, dw.doc_id, COUNT(*) AS overlap FROM qw JOIN dw USING (wd) " +
      "WHERE dw.doc_id <> qw.query_id GROUP BY 1, 2), " +
      "lex AS (SELECT query_id, doc_id, rank_lex FROM (SELECT query_id, doc_id, " +
      "CAST(row_number() OVER (PARTITION BY query_id ORDER BY overlap DESC, doc_id) AS INT) " +
      "AS rank_lex FROM ov) WHERE rank_lex <= 20), " +
      "vc AS (SELECT c.query_id, c.neighbor_id AS doc_id, c.sim FROM " +
      s"read_parquet('${Stage.token}/hybrid_vec_top/*.parquet') c " +
      "JOIN embeddings a ON a.vec_id = c.query_id JOIN embeddings b ON b.vec_id = c.neighbor_id " +
      "WHERE abs(list_cosine_similarity(a.embedding, b.embedding) - c.sim) <= 1e-5), " +
      "vec AS (SELECT query_id, doc_id, CAST(row_number() OVER " +
      "(PARTITION BY query_id ORDER BY sim DESC, doc_id) AS INT) AS rank_vec FROM vc), " +
      "fused AS (SELECT COALESCE(lex.query_id, vec.query_id) AS query_id, " +
      "COALESCE(lex.doc_id, vec.doc_id) AS doc_id, " +
      "COALESCE(CAST(1000000 // (60 + rank_lex) AS BIGINT), 0) + " +
      "COALESCE(CAST(1000000 // (60 + rank_vec) AS BIGINT), 0) AS rrf " +
      "FROM lex FULL JOIN vec ON lex.query_id = vec.query_id AND lex.doc_id = vec.doc_id) " +
      "SELECT query_id, rank, doc_id, rrf FROM (SELECT query_id, doc_id, rrf, " +
      "CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS INT) AS rank " +
      "FROM fused) WHERE rank <= 5 ORDER BY query_id, rank"))

  def hybridStagePath(sfDir: String): String = Stage.root(sfDir) + "/hybrid_vec_top"

  // ------------------------------------------------------ similarity search

  /** Embedding vector as doubles + its L2 norm. The dot product is the
    * custom codegen expression [[graft.functions.DotProduct]] — same strictly
    * left-to-right accumulation as the higher-order-function spelling, ~5×
    * faster on the n² pair space (see its scaladoc). */
  private def withVec(df: DataFrame, idAs: String, vecAs: String, normAs: String): DataFrame =
    df.select(col("vec_id").as(idAs),
      transform(col("embedding"), x => x.cast("double")).as(vecAs))
      .withColumn(normAs, sqrt(graft.functions.GraftFunctions.dot(col(vecAs), col(vecAs))))

  private def cosine(va: Column, vb: Column, na: Column, nb: Column): Column =
    graft.functions.GraftFunctions.dot(va, vb) / (na * nb)

  /** Exact global top-20 most-similar pairs (§2's brute-force baseline — the
    * ANN families above are the approximate width path). Pair generation is
    * the sharded exact stage [[blockedAllPairs]]: every pair is still scored
    * (that is what "exact" costs), but as an equi-join shard instead of a
    * corpus-broadcast nested loop. Emits ranked id pairs only: Spark's double
    * cosine and DuckDB's list_cosine_similarity agree on ordering (clear gaps
    * between neighbors) but not on low-order bits, so the similarity value
    * itself stays out of the hash (SURVEY §7.4#1). */
  val simSearchTopk: Op = Op(
    "sim_search_topk",
    (s, d) => {
      // (ids, sim) only into the top-k: orderBy+limit compiles to
      // TakeOrderedAndProject (per-partition heaps, no global sort of the
      // n² pair space, no embedding arrays in the sort); the rank window then
      // runs over 20 rows.
      val top = blockedAllPairs(s, d)
        .orderBy(col("sim").desc, col("vec_id_a").asc, col("vec_id_b").asc)
        .limit(20)
      val w = Window.orderBy(col("sim").desc, col("vec_id_a").asc, col("vec_id_b").asc)
      top.withColumn("rank", row_number().over(w))
        .select("rank", "vec_id_a", "vec_id_b")
        .orderBy("rank")
    },
    Some("SELECT rank, vec_id_a, vec_id_b FROM (SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, " +
      "CAST(row_number() OVER (ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, " +
      "a.vec_id, b.vec_id) AS INT) AS rank FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) " +
      "WHERE rank <= 20 ORDER BY rank"))

  /** Per-query 5-NN for 10 fixed query vectors; the query side is tiny and
    * broadcast, so the corpus streams through a single stage. */
  val simSearchKnnPerQuery: Op = Op(
    "sim_search_knn_per_query",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val q = withVec(Tables.embeddings(s, d), "query_id", "vq", "nq").where(col("query_id") < 10)
      val c = withVec(Tables.embeddings(s, d), "neighbor_id", "vc", "nc")
      val w = Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("neighbor_id").asc)
      broadcast(q).join(c, col("neighbor_id") =!= col("query_id"))
        .withColumn("sim", cosine(col("vq"), col("vc"), col("nq"), col("nc")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    },
    Some("SELECT query_id, rank, neighbor_id FROM (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, " +
      "CAST(row_number() OVER (PARTITION BY a.vec_id ORDER BY " +
      "list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS INT) AS rank " +
      "FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id WHERE a.vec_id < 10) " +
      "WHERE rank <= 5 ORDER BY query_id, rank"))

  def mmrQcStagePath(sfDir: String): String = Stage.root(sfDir) + "/mmr_qc"
  def mmrCcStagePath(sfDir: String): String = Stage.root(sfDir) + "/mmr_cc"

  /** MMR (maximal-marginal-relevance) DIVERSIFIED RE-RANK — the retrieval
    * op plain top-k cannot express: the top-k of a dense corpus region is
    * k near-copies of the same content; MMR greedily picks
    * argmax(λ·sim(q,d) − (1−λ)·max_{s∈picked} sim(d,s)), trading relevance
    * against redundancy (λ = 0.7, k = 3 here). The greedy loop is UNROLLED
    * into three declarative argmax stages over the per-query candidate
    * table (10 candidates/query from the exact broadcast kNN — at 100 TB
    * the candidate generator is any of the ANN families; MMR's cost is
    * ∝ queries·candidates², never corpus-sized), each stage one window
    * row_number + small equi-joins — no driver loop, no collect. Both the
    * query→candidate and candidate↔candidate sims are staged ([[Stage]]
    * playbook, both orientations for join simplicity) and the oracle
    * replays the same unrolled greedy from the same bytes, re-verifying
    * every staged sim against DuckDB's own cosine (the [[annRerankOracle]]
    * discipline). Scores are single IEEE ops over identical staged doubles
    * (0.7·s − 0.3·m, GREATEST) — identical on both engines; ties break on
    * neighbor_id. */
  val simSearchMmrRerank: Op = Op(
    "sim_search_mmr_rerank",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val q = withVec(Tables.embeddings(s, d), "query_id", "vq", "nq").where(col("query_id") < 10)
      val c = withVec(Tables.embeddings(s, d), "neighbor_id", "vc", "nc")
      val wTop = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
      val cand = Housekeeping.cacheBounded("mmr_cand",
        broadcast(q).join(c, col("neighbor_id") =!= col("query_id"))
          .withColumn("sim", cosine(col("vq"), col("vc"), col("nq"), col("nc")))
          .withColumn("rank", row_number().over(wTop))
          .where(col("rank") <= 10)
          .select("query_id", "neighbor_id", "sim", "vc", "nc"))
      val qc = cand.select("query_id", "neighbor_id", "sim")
      qc.coalesce(1).write.mode("overwrite").parquet(mmrQcStagePath(d))
      val cc = Housekeeping.cacheBounded("mmr_cc",
        cand.as("x").join(cand.as("y"),
            col("x.query_id") === col("y.query_id") &&
              col("x.neighbor_id") =!= col("y.neighbor_id"))
          .select(col("x.query_id").as("query_id"), col("x.neighbor_id").as("a"),
            col("y.neighbor_id").as("b"),
            cosine(col("x.vc"), col("y.vc"), col("x.nc"), col("y.nc")).as("sim")))
      cc.coalesce(1).write.mode("overwrite").parquet(mmrCcStagePath(d))

      def argmax(df: DataFrame, score: Column): DataFrame = {
        val w = Window.partitionBy("query_id").orderBy(score.desc, col("neighbor_id").asc)
        df.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("query_id"), col("neighbor_id"))
      }
      val p1 = argmax(qc, col("sim")).withColumnRenamed("neighbor_id", "p1")
      val s2 = qc.join(p1, "query_id").where(col("neighbor_id") =!= col("p1"))
        .join(cc.select(col("query_id"), col("a"), col("b"), col("sim").as("sim1")),
          Seq("query_id"))
        .where(col("a") === col("neighbor_id") && col("b") === col("p1"))
        .withColumn("score", lit(0.7) * col("sim") - lit(0.3) * col("sim1"))
      val p2 = argmax(s2, col("score")).withColumnRenamed("neighbor_id", "p2")
      val s3 = qc.join(p1, "query_id").join(p2, "query_id")
        .where(col("neighbor_id") =!= col("p1") && col("neighbor_id") =!= col("p2"))
        .join(cc.select(col("query_id"), col("a"), col("b"), col("sim").as("sim1")),
          Seq("query_id"))
        .where(col("a") === col("neighbor_id") && col("b") === col("p1"))
        .drop("a", "b")
        .join(cc.select(col("query_id"), col("a"), col("b"), col("sim").as("sim2")),
          Seq("query_id"))
        .where(col("a") === col("neighbor_id") && col("b") === col("p2"))
        .withColumn("score",
          lit(0.7) * col("sim") - lit(0.3) * greatest(col("sim1"), col("sim2")))
      val p3 = argmax(s3, col("score")).withColumnRenamed("neighbor_id", "p3")
      p1.select(col("query_id"), lit(1).as("pick"), col("p1").as("neighbor_id"))
        .unionByName(p2.select(col("query_id"), lit(2).as("pick"), col("p2").as("neighbor_id")))
        .unionByName(p3.select(col("query_id"), lit(3).as("pick"), col("p3").as("neighbor_id")))
        .orderBy("query_id", "pick")
    },
    Some("WITH qc AS (SELECT c.query_id, c.neighbor_id, c.sim FROM read_parquet('" +
      Stage.token + "/mmr_qc/*.parquet') c " +
      "JOIN embeddings a ON a.vec_id = c.query_id JOIN embeddings b ON b.vec_id = c.neighbor_id " +
      "WHERE abs(list_cosine_similarity(a.embedding, b.embedding) - c.sim) <= 1e-5), " +
      "cc AS (SELECT c.query_id, c.a, c.b, c.sim FROM read_parquet('" +
      Stage.token + "/mmr_cc/*.parquet') c " +
      "JOIN embeddings x ON x.vec_id = c.a JOIN embeddings y ON y.vec_id = c.b " +
      "WHERE abs(list_cosine_similarity(x.embedding, y.embedding) - c.sim) <= 1e-5), " +
      "p1 AS (SELECT query_id, neighbor_id AS p FROM (SELECT query_id, neighbor_id, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn FROM qc) WHERE rn = 1), " +
      "s2 AS (SELECT q.query_id, q.neighbor_id, 0.7 * q.sim - 0.3 * c1.sim AS score " +
      "FROM qc q JOIN p1 ON p1.query_id = q.query_id AND q.neighbor_id <> p1.p " +
      "JOIN cc c1 ON c1.query_id = q.query_id AND c1.a = q.neighbor_id AND c1.b = p1.p), " +
      "p2 AS (SELECT query_id, neighbor_id AS p FROM (SELECT query_id, neighbor_id, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn FROM s2) WHERE rn = 1), " +
      "s3 AS (SELECT q.query_id, q.neighbor_id, " +
      "0.7 * q.sim - 0.3 * greatest(c1.sim, c2.sim) AS score " +
      "FROM qc q JOIN p1 ON p1.query_id = q.query_id JOIN p2 ON p2.query_id = q.query_id " +
      "AND q.neighbor_id <> p1.p AND q.neighbor_id <> p2.p " +
      "JOIN cc c1 ON c1.query_id = q.query_id AND c1.a = q.neighbor_id AND c1.b = p1.p " +
      "JOIN cc c2 ON c2.query_id = q.query_id AND c2.a = q.neighbor_id AND c2.b = p2.p), " +
      "p3 AS (SELECT query_id, neighbor_id AS p FROM (SELECT query_id, neighbor_id, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn FROM s3) WHERE rn = 1) " +
      "SELECT query_id, CAST(1 AS INT) AS pick, p AS neighbor_id FROM p1 " +
      "UNION ALL SELECT query_id, CAST(2 AS INT), p FROM p2 " +
      "UNION ALL SELECT query_id, CAST(3 AS INT), p FROM p3 " +
      "ORDER BY query_id, pick"))

  /** Corpus-side LSH candidate pairs for the k-NN graph: the SAME fixed
    * random-hyperplane tables as [[lshCandidates]], self-joined — a pair is
    * a candidate when its two bucket codes are within Hamming distance 1 in
    * ANY table (the 1-bit multi-probe applied to one side of the equi-join;
    * XOR symmetry makes the asymmetric probe cover both directions).
    * Dedup across (table, probe) hits is the cheap per-pair `max(sim)`
    * (copies carry the identical double). UNDIRECTED rows (src < dst).
    *
    * Scale shape: an equi-join on (table, bucket) — the corpus never pays
    * the n² pair space as ONE JOB; candidate volume ∝ Σ bucket-occupancy
    * pairs. At FIXED code width that is still ~n²/2^bits per table, so the
    * bucket count TRACKS the corpus automatically ([[knnLshBitsFor]]:
    * ⌈log₂ n⌉ − 3, expected occupancy ≈ 8 at any size) and the probe radius
    * widens to Hamming-2 once the code is wide enough to afford it
    * ([[knnLshProbeFor]]) — `graft.knn.lsh.bits` / `graft.knn.lsh.probe`
    * override both. Each +1 bit halves expected occupancy and with it
    * candidate work, at the usual recall-per-probe price.
    * KnnGraphRecallSpec pins all directions: the recall floors (0.60 at the
    * 500-vector testdata, 0.80 at the 8192-vector uniform fixture where
    * Hamming-2 fires), strictly shrinking candidate work as bits grow, and
    * the work bound under the pair space. Uniform-random embeddings are
    * the worst case throughout — real corpora cluster, and clustered
    * buckets prune far harder at the same width. */
  val KnnLshBitsConf = "graft.knn.lsh.bits"
  val KnnLshProbeConf = "graft.knn.lsh.probe"

  /** AUTO-SIZED code width (round 14; the round-13 verdict's #5): the fixed
    * default was right for 10²–10⁴ corpora but a 10⁹-vector corpus run at 6
    * bits quietly does ~n²/64-per-table work. ⌈log₂ n⌉ − 3 keeps expected
    * bucket occupancy ≈ 2³ = 8 AT EVERY CORPUS SIZE, so candidate work stays
    * ∝ n·probes·8 instead of n²/2^bits — the width tracks the corpus the way
    * the round-13 verdict required. Clamped to [4, 24]; the manual conf
    * still wins (KnnGraphRecallSpec pins the monotone-knob property). */
  private[graft] def knnLshBitsFor(n: Long): Int =
    math.max(4, math.min(24,
      math.ceil(math.log(math.max(n, 2).toDouble) / math.log(2.0)).toInt - 3))

  /** AUTO probe radius (verdict #6): Hamming-1 multi-probe at small corpora
    * (cheap codes, LSH barely beats the exact baseline anyway), Hamming-2
    * once the corpus is large enough (n ≥ 8192) that the auto-sized code is
    * ≥ 10 bits wide — there the extra C(bits,2) probes cost O(log²n) per row
    * against occupancy-8 buckets and buy the recall a production graph
    * needs (KnnGraphRecallSpec re-pins ≥ 0.80 on the uniform-random worst
    * case at the fixture size). Manual override: [[KnnLshProbeConf]]. */
  private[graft] def knnLshProbeFor(n: Long): Int = if (n >= 8192) 2 else 1

  /** AUTO table count: recall lost to the wider auto-sized codes is bought
    * back with INDEPENDENT tables (each new table multiplies the per-edge
    * miss probability), not with occupancy. 12 tables at scale (round 15;
    * the round-14 verdict's #6 raised the graph floor 0.80 → 0.90 to match
    * the sim-search generator's pin): measured on the uniform-random worst
    * case, 8192 vectors / 10-bit codes give recall 0.964 at 0.49× pair
    * space and 16384 / 11-bit give 0.928 at 0.35× — both under the 0.6×
    * work bound, vs 0.893 / 0.827 at the former 8 tables. The fraction
    * FALLS as the corpus grows (tables · probes · occupancy / n), so the
    * fixture bound is the conservative end. */
  private[graft] def knnLshTablesFor(n: Long): Int = if (n >= 8192) 12 else 4
  val KnnLshTablesConf = "graft.knn.lsh.tables"

  /** The ONE LSH sizing policy — shared by [[lshCandidates]] (sim-search)
    * and [[knnGraphCandidates]] (graph), so the "width must track the
    * corpus" rule can't silently hold for one generator and not the other.
    * Returns (tables, bits, probeRadius); each manual conf overrides its
    * auto value.
    *
    * `querySide = true` doubles the auto table count: a query-side probe's
    * work is ∝ queries × probes × occupancy — independent of the corpus
    * pair space — so recall there is cheap to buy with tables (measured at
    * the 16384 fixture: 8 self-join tables cost 37% of the pair space,
    * while 16 query-side tables cost 0.07% of it). The self-join generator
    * cannot afford the same doubling without breaching its work bound. */
  private def lshParams(s: org.apache.spark.sql.SparkSession, corpusRows: Long,
                        querySide: Boolean = false): (Int, Int, Int) = {
    val confTables = s.conf.get(KnnLshTablesConf, "")
    val autoTables = knnLshTablesFor(corpusRows) * (if (querySide) 2 else 1)
    val nTables = if (confTables.nonEmpty) confTables.toInt else autoTables
    require(nTables >= 1 && nTables <= 32, s"$KnnLshTablesConf out of range: $nTables")
    val confBits = s.conf.get(KnnLshBitsConf, "")
    val nBits = if (confBits.nonEmpty) confBits.toInt else knnLshBitsFor(corpusRows)
    require(nBits >= 1 && nBits <= 24, s"$KnnLshBitsConf out of range: $nBits")
    val confProbe = s.conf.get(KnnLshProbeConf, "")
    val radius = if (confProbe.nonEmpty) confProbe.toInt else knnLshProbeFor(corpusRows)
    require(radius >= 0 && radius <= 2, s"$KnnLshProbeConf out of range: $radius")
    (nTables, nBits, radius)
  }

  /** Probe-mask literal array for a Hamming radius: the identity mask, every
    * 1-bit flip (radius ≥ 1), every 2-bit flip (radius ≥ 2). */
  private def probeMaskArray(nBits: Int, radius: Int): Column = {
    val hamming1 = if (radius >= 1) (0 until nBits).map(1 << _) else Seq.empty
    val hamming2 = if (radius >= 2)
      for { i <- 0 until nBits; j <- (i + 1) until nBits } yield (1 << i) | (1 << j)
    else Seq.empty
    array((0 +: (hamming1 ++ hamming2)).map(lit(_)): _*)
  }

  def knnGraphCandidates(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // one cheap count() pass feeds the sizing policy
    val (nTables, nBits, radius) = lshParams(s, Tables.embeddings(s, d).count())
    def buckets(vec: String): Column =
      graft.functions.GraftFunctions.hyperplaneBuckets(col(vec), nTables, nBits)
    val exact = withVec(Tables.embeddings(s, d), "dst", "vb", "nb")
      .select(col("dst"), col("vb"), col("nb"),
        posexplode(buckets("vb")).as(Seq("t", "bucket")))
    val probeMasks = probeMaskArray(nBits, radius)
    val probed = withVec(Tables.embeddings(s, d), "src", "va", "na")
      .withColumn("bs", buckets("va"))
      .select(col("src"), col("va"), col("na"),
        explode(flatten(transform(sequence(lit(0), lit(nTables - 1)), t =>
          transform(probeMasks, m => struct(t.as("qt"),
            element_at(col("bs"), t + 1).bitwiseXOR(m).as("qbucket")))))).as("pr"))
      .select(col("src"), col("va"), col("na"),
        col("pr.qt").as("qt"), col("pr.qbucket").as("qbucket"))
    probed.join(exact,
        col("qt") === col("t") && col("qbucket") === col("bucket") &&
          col("src") < col("dst"))
      .select(col("src"), col("dst"),
        cosine(col("va"), col("vb"), col("na"), col("nb")).as("sim"))
      .groupBy("src", "dst").agg(max(col("sim")).as("sim"))
  }

  def knnGraphStagePath(sfDir: String): String = Stage.root(sfDir) + "/knn_graph_cand"

  /** EXACT mutual k-NN graph over [[blockedAllPairs]] — the brute-force
    * baseline the ANN production path is recall-measured against
    * (KnnGraphRecallSpec); was the shipped formulation through round 12. */
  def exactKnnGraph(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val pairs = blockedAllPairs(s, d)
    mutualTop5(pairs.select(col("vec_id_a").as("src"), col("vec_id_b").as("dst"), col("sim")))
  }

  /** Directed-edge expansion → per-node top-5 → mutuality filter: the graph
    * stages shared by the exact baseline and the ANN path (identical
    * downstream semantics is what lets the recall spec compare them). */
  private[graft] def mutualTop5(undirected: DataFrame): DataFrame = {
    val directed = undirected.unionAll(
      undirected.select(col("dst").as("src"), col("src").as("dst"), col("sim")))
    val w = Window.partitionBy("src").orderBy(col("sim").desc, col("dst").asc)
    val knn = directed.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select("src", "dst")
    knn.as("x").join(knn.as("y"),
        col("x.src") === col("y.dst") && col("x.dst") === col("y.src"))
      .where(col("x.src") < col("x.dst"))
      .select(col("x.src").as("vec_a"), col("x.dst").as("vec_b"))
      .orderBy("vec_a", "vec_b")
  }

  /** MUTUAL k-NN GRAPH construction — the preprocessing artifact
    * density-based clustering, label propagation, and graph-dedup all start
    * from: each vector's 5 nearest neighbors by cosine, kept as an
    * UNDIRECTED edge only when the relation is mutual (a ∈ knn(b) AND
    * b ∈ knn(a) — the standard symmetrization that prunes hub artifacts).
    *
    * PRODUCTION ANN formulation (round 13; the round-12 verdict's #3): the
    * pair stage is the banded LSH candidate generator
    * [[knnGraphCandidates]] — an equi-join on (table, bucket), never the n²
    * pair space — and everything downstream ([[mutualTop5]]) is unchanged:
    * the per-node top-k is a WindowGroupLimit heap and the mutuality filter
    * is ONE self-equi-join on the |V|·k directed edge list. Oracle: the
    * staged-candidate pattern of the `sim_search_ann_*` family — the
    * APPROXIMATION is the candidate set, staged with its Spark-computed sim
    * (doubles round-trip parquet bit-exactly); DuckDB re-runs the whole
    * rank/mutuality pipeline from the staged pairs and independently
    * verifies each candidate's sim against its own cosine within 1e-5
    * (drifted rows are EXCLUDED, so a real cosine bug breaks the hash).
    * Recall vs [[exactKnnGraph]] is pinned by KnnGraphRecallSpec, which
    * also asserts the candidate work stays below the pair space. */
  val embedKnnGraph: Op = Op(
    "embed_knn_graph",
    (s, d) => {
      val cand = Housekeeping.cacheBounded("knn_graph_cand", knnGraphCandidates(s, d))
      // one file: a candidate artifact ∝ bucket occupancy, never corpus-sized
      cand.coalesce(1).write.mode("overwrite").parquet(knnGraphStagePath(d))
      mutualTop5(cand)
    },
    Some("WITH c AS (SELECT c0.src, c0.dst, c0.sim FROM " +
      s"read_parquet('${Stage.token}/knn_graph_cand/*.parquet') c0 " +
      "JOIN embeddings a ON a.vec_id = c0.src " +
      "JOIN embeddings b ON b.vec_id = c0.dst " +
      "WHERE abs(list_cosine_similarity(a.embedding, b.embedding) - c0.sim) <= 1e-5), " +
      "directed AS (SELECT src, dst, sim FROM c " +
      "UNION ALL SELECT dst AS src, src AS dst, sim FROM c), " +
      "k AS (SELECT src, dst FROM (SELECT src, dst, " +
      "row_number() OVER (PARTITION BY src ORDER BY sim DESC, dst) AS rn " +
      "FROM directed) WHERE rn <= 5) " +
      "SELECT x.src AS vec_a, x.dst AS vec_b FROM k x " +
      "JOIN k y ON y.src = x.dst AND y.dst = x.src " +
      "WHERE x.src < x.dst ORDER BY vec_a, vec_b"))

  /** FILTERED similarity search — the vector-database feature plain top-k
    * misses: each query's 5 nearest neighbors AMONG vectors sharing its
    * label (the metadata predicate), i.e. PRE-filter semantics. The naive
    * post-filter (global top-k, then filter) silently returns FEWER than k
    * rows whenever the metadata is selective — the classic recall bug this
    * key exists to state correctly: filter first, then rank.
    *
    * Scale notes (100 TB): the label predicate composes with any ANN
    * family as a bucket-side filter (IVF cells / LSH buckets store the
    * metadata column, the probe join adds the equality) — pre-filter costs
    * nothing extra at the index layout; post-filter cannot be fixed with
    * any k. Exact formulation here; ranking determinism is the proven
    * sim_search contract. */
  val simSearchFiltered: Op = Op(
    "sim_search_filtered",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      def side(idAs: String, vecAs: String, labAs: String, normAs: String) =
        Tables.embeddings(s, d)
          .select(col("vec_id").as(idAs),
            transform(col("embedding"), x => x.cast("double")).as(vecAs),
            col("label").as(labAs))
          .withColumn(normAs,
            sqrt(graft.functions.GraftFunctions.dot(col(vecAs), col(vecAs))))
      val q = side("query_id", "vq", "qlabel", "nq").where(col("query_id") < 10)
      val c = side("neighbor_id", "vc", "clabel", "nc")
      val w = Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("neighbor_id").asc)
      broadcast(q).join(c,
          col("neighbor_id") =!= col("query_id") && col("qlabel") === col("clabel"))
        .withColumn("sim", cosine(col("vq"), col("vc"), col("nq"), col("nc")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    },
    Some("SELECT query_id, rank, neighbor_id FROM (" +
      "SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, " +
      "CAST(row_number() OVER (PARTITION BY a.vec_id ORDER BY " +
      "list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS INT) AS rank " +
      "FROM embeddings a JOIN embeddings b " +
      "ON b.vec_id <> a.vec_id AND b.label = a.label WHERE a.vec_id < 10) " +
      "WHERE rank <= 5 ORDER BY query_id, rank"))

  // ----------------------------------------------------------- text analysis

  /** Per (lang, source): doc count, avg length, distinct token count. */
  val textLangStats: Op = Op(
    "text_lang_stats",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val base = docs.groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
      val toks = docs.select(col("lang"), col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "source").agg(countDistinct(col("tok")).as("n_tokens"))
      base.join(toks, Seq("lang", "source"))
        .orderBy("lang", "source")
    },
    Some("SELECT b.lang, b.source, n_docs, avg_chars, n_tokens FROM " +
      "(SELECT lang, source, COUNT(*) AS n_docs, CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_chars " +
      "FROM documents GROUP BY 1, 2) b JOIN " +
      "(SELECT lang, source, COUNT(DISTINCT tok) AS n_tokens FROM " +
      "(SELECT lang, source, unnest(string_split(text, ' ')) AS tok FROM documents) GROUP BY 1, 2) t " +
      "ON b.lang = t.lang AND b.source = t.source ORDER BY b.lang, b.source"))

  /** Pipeline-style quality gate: keep + per-rule reasons for drops. */
  val textQualityFilter: Op = Op(
    "text_quality_filter",
    (s, d) => {
      val nTok = size(split(col("text"), " "))
      val badLen = col("n_chars") < 64 || col("n_chars") > 4096
      val badTok = nTok < 10
      val badChars = !col("text").rlike("^[a-z ]+$")
      Tables.documents(s, d)
        .select(col("doc_id"),
          (!badLen && !badTok && !badChars).as("keep"),
          concat_ws(",",
            when(badLen, "len"), when(badTok, "tok"), when(badChars, "chars")).as("reasons"))
        .orderBy("doc_id")
    },
    Some("SELECT doc_id, NOT (bad_len OR bad_tok OR bad_chars) AS keep, " +
      "concat_ws(',', CASE WHEN bad_len THEN 'len' END, CASE WHEN bad_tok THEN 'tok' END, " +
      "CASE WHEN bad_chars THEN 'chars' END) AS reasons FROM " +
      "(SELECT doc_id, (n_chars < 64 OR n_chars > 4096) AS bad_len, " +
      "len(string_split(text, ' ')) < 10 AS bad_tok, " +
      "NOT regexp_matches(text, '^[a-z ]+$') AS bad_chars FROM documents) ORDER BY doc_id"))

  // ------------------------------------------------------------- multimodal

  /** Multimodal column: document meta + embedding zipped into one struct
    * column (the representation), then flattened stats for the hash compare
    * (nested structs don't hash portably across engines). */
  val multimodalJoin: Op = Op(
    "multimodal_join",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      docs.join(emb, docs("doc_id") === emb("vec_id"))
        .withColumn("doc", struct(col("doc_id"), col("lang"), col("n_chars"),
          col("label"), col("embedding")))
        .select(col("doc.doc_id").as("doc_id"), col("doc.lang").as("lang"),
          col("doc.n_chars").as("n_chars"), col("doc.label").as("label"),
          size(col("doc.embedding")).as("dim"))
        .orderBy("doc_id")
    },
    Some("SELECT doc_id, lang, n_chars, label, CAST(len(embedding) AS INT) AS dim " +
      "FROM documents JOIN embeddings ON doc_id = vec_id ORDER BY doc_id"))

  /** Exact duplicate-SPAN detection — the substring-level complement of the
    * doc-level dedup family (the pass LLM corpus curation runs after
    * doc-level near-dup, per the "deduplicating training data" line of
    * work): every sliding [[SpanW]]-word window of every document is
    * hashed, and any span occurring in ≥ 2 DISTINCT documents is reported
    * with its document frequency, total occurrence count, and the lowest
    * doc_id that carries it (the canonical keeper — the copy other docs
    * would be trimmed against).
    *
    * Scale (100 TB): the map side emits one hashed span per token position
    * (rows ∝ total corpus tokens, a constant factor of the scan itself) and
    * partial aggregation collapses within-partition repeats BEFORE the
    * shuffle, so shuffle bytes ∝ distinct spans, not occurrences. No pair
    * space exists anywhere — this is the linear shape substring dedup runs
    * at corpus scale, and the md5 span key is uniform so no salting is
    * needed. Deterministic: string hashing only, no floats. */
  private val SpanW = 12

  val dedupSubstringSpans: Op = Op(
    "dedup_substring_spans",
    (s, d) => {
      // Explode the POSITION sequence and hash AFTER the Generate (round 18,
      // § codegen): exploding a pre-built md5 ARRAY made Catalyst's
      // InferFiltersFromGenerate inject a `size(...)>0 && isnotnull(...)`
      // guard whose re-derived child recomputes the whole O(words) md5 array
      // once per document EXTRA. With the generator child a plain int
      // sequence, the injected guard is O(words) ints and each span hash is
      // computed exactly once, in the codegen projection above the Generate.
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .where(size(col("w")) >= SpanW)
        .select(col("doc_id"), col("w"),
          explode(sequence(lit(1), size(col("w")) - (SpanW - 1))).as("i"))
        .select(col("doc_id"),
          md5(array_join(slice(col("w"), col("i"), lit(SpanW)), " ")).as("span_hash"))
        .groupBy("span_hash")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"),
          min(col("doc_id")).as("keep_doc"))
        .where(col("n_docs") >= 2)
        .orderBy("span_hash")
    },
    Some("WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
      s"sp AS (SELECT doc_id, md5(array_to_string(w[i:i+${SpanW - 1}], ' ')) AS span_hash " +
      s"FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - ${SpanW - 1})) AS i) g " +
      s"WHERE len(w) >= $SpanW) " +
      "SELECT span_hash, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ, " +
      "MIN(doc_id) AS keep_doc FROM sp GROUP BY 1 " +
      "HAVING COUNT(DISTINCT doc_id) >= 2 ORDER BY span_hash"))

  /** The TRIM pass over [[dedupSubstringSpans]]'s detections — the output a
    * substring-dedup pipeline actually ships: for every document, how many
    * word positions are covered by some ≥ 2-doc duplicated span whose
    * canonical keeper is ANOTHER document (the keeper doc keeps its copy;
    * everyone else trims theirs), and the resulting kept-word count.
    * Overlapping duplicated spans are handled by a fixed-width interval
    * sweep per document (round 18; the declared semantics — distinct covered
    * positions — is unchanged, and the oracle still counts de-duplicated
    * position marks): spans are intervals [i, i+SpanW-1], i unique per doc,
    * so each span's NEW coverage is min(SpanW, i − previous i) and the total
    * is the interval-union cardinality. All-integer, total order on i —
    * deterministic under any partitioning.
    *
    * Scale (100 TB): span emission is the same linear scan as the detector;
    * the dup-span set (multi-doc hashes) is the only thing joined back, and
    * that join is an equi-join on span_hash — shuffle ∝ duplicated content,
    * not corpus size; the sweep shuffles matched spans ONCE on doc_id (the
    * rollup reuses the window's partitioning). All integers. */
  /** Per-span NEW-coverage in the i-ordered fixed-width interval sweep:
    * min(SpanW, i − previous i), SpanW for a doc's first span. Exposed as a
    * helper so the spec can pin sweep ≡ position-mark counting on planted
    * overlap fixtures. */
  private[graft] def marksAsIntervals(matched: DataFrame,
      w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
    matched.withColumn("cov",
      coalesce(least(lit(SpanW), col("i") - lag(col("i"), 1).over(w)), lit(SpanW)))

  val dedupSubstringTrim: Op = Op(
    "dedup_substring_trim",
    (s, d) => {
      // Same position-sequence Generate as dedup_substring_spans (round 18):
      // hashing AFTER the explode keeps the md5 array from being re-derived
      // by InferFiltersFromGenerate's injected guard. `i` is the 1-based
      // span start, so the covered word positions are i .. i+SpanW-1.
      val spans = Housekeeping.cacheBounded("trim_spans",
        Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .where(size(col("w")) >= SpanW)
          .select(col("doc_id"), size(col("w")).as("n_words"), col("w"),
            explode(sequence(lit(1), size(col("w")) - (SpanW - 1))).as("i"))
          .select(col("doc_id"), col("n_words"), col("i"),
            md5(array_join(slice(col("w"), col("i"), lit(SpanW)), " ")).as("span_hash")))
      val dupOwners = spans.groupBy("span_hash")
        .agg(countDistinct(col("doc_id")).as("n_docs"), min(col("doc_id")).as("keep_doc"))
        .where(col("n_docs") >= 2)
        .select("span_hash", "keep_doc")
      // Interval sweep instead of position marks (round 18, guide §2.3/§2.4):
      // every matched span covers the fixed-width interval [i, i+SpanW-1] and
      // `i` is UNIQUE per doc (one span per start position), so the distinct
      // covered-position count is the interval-union cardinality:
      //   Σ_k min(SpanW, i_k − i_{k−1})   (first span contributes SpanW).
      // One window ordered by i + one groupBy on the SAME key (doc_id) — the
      // groupBy reuses the window's hash partitioning, so ONE exchange of
      // |matched spans| rows replaces the old explode(×SpanW) → distinct →
      // groupBy chain (two exchanges, one carrying SpanW× the rows).
      // All-integer arithmetic; `i` unique per doc makes the order total, so
      // the sweep is deterministic on any partitioning.
      val wSweep = Window.partitionBy("doc_id").orderBy("i")
      marksAsIntervals(spans.join(dupOwners, "span_hash")
        .where(col("doc_id") =!= col("keep_doc"))
        .select(col("doc_id"), col("n_words"), col("i")), wSweep)
        .groupBy("doc_id", "n_words")
        .agg(sum(col("cov")).as("n_dup_words"))
        .select(col("doc_id"), col("n_words").cast("long").as("n_words"),
          col("n_dup_words"), (col("n_words") - col("n_dup_words")).as("n_kept_words"))
        .orderBy("doc_id")
    },
    Some("WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
      s"sp AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, g.i, " +
      s"md5(array_to_string(w[g.i:g.i+${SpanW - 1}], ' ')) AS span_hash " +
      s"FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - ${SpanW - 1})) AS i) g " +
      s"WHERE len(w) >= $SpanW), " +
      "du AS (SELECT span_hash, MIN(doc_id) AS keep_doc FROM sp GROUP BY 1 " +
      "HAVING COUNT(DISTINCT doc_id) >= 2), " +
      "mk AS (SELECT DISTINCT sp.doc_id, sp.n_words, sp.i + g2.o - 1 AS pos " +
      "FROM sp JOIN du USING (span_hash), " +
      s"LATERAL (SELECT unnest(generate_series(1, $SpanW)) AS o) g2 " +
      "WHERE sp.doc_id <> du.keep_doc) " +
      "SELECT doc_id, n_words, COUNT(*) AS n_dup_words, " +
      "n_words - COUNT(*) AS n_kept_words FROM mk GROUP BY 1, 2 ORDER BY doc_id"))

  /** ASYMMETRIC containment dedup — the doc-inside-doc detector Jaccard
    * misses: a short document fully quoted inside a long one has tiny
    * Jaccard (union is dominated by the long doc) but containment
    * C(A→B) = |sh(A) ∩ sh(B)| / |sh(A)| ≈ 1. The standard companion pass to
    * near-dup in corpus curation (drop subset/quotation copies, keep the
    * superset doc).
    *
    * Semantics (declared, oracle identical): 3-gram shingles, the same
    * df ≤ [[NgramMaxDf]] cutoff as the Jaccard family (containment measured
    * over the COOL shingle vocabulary on BOTH numerator and denominator —
    * the cutoff is part of the metric, not a lossy shortcut), ordered pairs
    * both directions, flag at containment ≥ 80 %. All integer arithmetic
    * (`(100·inter) div nA`) — no float reaches the hash.
    *
    * Scale: identical cost shape to [[ngramPairs]] — shingle-inverted-index
    * equi-join bounded by the df cutoff (≤ df² pair rows per shingle), one
    * groupBy; never all-pairs. At 100 TB the cutoff is the skew guard and
    * the join keys are the hashed shingles. */
  /** The containment core over a (doc_id, text) frame — exposed so the spec
    * can drive it with a planted subset-document fixture. */
  def containmentPairs(docs: DataFrame, minPct: Long = 80L): DataFrame = {
    val base = Housekeeping.cacheBounded("cont_shingles",
      shingled(docs.select("doc_id", "text"))
        .select(col("doc_id"), col("shingles")))
    val exploded = base.select(col("doc_id"), explode(col("shingles")).as("s"))
    // HOT-set anti-join instead of cool-set inner join — see [[ngramPairs]]
    // (identical rows kept; the join's small side shrinks to the Zipf head).
    // Row-identity relies on `s` never being null (left_anti keeps
    // null-keyed rows) — guaranteed by shingle construction, see ngramPairs.
    val sh = Housekeeping.cacheBounded("cont_cool",
      exploded.join(
        exploded.groupBy("s").agg(count(lit(1)).as("df"))
          .where(col("df") > NgramMaxDf).select("s"), Seq("s"), "left_anti"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("na"))
    // |sh(A) ∩ sh(B)| is SYMMETRIC: enumerate each unordered pair once
    // (doc_a < doc_b — half the join output and aggregate input) and mirror
    // the counted row afterward — a shuffle-free union — instead of letting
    // the self-join emit both orientations (guide §2.3).
    // the mirror union references interLo twice, but the expensive subtree
    // (self-join + partial agg) sits BELOW interLo's final exchange, which
    // AQE stage reuse deduplicates across the two branches — an explicit
    // materialization barrier here measured SLOWER (extra eager job)
    val interLo = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    interLo.unionByName(interLo.select(col("doc_b").as("doc_a"),
        col("doc_a").as("doc_b"), col("inter")))
      .join(sizes.select(col("doc_id").as("doc_a"), col("na")), "doc_a")
      .withColumn("containment_pct", expr("(100 * inter) div na"))
      .where(col("containment_pct") >= minPct)
      .select(col("doc_a"), col("doc_b"), col("na"), col("inter"),
        col("containment_pct"))
      .orderBy("doc_a", "doc_b")
  }

  val dedupContainment: Op = Op(
    "dedup_containment",
    (s, d) => containmentPairs(Tables.documents(s, d)),
    Some("WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
      "g0 AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(w) - 2), " +
      "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s FROM t WHERE len(w) >= 3), " +
      s"g AS (SELECT doc_id, s FROM g0 WHERE s IN (SELECT s FROM g0 GROUP BY 1 HAVING COUNT(*) <= $NgramMaxDf)), " +
      "sz AS (SELECT doc_id, COUNT(*) AS na FROM g GROUP BY 1), " +
      "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter FROM g a " +
      "JOIN g b ON a.s = b.s AND a.doc_id <> b.doc_id GROUP BY 1, 2) " +
      "SELECT doc_a, doc_b, sz.na, inter, (100 * inter) // sz.na AS containment_pct " +
      "FROM p JOIN sz ON sz.doc_id = doc_a " +
      "WHERE (100 * inter) // sz.na >= 80 ORDER BY doc_a, doc_b"))

  /** Character-level near-dup detection by EDIT DISTANCE — the family
    * member token-level MinHash/SimHash miss: small in-word typos and
    * OCR-class character noise barely move a character-shingle set's
    * Jaccard but stay within a few edits. Candidates are BLOCKED on
    * (16-char prefix, length-bucket) — an equi-join, never all-pairs —
    * and scored by levenshtein over the 64-char prefix fingerprint
    * (exact dynamic programming, identical integer result on both
    * engines; bounding the operand length is what bounds the O(m·n) DP
    * cost per pair). The blocked pair space is priced at plan time under
    * the same `graft.pair.budget` contract as the simhash banding — a
    * pathologically homogeneous corpus gets a loud refusal, not a quiet
    * quadratic job. Blocking recall contract (documented, not hidden): a
    * near-dup pair is surfaced iff it agrees on the first 16 chars and
    * length bucket — the right shape for the typo/OCR class this op
    * targets (edits concentrated past the head), NOT for prefix-edited
    * docs, which the shingle families catch instead.
    *
    * Scale notes (100 TB): block key is scan-local; the join is hash-equi
    * on the block; DP runs on 64-char operands only; output ∝ near-dup
    * pairs. */
  val dedupEditPrefix: Op = Op(
    "dedup_edit_prefix",
    (s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 64).as("p64"),
          substring(col("text"), 1, 16).as("blk"), expr("n_chars div 256").as("lb"))
      val pairSpace = base.groupBy("blk", "lb").agg(count(lit(1)).as("bsz"))
        .agg(coalesce(sum(expr("bsz * (bsz - 1) DIV 2")), lit(0L)).as("p"))
        .first().getLong(0)
      val budget = s.conf.get(PairBudgetConf, PairBudgetDefault.toString).toLong
      require(pairSpace <= budget,
        s"edit-distance blocking refused: block pair space $pairSpace exceeds " +
          s"$PairBudgetConf=$budget (homogeneous prefixes — hot blocks dominate). " +
          "Lengthen the block key or set the budget explicitly to accept the cost.")
      base.as("a").join(base.as("b"),
          col("a.blk") === col("b.blk") && col("a.lb") === col("b.lb") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
          levenshtein(col("a.p64"), col("b.p64")).as("dist"))
        .where(col("dist") <= 8)
        .orderBy("id1", "id2")
    },
    Some("WITH d AS (SELECT doc_id, substr(text, 1, 64) AS p64, " +
      "substr(text, 1, 16) AS blk, n_chars // 256 AS lb FROM documents) " +
      "SELECT a.doc_id AS id1, b.doc_id AS id2, " +
      "CAST(levenshtein(a.p64, b.p64) AS INT) AS dist " +
      "FROM d a JOIN d b ON a.blk = b.blk AND a.lb = b.lb AND a.doc_id < b.doc_id " +
      "WHERE levenshtein(a.p64, b.p64) <= 8 ORDER BY id1, id2"))

  /** CLUSTER-safe dataset splitting — the leakage rule content-hash
    * splitting ([[PipelineOps.splitTrainValTest]]) cannot give: near-dup
    * documents (J ≥ 0.5 ngram clusters, the same pair stage the dedup
    * family shares) must land in the SAME split, or eval rows are
    * near-copies of training rows and scores inflate. The split decision
    * is the standard hex-threshold rule applied to the cluster
    * REPRESENTATIVE's content hash (min-doc_id member), so every member
    * inherits one verdict; singletons degrade to exactly the plain
    * content-hash split. Emits (doc, representative, split) — the
    * assignment table a sharded tokenizer job consumes.
    *
    * Scale notes (100 TB): pair stage and CC are the shared near-dup
    * machinery (memo-read when the jaccard producer already ran); the
    * representative-hash join is an equi-join on rep_id; everything else
    * is scan-local. */
  val splitClusterSafe: Op = Op(
    "split_cluster_safe",
    (s, d) => {
      val pairs = Housekeeping.memoGet("ngram_pairs", ngramMemoKey(d))
        .map(p => s.read.parquet(p.resolve("pairs").toString))
        .getOrElse(ngramPairs(Tables.documents(s, d)))
      val clusters = ccKeep(pairs)
      val docs = Tables.documents(s, d)
      val withRep = docs.select(col("doc_id"))
        .join(clusters.withColumnRenamed("keep_id", "rep_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("rep_id"), col("doc_id")).as("rep_id"))
      val repHash = docs.select(col("doc_id").as("rep_id"),
        substring(md5(col("text")), 9, 4).as("b"))
      withRep.join(repHash, "rep_id")
        .select(col("doc_id"), col("rep_id"),
          when(col("b") < "cccc", "train").when(col("b") < "e666", "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    },
    Some(s"WITH RECURSIVE $ngramPairCtes, " +
      "e AS (SELECT doc_a AS src, doc_b AS dst FROM j UNION ALL SELECT doc_b, doc_a FROM j), " +
      "cc(node, label) AS (SELECT DISTINCT src, src FROM e " +
      "UNION SELECT e.dst, cc.label FROM cc JOIN e ON e.src = cc.node), " +
      "reps AS (SELECT node AS doc_id, MIN(label) AS rep_id FROM cc GROUP BY 1), " +
      "m AS (SELECT d.doc_id, COALESCE(r.rep_id, d.doc_id) AS rep_id " +
      "FROM documents d LEFT JOIN reps r USING (doc_id)), " +
      "h AS (SELECT doc_id AS rep_id, substr(md5(text), 9, 4) AS b FROM documents) " +
      "SELECT m.doc_id, m.rep_id, " +
      "CASE WHEN b < 'cccc' THEN 'train' WHEN b < 'e666' THEN 'val' " +
      "ELSE 'test' END AS split " +
      "FROM m JOIN h USING (rep_id) ORDER BY m.doc_id"))

  /** Quality-ranked cluster survivorship — [[dedupClusterKeep]]'s keeper
    * rule upgraded to what curation pipelines actually use: within each
    * near-dup component keep the BEST document (longest by n_chars, doc_id
    * as the total tie-break), not the smallest id. Min-id keep silently
    * prefers whichever copy was ingested first — often the truncated or
    * boilerplate-wrapped one; quality-ranked keep preserves the fullest
    * copy. Same CC kernel (min-label propagation over the shared
    * materialized pair table), then ONE argmax-by-struct aggregate per
    * component — `max(struct(quality, -doc_id))` is associative, so the
    * keeper decision merges map-side like any aggregate.
    *
    * Scale notes (100 TB): identical cost to dedup_cluster_keep plus one
    * component-keyed aggregate (state = one row per component) and one
    * members⋈keepers equi-join on the component key. The quality column
    * rides the label table, never the pair space. */
  val dedupClusterKeepBest: Op = Op(
    "dedup_cluster_keep_best",
    (s, d) => {
      val labels = ccKeep(
        Housekeeping.memoGet("ngram_pairs", ngramMemoKey(d))
          .map(p => s.read.parquet(p.resolve("pairs").toString))
          .getOrElse(ngramPairs(Tables.documents(s, d))))
        .select(col("doc_id"), col("keep_id").as("cluster_id"))
      val members = labels.join(
        Tables.documents(s, d).select("doc_id", "n_chars"), "doc_id")
      val keepers = members.groupBy("cluster_id")
        .agg(max(struct(col("n_chars").as("q"), (-col("doc_id")).as("negid"))).as("m"))
        .select(col("cluster_id"), (-col("m.negid")).as("keep_id"))
      members.join(keepers, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("keep_id"),
          (col("doc_id") === col("keep_id")).as("is_keeper"))
        .orderBy("doc_id")
    },
    Some(s"WITH RECURSIVE $ngramPairCtes, " +
      "e AS (SELECT doc_a AS src, doc_b AS dst FROM j UNION ALL SELECT doc_b, doc_a FROM j), " +
      "cc(node, label) AS (SELECT DISTINCT src, src FROM e " +
      "UNION SELECT e.dst, cc.label FROM cc JOIN e ON e.src = cc.node), " +
      "lab AS (SELECT node AS doc_id, MIN(label) AS cluster_id FROM cc GROUP BY 1), " +
      "mem AS (SELECT lab.doc_id, lab.cluster_id, d.n_chars FROM lab " +
      "JOIN documents d ON d.doc_id = lab.doc_id), " +
      "keepers AS (SELECT cluster_id, doc_id AS keep_id FROM (" +
      "SELECT cluster_id, doc_id, row_number() OVER (PARTITION BY cluster_id " +
      "ORDER BY n_chars DESC, doc_id ASC) AS rn FROM mem) WHERE rn = 1) " +
      "SELECT mem.doc_id, mem.cluster_id, keepers.keep_id, " +
      "mem.doc_id = keepers.keep_id AS is_keeper " +
      "FROM mem JOIN keepers USING (cluster_id) ORDER BY mem.doc_id"))

  val all: Seq[Op] = Seq(dedupExact, dedupBagOfWords, dedupIncrementalExact, dedupNearMinhash,
    dedupIncrementalMinhash, dedupSimhash,
    dedupNgramJaccard, dedupClusterKeep, dedupClusterKeepBest, dedupDecontaminate,
    dedupEmbeddingCosine,
    dedupContainment, dedupSubstringSpans, dedupSubstringTrim, dedupEditPrefix, splitClusterSafe,
    simSearchTopk, simSearchKnnPerQuery, simSearchAnnLsh, simSearchAnnIvf, simSearchAnnProbe,
    simSearchAnnIvfAppend, streamAnnIvfAppend, simSearchAnnIvfRetrain, simSearchIvfDriftReport,
    simSearchAnnIvfAutorefresh, streamAnnIvfAutorefresh,
    simSearchAnnPq, simSearchHybridRrf, embedKnnGraph, simSearchFiltered, simSearchMmrRerank,
    textLangStats, textQualityFilter, multimodalJoin)
}
