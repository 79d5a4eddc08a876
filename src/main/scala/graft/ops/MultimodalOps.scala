package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.functions._

/** SURVEY.md §2 category K (multimodal columns) — image/audio/video handling
  * for a training-data pipeline: media as opaque `binary` columns with typed
  * metadata, decode / feature-extract / frame-sample as partition-batched
  * typed transforms.
  *
  * The decode step is STUBBED (no image/audio codecs in this container): a
  * deterministic fake derives "features" from the payload bytes. Everything
  * around the stub — the binary column model, the mapPartitions batch shape,
  * the output schema, the partitioning — is real and tested
  * (MultimodalSpec). Swapping the stub for a real codec changes one function.
  *
  * Scale notes (100 TB): media rows are large — the mapPartitions transform
  * streams one partition at a time (never collects), metadata-only queries
  * prune the payload column at the parquet scan, and frame sampling is a
  * flatMap (rows out ∝ frames, no shuffle until the consumer aggregates).
  */
object MultimodalOps {

  /** (doc_id, payload) — the testdata has no real media, so the document
    * text bytes stand in as the opaque payload. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** STUB — deterministic fake decode. A real build links an image codec
    * here; the fake derives stable pseudo-features from the bytes so tests
    * and the rows-only driver check are reproducible. */
  def stubDecode(payload: Array[Byte]): (Int, Int, Int, Double) = {
    var h = 1125899906842597L
    var i = 0
    var sum = 0L
    while (i < payload.length) { h = 31 * h + payload(i); sum += payload(i) & 0xff; i += 1 }
    val width = 64 + (math.abs(h) % 512).toInt        // fake decoded width
    val height = 64 + (math.abs(h >> 16) % 512).toInt // fake decoded height
    val channels = 3
    val meanLum = if (payload.isEmpty) 0.0 else sum.toDouble / payload.length
    (width, height, channels, meanLum)
  }

  /** Decode + feature-extract over the binary column, partition-batched
    * (the Scala analog of a pandas-batched UDF: one iterator per partition,
    * streaming, no driver collect). Rows-only driver check + MultimodalSpec. */
  val multimodalDecodeFeatures: Op = Op(
    "multimodal_decode_features",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[MediaRow]
        .mapPartitions { batch => // one batch per partition — streaming shape
          batch.map { m =>
            val (w, h, c, lum) = stubDecode(m.payload)
            (m.doc_id, m.payload.length, w, h, c, lum)
          }
        }
        .toDF("doc_id", "n_bytes", "width", "height", "channels", "mean_lum")
        .orderBy("doc_id")
    },
    None)

  /** Frame sampling: the payload split into fixed 16-byte "frames" with
    * their index — the flatMap/UDTF shape of video frame extraction. The
    * payload is ASCII here, so the oracle can express the same chunking with
    * substring arithmetic (frame content verified byte-for-byte). */
  val multimodalFrameSample: Op = Op(
    "multimodal_frame_sample",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          text.grouped(16).zipWithIndex.map { case (frame, i) => (id, i, frame) }
        }
        .toDF("doc_id", "frame_idx", "frame")
        .orderBy("doc_id", "frame_idx")
    },
    Some("SELECT doc_id, CAST(g AS INT) AS frame_idx, substring(text, CAST(g * 16 + 1 AS INT), 16) AS frame " +
      "FROM (SELECT doc_id, text, unnest(generate_series(0, (length(text) - 1) // 16)) AS g FROM documents) " +
      "ORDER BY doc_id, frame_idx"))

  /** Relational PNG IHDR parse over a `binary` column — REAL format logic,
    * not a stub: byte-slice the signature and the IHDR fields with
    * `substring` on binary and decode big-endian u32s via `hex`+`conv`, all
    * codegen'd builtins (no UDF). This is the metadata-routing step a media
    * pipeline runs BEFORE any decode at 100 TB: validate + extract
    * (width, height, depth, color type) from the first 26 bytes without
    * touching the payload body — with stored media the same projection
    * prunes to a 26-byte read per row. Exposed for MultimodalSpec, which
    * parses a golden real PNG header byte-for-byte. */
  def parsePng(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def beInt(pos: Int, len: Int) =
      conv(hex(substring(payload, pos, len)), 16, 10).cast("int")
    struct(
      (hex(substring(payload, 1, 8)) === "89504E470D0A1A0A").as("sig_ok"),
      beInt(17, 4).as("width"),
      beInt(21, 4).as("height"),
      beInt(25, 1).as("bit_depth"),
      beInt(26, 1).as("color_type"))
  }

  /** Build-then-parse round trip as a query: each doc synthesizes a VALID
    * PNG signature + IHDR (width/height derived from doc_id — the testdata
    * carries no real media) via `unhex`/`concat` binary construction, and the
    * parser recovers the fields relationally. The oracle is the independent
    * ground truth of what the parse must produce (64 + doc_id mod 512 etc.) —
    * a Spark-side parse bug cannot hash-match it; the golden-bytes assertion
    * on a real PNG header lives in MultimodalSpec. */
  val multimodalParsePng: Op = Op(
    "multimodal_parse_png",
    (s, d) => {
      val w = (lit(64) + col("doc_id") % 512).cast("int")
      val h = (lit(64) + (col("doc_id") * 7) % 480).cast("int")
      val payload = concat(
        unhex(lit("89504E470D0A1A0A")), // PNG signature
        unhex(lit("0000000D")),         // IHDR chunk length = 13
        unhex(lit("49484452")),         // "IHDR"
        unhex(lpad(hex(w), 8, "0")),    // width, big-endian u32
        unhex(lpad(hex(h), 8, "0")),    // height, big-endian u32
        unhex(lit("0806000000")))       // bit depth 8, color type 6 (RGBA), rest
      Tables.documents(s, d)
        .select(col("doc_id"), parsePng(payload).as("r"))
        .select(col("doc_id"), col("r.sig_ok").as("sig_ok"),
          col("r.width").as("width"), col("r.height").as("height"),
          col("r.bit_depth").as("bit_depth"), col("r.color_type").as("color_type"))
        .orderBy("doc_id")
    },
    Some("SELECT doc_id, TRUE AS sig_ok, CAST(64 + doc_id % 512 AS INT) AS width, " +
      "CAST(64 + (doc_id * 7) % 480 AS INT) AS height, CAST(8 AS INT) AS bit_depth, " +
      "CAST(6 AS INT) AS color_type FROM documents ORDER BY doc_id"))

  val all: Seq[Op] = Seq(multimodalDecodeFeatures, multimodalFrameSample, multimodalParsePng)
}
