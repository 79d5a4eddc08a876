package graft

import graft.ops.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing is real even though the decode is a stub: schema,
  * batch shape, determinism, and frame-sampling alignment. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decode_features: schema, one row per doc, deterministic") {
    val df = MultimodalOps.multimodalDecodeFeatures.fn(spark, TestSpark.sf0001)
    assert(df.columns.sameElements(
      Array("doc_id", "n_bytes", "width", "height", "channels", "mean_lum")))
    val rows = df.collect()
    val nDocs = graft.tables.Tables.documents(spark, TestSpark.sf0001).count()
    assert(rows.length == nDocs)
    // stub invariants: n_bytes = text length (ASCII), channels fixed,
    // features within declared ranges
    assert(rows.forall(r => r.getInt(4) == 3))
    assert(rows.forall(r => r.getInt(2) >= 64 && r.getInt(2) < 576))
    assert(rows.forall(r => r.getDouble(5) > 0))
    val again = MultimodalOps.multimodalDecodeFeatures.fn(spark, TestSpark.sf0001)
      .collect().map(_.toString)
    assert(again.sameElements(rows.map(_.toString)))
  }

  test("parse_png: a real PNG header parses byte-for-byte (golden fixture)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // The literal first 26 bytes of a real 256x192 8-bit RGB PNG: signature,
    // IHDR length 13, "IHDR", width 0x00000100, height 0x000000C0,
    // bit depth 8, color type 2 (truecolor).
    val golden: Array[Byte] = Array(
      0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n',
      0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',
      0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x00, 0xc0,
      0x08, 0x02).map(_.toByte)
    val out = Seq(Tuple1(golden)).toDF("payload")
      .select(MultimodalOps.parsePng(col("payload")).as("r"))
      .select("r.sig_ok", "r.width", "r.height", "r.bit_depth", "r.color_type")
      .collect().head
    assert(out.getBoolean(0), "valid signature must verify")
    assert((out.getInt(1), out.getInt(2), out.getInt(3), out.getInt(4)) == ((256, 192, 8, 2)))
    // and a corrupted signature must NOT verify
    val bad = golden.clone(); bad(0) = 0x88.toByte
    val badOut = Seq(Tuple1(bad)).toDF("payload")
      .select(MultimodalOps.parsePng(col("payload")).as("r"))
      .select("r.sig_ok").collect().head
    assert(!badOut.getBoolean(0), "corrupted signature must fail verification")
  }

  test("frame_sample: frames reassemble to the original payload") {
    import spark.implicits._
    val frames = MultimodalOps.multimodalFrameSample.fn(spark, TestSpark.sf0001)
    val rebuilt = frames.orderBy("doc_id", "frame_idx")
      .as[(Long, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).mkString).toMap
    val original = graft.tables.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(rebuilt == original)
    // every frame but the last is exactly 16 bytes
    val bad = frames.as[(Long, Int, String)].collect()
      .groupBy(_._1).values.flatMap(fs => fs.sortBy(_._2).dropRight(1))
      .filter(_._3.length != 16)
    assert(bad.isEmpty)
  }
}
