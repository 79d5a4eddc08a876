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
