package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

final case class Ev(event_id: Long, ts: Timestamp, user_id: Long, value: Double)

/** Late-data semantics under a 10-minute watermark (FIXTURES.md §2):
  * out-of-order rows within the watermark are aggregated; rows older than
  * the watermark are dropped and accounted in
  * stateOperators.numRowsDroppedByWatermark. */
class StreamLateDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(s: String) = Timestamp.valueOf(s)

  test("watermark drops too-late rows and accounts for them") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("cnt"))
    val qn = s"late_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(qn)
      .outputMode("update").start()
    try {
      // batch 1: establishes watermark = 10:25 - 10min = 10:15
      input.addData(
        Ev(1, t("2024-01-01 10:00:00"), 1, 1.0),
        Ev(2, t("2024-01-01 10:25:00"), 1, 1.0))
      q.processAllAvailable()
      // batch 2: one row late-but-allowed is impossible for window [10:00,10:10)
      // (ends 10:10 < watermark 10:15) → dropped; one row in a live window kept
      input.addData(
        Ev(3, t("2024-01-01 10:01:00"), 1, 1.0), // too late → dropped
        Ev(4, t("2024-01-01 10:21:00"), 1, 1.0)) // within watermark → kept
      q.processAllAvailable()
      val dropped = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped == 1, s"expected exactly 1 dropped row, got $dropped")
      val out = spark.table(qn).groupBy("ws").agg(max("cnt").as("cnt"))
        .orderBy("ws").collect().map(r => (r.getTimestamp(0).toString, r.getLong(1)))
      // [10:00,10:10) saw only event 1; the late event 3 never landed
      assert(out.contains(("2024-01-01 10:00:00.0", 1L)))
      // [10:20,10:30) saw events 2 and 4
      assert(out.contains(("2024-01-01 10:20:00.0", 2L)))
    } finally q.stop()
  }

  test("streaming AvailableNow equals batch on a closed input (union of permutations)") {
    // stream_tumbling_watermark vs batch ts_tumbling_hourly on the same data:
    // the streaming drain must produce exactly the batch aggregation.
    val streamRes = graft.ops.StreamingOps.streamTumblingWatermark
      .fn(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
    val batchRes = graft.tables.Tables.events(spark, TestSpark.sf0001)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(graft.ops.Dets.D12_2)).cast("double").as("sum_value"))
      .select(col("window.start").as("h"), col("cnt"), col("sum_value"))
      .orderBy("h").collect().map(_.toString).toSeq
    assert(streamRes == batchRes)
  }
}
