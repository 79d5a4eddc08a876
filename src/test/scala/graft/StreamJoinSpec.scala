package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** stream_join_follows' scale claim is that BOTH-side watermarks bound the
  * join state: buffered rows older than (watermark − join window) are
  * evicted, so state holds a sliding horizon of stream history, not the
  * stream itself. The op's oracle proves result correctness on closed input;
  * this spec proves the EVICTION — a scripted MemoryStream run whose later
  * batches advance the watermark past the first batch's rows, asserting the
  * state store actually removed rows (numRowsRemoved > 0) and did not retain
  * every input row. */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream-stream join evicts buffered rows behind the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val right = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val l = left.toDF().toDF("purchase_id", "u1", "t1").withWatermark("t1", "10 minutes")
    val r = right.toDF().toDF("follow_id", "u2", "t2").withWatermark("t2", "10 minutes")
    val joined = l.join(r,
      col("u1") === col("u2") &&
        col("t2") > col("t1") && col("t2") <= col("t1") + expr("INTERVAL 10 MINUTES"))
    val ckpt = java.nio.file.Files.createTempDirectory("st_join_spec_ckpt")
    graft.ops.Housekeeping.withShufflePartitions(spark, 8) {
      val q = joined.writeStream.format("memory").queryName("st_join_spec")
        .outputMode("append").option("checkpointLocation", ckpt.toString).start()
      try {
        left.addData((1L, 1L, t("2024-01-01 10:00:00")))
        right.addData((2L, 1L, t("2024-01-01 10:05:00")))
        q.processAllAvailable()
        assert(spark.table("st_join_spec").count() == 1, "in-window pair must join")

        // advance both watermarks two hours past batch 1, then run one more
        // batch so the start-of-batch watermark triggers the eviction
        left.addData((3L, 2L, t("2024-01-01 12:00:00")))
        right.addData((4L, 2L, t("2024-01-01 12:00:30")))
        q.processAllAvailable()
        left.addData((5L, 3L, t("2024-01-01 12:30:00")))
        right.addData((6L, 3L, t("2024-01-01 12:30:10")))
        q.processAllAvailable()

        val removed = q.recentProgress.flatMap(_.stateOperators).map(_.numRowsRemoved).sum
        assert(removed > 0, "watermark advance never evicted buffered join state")
        val retained = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        assert(retained < 6, s"state retained all $retained input rows — horizon not applied")
      } finally {
        q.stop()
        spark.catalog.dropTempView("st_join_spec")
        graft.ops.Housekeeping.deleteRecursively(ckpt)
      }
    }
  }

  test("stream-static enrichment broadcasts the dim — fact side joins shuffle-free") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val facts = MemoryStream[(Long, Double)]
    val dim = Seq((1L, "ALGERIA"), (2L, "BRAZIL")).toDF("circuit_id", "nation")
    val enriched = facts.toDF().toDF("circuit_id", "value")
      .join(broadcast(dim), "circuit_id")
      .groupBy("nation").agg(sum("value").as("sum_value"))
    val ckpt = java.nio.file.Files.createTempDirectory("st_enrich_spec_ckpt")
    graft.ops.Housekeeping.withShufflePartitions(spark, 8) {
      val q = enriched.writeStream.format("memory").queryName("st_enrich_spec")
        .outputMode("complete").option("checkpointLocation", ckpt.toString).start()
      try {
        facts.addData((1L, 2.0), (1L, 3.0), (2L, 4.0), (9L, 99.0)) // 9L: no dim row
        q.processAllAvailable()
        val rows = spark.table("st_enrich_spec").orderBy("nation").collect()
        assert(rows.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
          Seq(("ALGERIA", 5.0), ("BRAZIL", 4.0)))
        // The micro-batch physical plan must hash-join against a broadcast
        // dim — an Exchange feeding a SortMergeJoin here would mean the
        // unbounded fact stream shuffles for the join at every batch.
        val baos = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(baos, true, "UTF-8")) { q.explain() }
        val plan = baos.toString("UTF-8")
        assert(plan.contains("BroadcastHashJoin"), s"dim not broadcast:\n$plan")
      } finally {
        q.stop()
        spark.catalog.dropTempView("st_enrich_spec")
        graft.ops.Housekeeping.deleteRecursively(ckpt)
      }
    }
  }
}
