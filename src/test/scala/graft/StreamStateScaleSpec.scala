package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.{Encoder, Encoders}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The 10× state rehearsal for the stateful streaming family — the streaming
  * counterpart of DedupScaleSpec's work-count proofs: what bounds a stateful
  * query at 100 TB is that STATE tracks the key domain, not the event
  * volume. A per-key register (the stream_stateful_counter shape —
  * flatMapGroupsWithState, NoTimeout) is drained over synthetic streams and
  * the state store's own accounting (`numRowsTotal` from the query progress)
  * is asserted EXACTLY:
  *
  *  - 10× the events over the same keys → state row count UNCHANGED;
  *  - 10× the keys → state rows exactly 10×;
  *  - identical accounting on the default and RocksDB providers (the
  *    at-scale deployment choice, same claim RocksDbStateSpec makes for
  *    results).
  */
class StreamStateScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"

  /** Drain a per-key counter over `events` synthetic rows spread round-robin
    * across `keys` distinct user_ids; return the state store's final
    * numRowsTotal. */
  private def stateRowsAfterDrain(events: Int, keys: Int): Long = {
    implicit val stateEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val rowEnc: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    val src = Files.createTempDirectory("state_scale_src")
    val ckpt = Files.createTempDirectory("state_scale_ckpt")
    try {
      locally { // scope the implicits import away from the explicit encoders
        import spark.implicits._
        (0 until events).map(i => (i.toLong % keys, 1.0)).toDF("user_id", "value")
          .coalesce(1).write.mode("overwrite").parquet(src.toString)
      }
      val q = spark.readStream.schema("user_id BIGINT, value DOUBLE")
        .parquet(src.toString)
        .as[(Long, Double)](rowEnc)
        .groupByKey(_._1)(Encoders.scalaLong)
        .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
          (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[Long]) =>
            val cnt = state.getOption.getOrElse(0L) + rows.size
            state.update(cnt)
            Iterator((uid, cnt))
        }
        .toDF("user_id", "cnt")
        .writeStream.outputMode("update")
        .foreachBatch((batch: DataFrame, _: Long) => { batch.count(); () })
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val totals = q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal))
      assert(totals.nonEmpty, "query progress exposed no state operators")
      totals.max
    } finally {
      graft.ops.Housekeeping.deleteRecursively(src)
      graft.ops.Housekeeping.deleteRecursively(ckpt)
    }
  }

  test("state rows track distinct keys, not events, at 10x — on both providers") {
    graft.ops.Housekeeping.withShufflePartitions(spark, 8) {
      val base = stateRowsAfterDrain(events = 2000, keys = 100)
      val tenXEvents = stateRowsAfterDrain(events = 20000, keys = 100)
      val tenXKeys = stateRowsAfterDrain(events = 20000, keys = 1000)
      assert(base == 100L, s"counter state should be one row per key, got $base")
      assert(tenXEvents == base,
        s"10x events over the same keys grew state: $base -> $tenXEvents")
      assert(tenXKeys == 10 * base,
        s"10x keys should give exactly 10x state rows: $base -> $tenXKeys")

      val prev = spark.conf.getOption(ProviderConf)
      spark.conf.set(ProviderConf,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val rocks = stateRowsAfterDrain(events = 20000, keys = 1000)
        assert(rocks == tenXKeys,
          s"RocksDB provider accounts state differently: $tenXKeys vs $rocks")
      } finally prev match {
        case Some(v) => spark.conf.set(ProviderConf, v)
        case None => spark.conf.unset(ProviderConf)
      }
    }
  }
}
