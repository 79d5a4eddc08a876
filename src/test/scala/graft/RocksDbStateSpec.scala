package graft

import graft.ops.StreamingOps
import org.scalatest.funsuite.AnyFunSuite

/** The streaming ops must be state-store-provider-agnostic: at 100 TB the
  * deployment choice is the RocksDB provider (state larger than executor
  * heap, incremental checkpoints), and SCALE.md claims the same plans run
  * unchanged. Prove it: the session-window op produces byte-identical
  * results on the default HDFS-backed store and on RocksDB
  * (rocksdbjni ships with Spark 4.1.2). */
class RocksDbStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"

  private def providerParity(name: String, run: () => Array[org.apache.spark.sql.Row]): Unit = {
    val default = run()
    graft.ops.Housekeeping.releaseAll()
    val prev = spark.conf.getOption(ProviderConf)
    spark.conf.set(ProviderConf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = run()
      graft.ops.Housekeeping.releaseAll()
      assert(rocks.length == default.length && rocks.sameElements(default),
        s"$name: RocksDB result diverged: ${rocks.length} vs ${default.length} rows")
    } finally prev match {
      case Some(v) => spark.conf.set(ProviderConf, v)
      case None => spark.conf.unset(ProviderConf)
    }
  }

  test("stream_session_stateful: RocksDB state store equals default store") {
    providerParity("stream_session_stateful",
      () => StreamingOps.streamSessionStateful.fn(spark, TestSpark.sf0001).collect())
  }

  // the outer join is the state-heaviest op here (both sides buffered until
  // watermark eviction, null emission driven by state timers) — exactly the
  // query class RocksDB exists for at 100 TB
  test("stream_join_left_outer: RocksDB state store equals default store") {
    providerParity("stream_join_left_outer",
      () => StreamingOps.streamJoinLeftOuter.fn(spark, TestSpark.sf0001).collect())
  }
}
