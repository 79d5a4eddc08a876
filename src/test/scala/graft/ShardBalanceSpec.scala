package graft

import graft.ops.PipelineOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The balance claim behind `pipeline_shard_balance` (the oracle proves the
  * assignment values; this spec proves the assignment is WORTH computing):
  *
  *  1. Tightness: the spread of per-shard token totals is at most one
  *     maximum-document's tokens — the snake's consecutive-block property.
  *  2. It beats the baseline: the same corpus dealt by content hash
  *     (`split_train_val_test`'s keying) lands a strictly wider spread.
  *  3. Every shard id is in [0, 8) and every document is assigned once.
  */
class ShardBalanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("snake sharding: per-shard token spread <= one max document; beats hash dealing") {
    val assigned = PipelineOps.pipelineShardBalance.fn(spark, TestSpark.sf001)
    val perShard = assigned.groupBy("shard")
      .agg(sum(col("n_tokens")).as("tok"), count(lit(1)).as("docs"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(perShard.map(_._1).sorted.toSeq == (0L until 8L), "every shard id in [0,8) exactly once")

    val toks = perShard.map(_._2)
    val spread = toks.max - toks.min
    val maxDoc = assigned.agg(max(col("n_tokens"))).collect().head.getLong(0)
    info(s"snake spread=$spread maxDoc=$maxDoc shardTotals=${toks.sorted.mkString(",")}")
    assert(spread <= maxDoc,
      s"snake per-shard token spread $spread exceeded one max document $maxDoc")

    // baseline: content-hash dealing on the same corpus — strictly worse
    val hashed = graft.tables.Tables.documents(spark, TestSpark.sf001)
      .select(size(split(col("text"), " ")).cast("long").as("n_tokens"),
        (conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long") % 8).as("shard"))
      .groupBy("shard").agg(sum(col("n_tokens")).as("tok"))
      .collect().map(_.getLong(1))
    val hashSpread = hashed.max - hashed.min
    info(s"hash spread=$hashSpread")
    assert(spread < hashSpread,
      s"snake spread $spread should beat content-hash dealing's $hashSpread")

    // exactly one assignment per document
    val n = graft.tables.Tables.documents(spark, TestSpark.sf001).count()
    assert(assigned.count() == n)
    assert(assigned.select("doc_id").distinct().count() == n)
  }
}
