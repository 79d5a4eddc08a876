package graft

import graft.ops.{LlmOps, SourceSinkOps, StreamingOps}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Soak: repeated invocations of the artifact-creating ops must hold a
  * bounded footprint (one live generation each). The registries are
  * per-JVM, and /tmp carries leftovers from earlier JVMs, so every bound is
  * asserted as *growth within this JVM*, not an absolute count. */
class HousekeepingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpCount(prefix: String): Int =
    Files.list(Paths.get(System.getProperty("java.io.tmpdir"))).iterator().asScala
      .count(_.getFileName.toString.startsWith(prefix))

  test("repeated bucketed-join runs keep one table generation") {
    SourceSinkOps.sinkBucketedJoin.fn(spark, TestSpark.sf0001).count() // gen 1
    val dirsAfterFirst = tmpCount("graft_bucketed")
    val tablesAfterFirst = spark.catalog.listTables().collect()
      .count(_.name.startsWith("li_bucketed_"))
    (1 to 2).foreach(_ => SourceSinkOps.sinkBucketedJoin.fn(spark, TestSpark.sf0001).count())
    val tablesAfter = spark.catalog.listTables().collect()
      .count(_.name.startsWith("li_bucketed_"))
    assert(tablesAfter == tablesAfterFirst,
      s"live bucketed tables grew $tablesAfterFirst -> $tablesAfter")
    assert(tmpCount("graft_bucketed") <= dirsAfterFirst,
      "bucketed table dirs must not accumulate across runs")
  }

  test("repeated dedup runs keep one cached signature generation") {
    LlmOps.dedupSimhash.fn(spark, TestSpark.sf0001).count()
    val before = spark.sparkContext.getPersistentRDDs.size
    (1 to 2).foreach(_ => LlmOps.dedupSimhash.fn(spark, TestSpark.sf0001).count())
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before, s"cached RDD count grew $before -> $after")
  }

  test("repeated streaming runs keep one sink dir and one memory view per op") {
    StreamingOps.streamDedup.fn(spark, TestSpark.sf0001).count()
    val sinkAfterFirst = tmpCount("st_dedup_out")
    val ckptAfterFirst = tmpCount("st_dedup_ckpt")
    val srcAfterFirst = tmpCount("st_src")
    StreamingOps.streamDedup.fn(spark, TestSpark.sf0001).count()
    assert(tmpCount("st_dedup_out") <= sinkAfterFirst, "sink dirs must not accumulate")
    assert(tmpCount("st_dedup_ckpt") <= ckptAfterFirst, "checkpoints must be deleted after drain")
    assert(tmpCount("st_src") <= srcAfterFirst, "staged sources must be deleted after drain")

    StreamingOps.streamTumblingWatermark.fn(spark, TestSpark.sf0001).count()
    val viewsAfterFirst = spark.catalog.listTables().collect()
      .count(_.name.startsWith("st_tumble_"))
    StreamingOps.streamTumblingWatermark.fn(spark, TestSpark.sf0001).count()
    val viewsAfter = spark.catalog.listTables().collect()
      .count(_.name.startsWith("st_tumble_"))
    assert(viewsAfter == viewsAfterFirst,
      s"memory-sink views grew $viewsAfterFirst -> $viewsAfter")
  }

  test("repeated jsonl/orc round-trips keep one temp dir each") {
    SourceSinkOps.sourceJsonlRoundtrip.fn(spark, TestSpark.sf0001).count()
    SourceSinkOps.sourceOrcRoundtrip.fn(spark, TestSpark.sf0001).count()
    val jsonlAfterFirst = tmpCount("graft_jsonl")
    val orcAfterFirst = tmpCount("graft_orc")
    (1 to 2).foreach { _ =>
      SourceSinkOps.sourceJsonlRoundtrip.fn(spark, TestSpark.sf0001).count()
      SourceSinkOps.sourceOrcRoundtrip.fn(spark, TestSpark.sf0001).count()
    }
    assert(tmpCount("graft_jsonl") <= jsonlAfterFirst, "jsonl dirs must not accumulate")
    assert(tmpCount("graft_orc") <= orcAfterFirst, "orc dirs must not accumulate")
  }
}
