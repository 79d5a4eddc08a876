package graft

import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Round-9 widening ops: dynamic partition overwrite (partition-level
  * restatement), CDC log compaction with tombstones, the data-quality gate
  * pair, and deterministic per-group reservoir sampling. */
class DqCdcOverwriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parquetFiles(dir: Path): Set[String] =
    Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .map(_.toString).toSet

  test("dynamic overwrite replaces only the restated partitions; untouched files survive verbatim") {
    val out = Files.createTempDirectory("dynpo_spec")
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .select(substring(col("o_orderpriority"), 1, 1).as("prio"),
        col("o_orderkey"), col("o_totalprice"))
    orders.withColumn("batch", lit("r1"))
      .repartition(col("prio"))
      .write.partitionBy("prio").mode("overwrite").parquet(out.toString)
    val untouchedBefore = (3 to 5).map(p => parquetFiles(out.resolve(s"prio=$p")))
    orders.where(col("prio").isin("1", "2") && col("o_orderkey") % 2 === 0)
      .withColumn("batch", lit("r2"))
      .repartition(col("prio"))
      .write.partitionBy("prio").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(out.toString)
    // untouched partition dirs still hold the exact same files (no rewrite)
    val untouchedAfter = (3 to 5).map(p => parquetFiles(out.resolve(s"prio=$p")))
    assert(untouchedBefore == untouchedAfter,
      "dynamic overwrite must not touch partitions absent from the incoming batch")
    val back = spark.read.parquet(out.toString)
      .withColumn("prio", col("prio").cast("string"))
    val byPrio = back.groupBy("prio")
      .agg(count(lit(1)).as("cnt"), collect_set("batch").as("batches"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[String](2).toSet)).toMap
    val srcCounts = orders.groupBy("prio").agg(count(lit(1)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val evenCounts = orders.where(col("o_orderkey") % 2 === 0)
      .groupBy("prio").agg(count(lit(1)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (3 to 5).foreach { p =>
      assert(byPrio(p.toString) == ((srcCounts(p.toString), Set("r1"))),
        s"class $p must keep its full r1 load")
    }
    (1 to 2).foreach { p =>
      assert(byPrio(p.toString) == ((evenCounts(p.toString), Set("r2"))),
        s"class $p must hold only the restated r2 rows")
    }
  }

  test("cdc compaction drops users whose last change is a tombstone; state is the last non-compacted row") {
    val got = graft.ops.SourceSinkOps.cdcApplyChanges.fn(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2), r.getLong(3)))
    val events = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val expected = events.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val last = rs.maxBy(r => (r._2.getTime, r._3))
      if (last._4 == "error") None
      else Some((u, last._2, last._5, rs.length.toLong))
    }.sortBy(_._1)
    assert(got.toSeq == expected)
    // the fixture must actually exercise the tombstone path
    val tombstoned = events.groupBy(_._1).count { case (_, rs) =>
      rs.maxBy(r => (r._2.getTime, r._3))._4 == "error"
    }
    assert(tombstoned > 0, "fixture has no user ending in a tombstone — tombstone path untested")
  }

  test("dq expectations: uniqueness rule fires on the known dup key, referential holds, checked counts agree") {
    val got = graft.ops.DqOps.dqExpectations.fn(spark, TestSpark.sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = Tables.lineitem(spark, TestSpark.sf001).count()
    assert(got.keySet == Set("r1_not_null_shipdate", "r2_range_quantity",
      "r3_set_returnflag", "r4_ref_orderkey", "r5_unique_line_id"))
    assert(got.values.forall(_._1 == n), "every rule checks the full table")
    assert(got("r5_unique_line_id")._2 > 0,
      "(l_orderkey,l_linenumber) is NOT unique in this testdata — the rule must fire")
    assert(got("r4_ref_orderkey")._2 == 0, "lineitem orderkeys all resolve in orders")
    val nullShip = Tables.lineitem(spark, TestSpark.sf001)
      .where(col("l_shipdate").isNull).count()
    assert(got("r1_not_null_shipdate")._2 == nullShip)
  }

  test("dq quarantine emits exactly the violating rows with accurate reason codes") {
    val li = Tables.lineitem(spark, TestSpark.sf001)
    val got = graft.ops.DqOps.dqQuarantineSplit.fn(spark, TestSpark.sf001)
    val expectedCnt = li.where(col("l_quantity") > 45.0 || col("l_discount") > 0.08 ||
      col("l_tax") > 0.07).count()
    assert(got.count() == expectedCnt)
    // reason string is exactly the ordered join of the tripped rules
    val bad = got.collect().find { r =>
      val expect = Seq(
        if (r.getDouble(2) > 45.0) Some("suspect_qty") else None,
        if (r.getDouble(3) > 0.08) Some("high_discount") else None,
        if (r.getDouble(4) > 0.07) Some("high_tax") else None).flatten.mkString(",")
      expect != r.getString(5)
    }
    assert(bad.isEmpty, s"reason mismatch on $bad")
    // multi-reason rows exist, so the concat path is exercised
    assert(got.where(col("reasons").contains(",")).count() > 0)
  }

  test("reservoir sample: exactly min(k, group size) per lang, deterministic, rank-prefix stable") {
    val op = graft.ops.PipelineOps.sampleReservoirGroup
    val a = op.fn(spark, TestSpark.sf001).collect().toSeq
    val b = op.fn(spark, TestSpark.sf001).collect().toSeq
    assert(a == b, "hash-ranked sample must be identical across runs")
    val perLang = a.groupBy(_.getString(1))
    val langSizes = Tables.documents(spark, TestSpark.sf001)
      .groupBy("lang").agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    langSizes.foreach { case (lang, sz) =>
      val rows = perLang.getOrElse(lang, Seq.empty)
      assert(rows.size == math.min(10L, sz),
        s"lang $lang: expected min(10, $sz) samples, got ${rows.size}")
      assert(rows.map(_.getInt(2)).sorted == (1 to rows.size).toSeq,
        s"lang $lang: sample_rank must be the contiguous prefix 1..k")
    }
  }
}
