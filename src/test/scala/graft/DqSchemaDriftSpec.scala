package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DqOps
import graft.tables.Tables

/** `dq_schema_drift` contract: an unplanned type conflict in one feed
  * generation must never damage the conforming generations — gen1/gen2 rows
  * land intact (bit-equal values, correct dispositions), and only the
  * genuinely uncastable gen3 cells are quarantined, with the raw cell
  * preserved for replay.
  */
class DqSchemaDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private lazy val out = DqOps.dqSchemaDrift.fn(spark, sf).cache()
  private lazy val ev = Tables.events(spark, sf)
    .select(col("event_id"), col("value")).cache()

  test("gen1 (baseline schema) rows land intact as ok") {
    val got = out.where(col("gen") === "gen1")
    assert(got.where(col("disposition") =!= "ok").count() == 0)
    val expected = ev.where(col("event_id") % 3 === 0)
    assert(got.count() == expected.count())
    // bit-equal values: anti-join on (event_id, value) is empty both ways
    assert(expected.join(got.select(col("event_id"), col("value")),
      Seq("event_id", "value"), "left_anti").count() == 0)
  }

  test("gen2 (additive evolution) rows land intact as ok_evolved with channel") {
    val got = out.where(col("gen") === "gen2")
    assert(got.where(col("disposition") =!= "ok_evolved").count() == 0)
    assert(got.where(col("channel").isNull).count() == 0)
    assert(got.count() == ev.where(col("event_id") % 3 === 1).count())
  }

  test("gen3 quarantines exactly the uncastable cells, raw value preserved") {
    val got = out.where(col("gen") === "gen3")
    val quarantined = got.where(col("disposition") === "quarantined")
    val expectedBad = ev.where(col("event_id") % 3 === 2 && col("event_id") % 7 === 0)
    assert(quarantined.count() == expectedBad.count())
    assert(quarantined.where(col("value").isNotNull).count() == 0)
    assert(quarantined.where(!col("value_raw").startsWith("err_")).count() == 0)
    val coerced = got.where(col("disposition") === "coerced")
    assert(coerced.where(col("value").isNull).count() == 0)
    assert(coerced.where(col("reason") =!= "type_drift:value DOUBLE->STRING").count() == 0)
    assert(got.count() == ev.where(col("event_id") % 3 === 2).count())
  }
}
