package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Band

/** Contract for the native band join's hot-key mitigation
  * ([[Band.joinSliced]], round-13 verdict #2):
  *
  *   1. VALUE IDENTITY — the time-sliced join equals the unsliced native
  *      join row for row on a planted-skew fixture that includes rows
  *      EXACTLY on slice boundaries (the spot an inexact floor-div would
  *      flip), inner and left-outer, for slice widths equal to, larger
  *      than, and smaller than the band.
  *   2. BOUNDED SPREAD — the hot key's rows hash across (key, slice) groups:
  *      max rows per (key, slice) clustering group is a small fraction of
  *      the hot key's total, while the unsliced clustering puts the whole
  *      key in one group. ClusteredDistribution hashes groups to tasks, so
  *      group spread IS the per-task input bound the exec can achieve.
  *   3. REPLICATION BOUND — slicing stages each right row into at most
  *      ⌈band/slice⌉ + 1 slices, ≤ 2 at the recommended slice = band width.
  */
class NativeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val S = 600000000L // 10 min in micros — the band width

  /** One pathologically hot key (user 1: 4000 rows over ~7 days) beside 40
    * normal keys, with times planted on exact slice multiples and ±1µs. */
  private def fixture = {
    import spark.implicits._
    val hot = (0 until 4000).map { i =>
      val base = i.toLong * S / 4 // four rows per slice width
      val t = (i % 3) match {
        case 0 => base - (base % S)       // exactly on a slice boundary
        case 1 => base - (base % S) + 1L  // just past it
        case _ => base
      }
      (1L, t, i.toLong)
    }
    val cold = (0 until 40).flatMap(u =>
      (0 until 5).map(i => ((u + 2).toLong, i.toLong * S + u, (4000 + u * 5 + i).toLong)))
    (hot ++ cold).toDF("k", "t_us", "row_id")
  }

  private def leftDf = fixture.select(col("k").as("lk"), col("t_us").as("lt"),
    col("row_id").as("l_id"))
  private def rightDf = fixture.select(col("k").as("rk"), col("t_us").as("rt"),
    col("row_id").as("r_id"))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("l_id", "r_id").collect().map(_.toSeq).toIndexedSeq

  test("sliced ≡ unsliced on the planted-skew fixture, boundaries included, " +
    "inner and outer, at slice = band, 2×band, band/3") {
    val unslicedInner = rows(Band.join(leftDf, rightDf, Seq("lk" -> "rk"),
      "lt", "rt", 0L, S, broadcastRight = Some(false)))
    assert(unslicedInner.nonEmpty)
    for (slice <- Seq(S, 2 * S, S / 3)) {
      val sliced = rows(Band.joinSliced(leftDf, rightDf, Seq("lk" -> "rk"),
        "lt", "rt", 0L, S, sliceMicros = slice))
      assert(sliced == unslicedInner, s"inner mismatch at slice=$slice")
    }
    // outer: restrict the right side so unmatched left rows exist
    val sparseRight = rightDf.where(pmod(col("r_id"), lit(13)) === 0)
    val unslicedOuter = rows(Band.join(leftDf, sparseRight, Seq("lk" -> "rk"),
      "lt", "rt", 0L, S, broadcastRight = Some(false), leftOuter = true))
    val slicedOuter = rows(Band.joinSliced(leftDf, sparseRight, Seq("lk" -> "rk"),
      "lt", "rt", 0L, S, sliceMicros = S, leftOuter = true))
    assert(slicedOuter == unslicedOuter, "left-outer mismatch")
    assert(slicedOuter.count(_.last == null) > 0, "outer lane must carry unmatched rows")
  }

  test("slicing bounds the hot key's clustering-group size; unsliced puts " +
    "the whole key in one group") {
    val hotTotal = leftDf.where(col("lk") === 1L).count()
    // unsliced clustering: group = key → the hot key is one task's input
    val maxByKey = leftDf.groupBy("lk").count().agg(max("count")).head.getLong(0)
    assert(maxByKey == hotTotal)
    // sliced clustering: group = (key, slice) — ClusteredDistribution hashes
    // these groups across tasks, so this is the per-task input bound
    val maxByKeySlice = leftDf
      .withColumn("slice", ((col("lt") - pmod(col("lt"), lit(S))) / lit(S)).cast("long"))
      .groupBy("lk", "slice").count().agg(max("count")).head.getLong(0)
    info(s"hot key rows: $hotTotal; max (key, slice) group: $maxByKeySlice")
    assert(maxByKeySlice * 20 <= hotTotal,
      s"slicing must spread the hot key: $maxByKeySlice vs $hotTotal")
  }

  test("sliced as-of (tolerance-bounded) ≡ unsliced native as-of on the " +
    "planted-skew fixture, boundaries included, at slice = tol, 2×tol, tol/3") {
    import graft.plans.Asof
    val tol = S
    // sparse right so the null-if-none lane is populated
    val sparseRight = rightDf.where(pmod(col("r_id"), lit(13)) === 0)
    val unsliced = rows(Asof.join(leftDf, sparseRight, Seq("lk" -> "rk"),
      "lt", "rt", strict = true, tiebreakCols = Seq("r_id"),
      broadcastRight = Some(false), toleranceMicros = Some(tol)))
    assert(unsliced.nonEmpty && unsliced.count(_.last == null) > 0)
    for (slice <- Seq(tol, 2 * tol, tol / 3)) {
      val sliced = rows(Asof.joinSliced(leftDf, sparseRight, Seq("lk" -> "rk"),
        "lt", "rt", toleranceMicros = tol, sliceMicros = slice,
        strict = true, tiebreakCols = Seq("r_id")))
      assert(sliced == unsliced, s"as-of mismatch at slice=$slice")
    }
  }

  test("right-side replication is bounded: ≤ 2 copies per row at " +
    "slice = band width") {
    val rt = col("rt")
    val staged = rightDf.withColumn("slice",
      explode(sequence(
        ((rt - lit(S) - pmod(rt - lit(S), lit(S))) / lit(S)).cast("long"),
        ((rt - pmod(rt, lit(S))) / lit(S)).cast("long"))))
    val copies = staged.groupBy("r_id").count().agg(max("count")).head.getLong(0)
    assert(copies <= 2, s"right rows staged into $copies > 2 slices")
  }
}
