package graft

import org.scalatest.funsuite.AnyFunSuite

/** Determinism matrix (SURVEY §5.4): every declared query, run under
  * shuffle.partitions 1 and 4, must produce identical results — catches
  * float-sum partial-aggregation order bugs before the oracle does.
  * Streaming ops are included (their state-store paths must be
  * partitioning-invariant too). */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name is invariant under shuffle partitioning") {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val r1 = try fn(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
      val r4 = fn(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      assert(r1 == r4, s"$name differs between 1 and 4 shuffle partitions")
      assert(r1.nonEmpty, s"$name returned no rows at sf0.001")
    }
  }
}
