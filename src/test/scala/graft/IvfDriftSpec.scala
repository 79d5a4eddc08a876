package graft

import graft.ops.LlmOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The staging claims behind `sim_search_ivf_drift_report` (the oracle
  * recomputes the report arithmetic from the staged per-cell counts; this
  * spec proves the staged counts describe the real index):
  *
  *  1. The base total equals the corpus rows the build indexed (id % 5 ≠ 0)
  *     and the v2 total equals the whole corpus — nothing dropped or
  *     double-counted across generations.
  *  2. v2 never shrinks a cell (append retains v1 files by reference).
  *  3. The global appended fraction is exactly the delta's share, and the
  *     report repeats it identically on every row (it is a table-level
  *     number a threshold reads off any row).
  */
class IvfDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("drift report's staged per-cell counts reconcile with the corpus split") {
    val d = TestSpark.sf0001
    val report = LlmOps.simSearchIvfDriftReport.fn(spark, d).collect()
    assert(report.nonEmpty)

    val n = graft.tables.Tables.embeddings(spark, d).count()
    val nBase = graft.tables.Tables.embeddings(spark, d)
      .where(pmod(col("vec_id"), lit(5)) =!= 0).count()

    val totB = report.map(_.getAs[Long]("n_base")).sum
    val tot = report.map(_.getAs[Long]("n_total")).sum
    assert(totB == nBase, s"staged base total $totB != indexed base rows $nBase")
    assert(tot == n, s"staged v2 total $tot != corpus rows $n")

    report.foreach { r =>
      assert(r.getAs[Long]("n_total") >= r.getAs[Long]("n_base"),
        s"cell ${r.getAs[Int]("cell")} shrank across the append")
      assert(r.getAs[Long]("index_added_ppm") == (n - nBase) * 1000000L / n,
        "global appended fraction must repeat identically on every row")
    }
  }
}
