package graft

import graft.ops.GeoOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** geo_grid_neighbor_join (ops/GeoOps.scala): the 3×3-cell candidate rewrite
  * vs the naive pair space — completeness (the oracle proves equality; here
  * the complementary scale claim) and the grid invariants. */
class GeoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("candidate pair space is a small fraction of the naive cross join") {
    val d = TestSpark.sf001
    val cust = graft.tables.Tables.customer(spark, d).select(col("c_custkey"),
        ((col("c_custkey") * 48271 + 11) % 1000003 % 4096).as("clat"),
        ((col("c_custkey") * 69621 + 7) % 1000003 % 4096).as("clon"))
      .withColumn("cx", expr("clat DIV 256")).withColumn("cy", expr("clon DIV 256"))
    val sup = graft.tables.Tables.supplier(spark, d).select(col("s_suppkey"),
        ((col("s_suppkey") * 40692 + 3) % 1000003 % 4096).as("slat"),
        ((col("s_suppkey") * 16807 + 13) % 1000003 % 4096).as("slon"))
      .withColumn("sx", expr("slat DIV 256")).withColumn("sy", expr("slon DIV 256"))
      .select(col("*"), explode(expr(
        "flatten(transform(sequence(-1, 1), dx -> " +
          "transform(sequence(-1, 1), dy -> named_struct('dx', dx, 'dy', dy))))")).as("nb"))
    val nSup = graft.tables.Tables.supplier(spark, d).count()
    val nCust = cust.count()
    val candidates = sup.join(cust,
      sup("sx") + col("nb.dx") === cust("cx") &&
        sup("sy") + col("nb.dy") === cust("cy")).count()
    val naive = nSup * nCust
    info(s"candidates $candidates vs naive $naive (${candidates * 100.0 / naive}%)")
    // 3×3 of a 16×16 grid ≈ 3.5 % of the plane — assert well under a tenth
    assert(candidates < naive / 10)
  }

  test("every match is within the radius and best is the true argmin") {
    val rows = GeoOps.geoGridNeighborJoin.fn(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("best_dist2") <= 65536L)
      assert(r.getAs[Long]("n_near") >= 1L)
    }
  }
}
