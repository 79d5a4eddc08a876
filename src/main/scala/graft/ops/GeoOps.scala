package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Geospatial neighbor search as a GRID-CELL BUCKETED EQUI-JOIN — the
  * rewrite every distributed spatial engine (Sedona-class) applies so a
  * radius join never materializes the supplier × customer pair space.
  *
  * Coordinates are derived deterministically from the entity keys by pure
  * integer arithmetic (`(key·a + b) mod 1000003 mod 4096`) so BOTH engines
  * compute bit-identical positions from the same parquet inputs — no float
  * ever exists in the query, making the hash oracle exact.
  */
object GeoOps {

  /** Radius join: for each supplier, the customers within Euclidean distance
    * R = 256 grid units, aggregated to (match count, nearest customer).
    * Rewrite: positions bucket into 256-unit cells (16×16 over the 4096²
    * grid); since R = CELL, every admissible pair lies in the supplier's
    * 3×3 cell neighborhood (pigeonhole: |Δ| ≤ R per axis ⇒ adjacent cell) —
    * so candidates come from a 9-fanout EQUI-join on cell ids and only the
    * exact integer distance² filter runs per candidate. The oracle is the
    * NAIVE cross-join radius query — hash equality proves the neighborhood
    * rewrite admits exactly the naive pair set.
    *
    * Scale notes (100 TB): the pair space never exists — candidate count is
    * Σ over cells of |suppliers_cell| × |customers_3×3| (occupancy-bounded,
    * ~3.5 % of naive at sf0.1), the join is a plain hash equi-join on cell
    * id, and fan-out is a constant 9. A skewed (dense-city) cell shows up as
    * a hot join key — exactly the shape `join_skew_salted`/AQE already
    * handle; a production grid adds a second, finer level for dense cells
    * (the standard quad-tree refinement) without changing the join shape. */
  val geoGridNeighborJoin: Op = Op(
    "geo_grid_neighbor_join",
    (s, d) => {
      val cust = Tables.customer(s, d).select(col("c_custkey"),
          ((col("c_custkey") * 48271 + 11) % 1000003 % 4096).as("clat"),
          ((col("c_custkey") * 69621 + 7) % 1000003 % 4096).as("clon"))
        .withColumn("cx", expr("clat DIV 256"))
        .withColumn("cy", expr("clon DIV 256"))
      val sup = Tables.supplier(s, d).select(col("s_suppkey"),
          ((col("s_suppkey") * 40692 + 3) % 1000003 % 4096).as("slat"),
          ((col("s_suppkey") * 16807 + 13) % 1000003 % 4096).as("slon"))
        .withColumn("sx", expr("slat DIV 256"))
        .withColumn("sy", expr("slon DIV 256"))
        // constant 9-fanout: the supplier probes its 3×3 cell neighborhood
        .select(col("*"), explode(expr(
          "flatten(transform(sequence(-1, 1), dx -> " +
            "transform(sequence(-1, 1), dy -> named_struct('dx', dx, 'dy', dy))))")).as("nb"))
      sup.join(cust,
          sup("sx") + col("nb.dx") === cust("cx") &&
            sup("sy") + col("nb.dy") === cust("cy"))
        .select(col("s_suppkey"), col("c_custkey"),
          ((col("slat") - col("clat")) * (col("slat") - col("clat")) +
            (col("slon") - col("clon")) * (col("slon") - col("clon"))).as("dist2"))
        .where(col("dist2") <= 65536)
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_near"),
          min(struct(col("dist2"), col("c_custkey"))).as("best"))
        .select(col("s_suppkey"), col("n_near"),
          col("best.dist2").as("best_dist2"), col("best.c_custkey").as("best_cust"))
        .orderBy("s_suppkey")
    },
    Some("WITH c AS (SELECT c_custkey, (c_custkey*48271+11)%1000003%4096 AS clat, " +
      "(c_custkey*69621+7)%1000003%4096 AS clon FROM customer), " +
      "sp AS (SELECT s_suppkey, (s_suppkey*40692+3)%1000003%4096 AS slat, " +
      "(s_suppkey*16807+13)%1000003%4096 AS slon FROM supplier), " +
      "pr AS (SELECT s_suppkey, c_custkey, " +
      "(slat-clat)*(slat-clat)+(slon-clon)*(slon-clon) AS dist2 " +
      "FROM sp, c WHERE (slat-clat)*(slat-clat)+(slon-clon)*(slon-clon) <= 65536), " +
      "sel AS (SELECT s_suppkey, c_custkey, dist2, " +
      "row_number() OVER (PARTITION BY s_suppkey ORDER BY dist2, c_custkey) AS rn, " +
      "COUNT(*) OVER (PARTITION BY s_suppkey) AS n_near FROM pr) " +
      "SELECT s_suppkey, n_near, dist2 AS best_dist2, c_custkey AS best_cust " +
      "FROM sel WHERE rn = 1 ORDER BY s_suppkey"))

  val all: Seq[Op] = Seq(geoGridNeighborJoin)
}
