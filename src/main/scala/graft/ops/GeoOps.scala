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

  /** Point-in-rectangle containment join — the second classic spatial
    * shape beside the radius join: each nation owns a 512×512 "district"
    * box (corner derived from its key by the same integer-arithmetic
    * scheme as the point positions), and the op counts the customers
    * inside each district. Rewrite: a box spans at most 3×3 of the
    * 256-unit grid cells, so the box side EXPLODES to its covered cell
    * ids (bounded ≤ 9 fan-out) and candidates come from a hash EQUI-join
    * on the cell — the exact containment predicate then runs per
    * candidate only. Districts with zero residents surface explicitly
    * via the final right join to the nation dim. Oracle = the naive
    * cross-join containment count; hash equality proves the cell
    * decomposition admits exactly the naive membership.
    *
    * Scale notes (100 TB): the pair space never exists — candidates are
    * cell-occupancy-bounded; the box table is dim-sized and broadcasts;
    * the exact predicate is codegen'd integer compares. A polygon layer
    * generalizes by rasterizing each polygon to covered cells the same
    * way (the standard spatial-join grid rewrite). */
  val geoBboxContainsJoin: Op = Op(
    "geo_bbox_contains_join",
    (s, d) => {
      val cust = Tables.customer(s, d).select(col("c_custkey"),
          ((col("c_custkey") * 48271 + 11) % 1000003 % 4096).as("clat"),
          ((col("c_custkey") * 69621 + 7) % 1000003 % 4096).as("clon"))
        .withColumn("cx", expr("clat DIV 256"))
        .withColumn("cy", expr("clon DIV 256"))
      val box = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"),
        ((col("n_nationkey") * 31627 + 17) % 1000003 % 3584).as("x0"),
        ((col("n_nationkey") * 73939 + 29) % 1000003 % 3584).as("y0"))
      val cells = box.select(col("n_nationkey"), col("x0"), col("y0"),
        explode(expr("sequence(x0 DIV 256, (x0 + 511) DIV 256)")).as("bx"))
        .select(col("n_nationkey"), col("x0"), col("y0"), col("bx"),
          explode(expr("sequence(y0 DIV 256, (y0 + 511) DIV 256)")).as("by"))
      val inside = broadcast(cells).join(cust,
          col("bx") === col("cx") && col("by") === col("cy") &&
            col("clat").between(col("x0"), col("x0") + 511) &&
            col("clon").between(col("y0"), col("y0") + 511))
        .groupBy("n_nationkey")
        .agg(count(lit(1)).as("n_inside"), min(col("c_custkey")).as("first_resident"))
      box.join(inside, Seq("n_nationkey"), "left")
        .select(col("n_nationkey"), col("n_name"), col("x0"), col("y0"),
          coalesce(col("n_inside"), lit(0L)).as("n_inside"),
          col("first_resident"))
        .orderBy("n_nationkey")
    },
    Some("WITH c AS (SELECT c_custkey, (c_custkey*48271+11)%1000003%4096 AS clat, " +
      "(c_custkey*69621+7)%1000003%4096 AS clon FROM customer), " +
      "bx AS (SELECT n_nationkey, n_name, (n_nationkey*31627+17)%1000003%3584 AS x0, " +
      "(n_nationkey*73939+29)%1000003%3584 AS y0 FROM nation), " +
      "ins AS (SELECT n_nationkey, CAST(COUNT(*) AS BIGINT) AS n_inside, " +
      "MIN(c_custkey) AS first_resident FROM bx, c " +
      "WHERE clat BETWEEN x0 AND x0 + 511 AND clon BETWEEN y0 AND y0 + 511 " +
      "GROUP BY 1) " +
      "SELECT bx.n_nationkey, bx.n_name, bx.x0, bx.y0, " +
      "COALESCE(ins.n_inside, 0) AS n_inside, ins.first_resident " +
      "FROM bx LEFT JOIN ins USING (n_nationkey) ORDER BY bx.n_nationkey"))

  val all: Seq[Op] = Seq(geoGridNeighborJoin, geoBboxContainsJoin)
}
