package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Subquery surface — Catalyst's decorrelation at work (SURVEY §4.2:
  * RewriteCorrelatedScalarSubquery). Both ops are written as SQL (the
  * subquery syntax IS the surface) over GraftCatalog views; averages inside
  * predicates use the exact-decimal form so the comparison boundary is
  * engine-stable.
  *
  * Scale notes: the correlated scalar subquery decorrelates into an
  * aggregate + join on the correlation key (one shuffle, no per-row
  * execution); the uncorrelated scalar is a one-row broadcast.
  */
object SubqueryOps {

  /** TPC-H Q17 shape: lineitems ordering less than half their part's average
    * quantity — per-brand revenue of small orders. */
  val subqueryCorrelated: Op = Op(
    "subquery_correlated",
    (s, d) => {
      GraftCatalog.registerAll(s, d)
      s.sql("SELECT p_brand, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue, " +
        "COUNT(*) AS cnt " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey " +
        "WHERE l_quantity < (SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) " +
        "FROM lineitem l2 WHERE l2.l_partkey = p_partkey) " +
        "GROUP BY p_brand ORDER BY p_brand")
    },
    Some("SELECT p_brand, " +
      "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue, " +
      "COUNT(*) AS cnt " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE l_quantity < (SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) " +
      "FROM lineitem l2 WHERE l2.l_partkey = p_partkey) " +
      "GROUP BY p_brand ORDER BY p_brand"))

  /** Uncorrelated scalar subquery: orders well above the global average
    * price. 1.5× (not 2×) so the predicate matches a non-empty set at every
    * test sf — round 1's 2× matched 0 rows, which made the hash check
    * vacuous (VERDICT r1 #3). */
  val subqueryScalar: Op = Op(
    "subquery_scalar",
    (s, d) => {
      GraftCatalog.registerAll(s, d)
      s.sql("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM orders) " +
        "ORDER BY o_orderkey")
    },
    Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
      "WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM orders) " +
      "ORDER BY o_orderkey"))

  /** Approximate percentiles (GK sketch) — the warehouse staple for latency/
    * load distributions. Sketch internals are engine-specific ⇒ no hash
    * oracle; PercentileSpec asserts the results bracket the exact quantiles
    * within the accuracy bound. */
  val aggApproxPercentile: Op = Op(
    "agg_approx_percentile",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("p50"),
          percentile_approx(col("o_totalprice"), lit(0.95), lit(1000)).as("p95"),
          count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority"),
    None)

  val all: Seq[Op] = Seq(subqueryCorrelated, subqueryScalar, aggApproxPercentile)
}
