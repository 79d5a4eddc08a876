package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.functions._

/** SURVEY.md §2 categories A (scans/sources) + B (projections/filters).
  *
  * Scale note: both queries are single-stage scan→filter→project pipelines;
  * the predicates and the 4-column projection reach
  * `FileSourceScanExec.pushedFilters` / `ReadSchema`, so at 100 TB they read
  * only the needed columns and skip row groups via parquet min/max stats.
  * Plan-shape asserted in PlanShapeSpec.
  */
object ScanFilterOps {

  val scanParquetProject: Op = Op(
    "scan_parquet_project",
    (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
               col("l_shipdate") <  lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        // (l_orderkey, l_linenumber) is NOT unique in this testdata — total
        // order over every emitted column (identical rows are interchangeable).
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"),
    Some("SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem " +
      "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
      "ORDER BY l_orderkey, l_linenumber, l_quantity, l_shipdate"))

  val filterMultiPredicate: Op = Op(
    "filter_multi_predicate",
    (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
               col("l_shipdate") <  lit("1998-01-01").cast("timestamp") &&
               col("l_quantity") < 24 &&
               col("l_returnflag").isin("A", "R") &&
               !(col("l_linestatus") === "O"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus", "l_shipdate"),
    Some("SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus, l_shipdate FROM lineitem " +
      "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' " +
      "AND l_quantity < 24 AND l_returnflag IN ('A','R') AND NOT (l_linestatus = 'O') " +
      "ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus, l_shipdate"))

  /** Per-row computed columns. Per-row double arithmetic is deterministic
    * across engines (identical IEEE inputs/ops), so no decimal pin needed. */
  val projectCaseExpr: Op = Op(
    "project_case_expr",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc_price"),
          when(col("l_quantity") > 30, "bulk").otherwise("small").as("bucket"),
          (col("l_discount") > 0.05).as("has_disc"))
        .orderBy("l_orderkey", "l_linenumber", "disc_price", "bucket", "has_disc"),
    Some("SELECT l_orderkey, l_linenumber, l_extendedprice * (1.0 - l_discount) AS disc_price, " +
      "CASE WHEN l_quantity > 30 THEN 'bulk' ELSE 'small' END AS bucket, l_discount > 0.05 AS has_disc " +
      "FROM lineitem ORDER BY l_orderkey, l_linenumber, disc_price, bucket, has_disc"))

  val all: Seq[Op] = Seq(scanParquetProject, filterMultiPredicate, projectCaseExpr)
}
