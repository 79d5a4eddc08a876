package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.functions._
import Dets._

/** Data-quality validation — the Deequ-shaped gate every production load
  * runs before publishing a table. Two surfaces: a per-rule violation
  * SUMMARY (the circuit-breaker a scheduler reads) and a row-level
  * QUARANTINE split (the offending rows routed aside with machine-readable
  * reasons). Both are declarative single-pass Spark plans — no collect, no
  * UDFs — so the same code is the 100 TB gate.
  */
object DqOps {

  /** Rule engine over lineitem: five expectation classes — not-null, value
    * range, set membership, referential integrity (every l_orderkey resolves
    * in orders), and key uniqueness ((l_orderkey, l_linenumber), which this
    * testdata deliberately violates — the rule MUST fire). Output is the
    * scheduler-facing contract: rule → rows checked → violations.
    *
    * Scale notes (100 TB): the three row-local rules share ONE scan
    * (conditional sums, map-side partial agg → 1-row result); referential
    * integrity is a left-anti join against the (broadcastable or
    * shuffle-equi) orders key set — never a NOT IN subquery re-scan per row;
    * uniqueness is one hash groupBy on the candidate key counting groups
    * with multiplicity > 1. Nothing here is quadratic and every rule's
    * reduction is associative, so the gate costs ~2 scans of the fact at
    * any scale. */
  val dqExpectations: Op = Op(
    "dq_expectations",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val rowLocal = li.agg(
        count(lit(1)).as("checked"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("v_null"),
        sum(when(!col("l_quantity").between(1.0, 50.0), 1L).otherwise(0L)).as("v_range"),
        sum(when(!col("l_returnflag").isin("R", "A", "N"), 1L).otherwise(0L)).as("v_set"))
      val notNull = rowLocal.select(lit("r1_not_null_shipdate").as("rule"),
        col("checked"), col("v_null").as("violations"))
      val range = rowLocal.select(lit("r2_range_quantity").as("rule"),
        col("checked"), col("v_range").as("violations"))
      val members = rowLocal.select(lit("r3_set_returnflag").as("rule"),
        col("checked"), col("v_set").as("violations"))
      val referential = li.join(Tables.orders(s, d),
          li("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .crossJoin(li.agg(count(lit(1)).as("checked")))
        .select(lit("r4_ref_orderkey").as("rule"), col("checked"), col("violations"))
      val unique = li.groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).as("checked"),
          sum(when(col("n") > 1, col("n") - 1).otherwise(0L)).as("violations"))
        .select(lit("r5_unique_line_id").as("rule"), col("checked"), col("violations"))
      notNull.unionAll(range).unionAll(members).unionAll(referential).unionAll(unique)
        .orderBy("rule")
    },
    Some("WITH rl AS (SELECT COUNT(*) AS checked, " +
      "CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null, " +
      "CAST(SUM(CASE WHEN NOT (l_quantity BETWEEN 1.0 AND 50.0) THEN 1 ELSE 0 END) AS BIGINT) AS v_range, " +
      "CAST(SUM(CASE WHEN l_returnflag NOT IN ('R','A','N') THEN 1 ELSE 0 END) AS BIGINT) AS v_set " +
      "FROM lineitem) " +
      "SELECT 'r1_not_null_shipdate' AS rule, checked, v_null AS violations FROM rl " +
      "UNION ALL SELECT 'r2_range_quantity', checked, v_range FROM rl " +
      "UNION ALL SELECT 'r3_set_returnflag', checked, v_set FROM rl " +
      "UNION ALL SELECT 'r4_ref_orderkey', (SELECT COUNT(*) FROM lineitem), " +
      "(SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS " +
      "(SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) " +
      "UNION ALL SELECT 'r5_unique_line_id', CAST(SUM(n) AS BIGINT), " +
      "CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) FROM " +
      "(SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber) " +
      "ORDER BY rule"))

  /** Row-level quarantine: rows tripping any of three business-band rules
    * (quantity > 45, discount > 0.08, tax > 0.07) are routed aside with a
    * comma-joined reason code string — the shape a repair/triage job
    * consumes. Clean rows pass through untouched (not re-emitted here; the
    * gate's pass-through is the identity projection). Ordered by every
    * emitted column because (l_orderkey, l_linenumber) is not unique in
    * this testdata.
    *
    * Scale notes (100 TB): scan-local — each row decides its own fate, the
    * reason string is built from codegen'd CASEs, and the quarantine output
    * is only the violating minority; zero shuffles before the final
    * presentation sort. */
  val dqQuarantineSplit: Op = Op(
    "dq_quarantine_split",
    (s, d) => {
      val qQty = when(col("l_quantity") > 45.0, "suspect_qty")
      val qDisc = when(col("l_discount") > 0.08, "high_discount")
      val qTax = when(col("l_tax") > 0.07, "high_tax")
      Tables.lineitem(s, d)
        .withColumn("reasons", concat_ws(",", qQty, qDisc, qTax))
        .where(col("reasons") =!= "")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_tax"), col("reasons"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax", "reasons")
    },
    Some("SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax, " +
      "concat_ws(',', CASE WHEN l_quantity > 45.0 THEN 'suspect_qty' END, " +
      "CASE WHEN l_discount > 0.08 THEN 'high_discount' END, " +
      "CASE WHEN l_tax > 0.07 THEN 'high_tax' END) AS reasons " +
      "FROM lineitem WHERE l_quantity > 45.0 OR l_discount > 0.08 OR l_tax > 0.07 " +
      "ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_tax, reasons"))

  val all: Seq[Op] = Seq(dqExpectations, dqQuarantineSplit)
}
