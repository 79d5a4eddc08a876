package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2 categories G (sorts/limits/top-k) + H (set operations).
  *
  * Scale notes: sort+limit compiles to TakeOrderedAndProject (per-partition
  * top-k then a single driver merge of k-row heaps — no global sort at 100 TB;
  * asserted in PlanShapeSpec). Set ops are shuffle-on-all-columns; at scale
  * prefer the keyed groupBy forms, which these queries reduce to anyway.
  */
object SortSetOps {

  val sortMultiKey: Op = Op(
    "sort_multi_key",
    (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        // (l_orderkey, l_linenumber) not unique → l_quantity completes the
        // total order so the LIMIT boundary is deterministic.
        .orderBy(col("l_shipdate").desc_nulls_last, col("l_orderkey").asc,
                 col("l_linenumber").asc, col("l_quantity").asc)
        .limit(100),
    Some("SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem " +
      "ORDER BY l_shipdate DESC NULLS LAST, l_orderkey, l_linenumber, l_quantity LIMIT 100"))

  val topkGlobal: Op = Op(
    "topk_global",
    (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10),
    Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
      "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"))

  private def janFeb(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val o = Tables.orders(s, d)
    def month(from: String, until: String) =
      o.where(col("o_orderdate") >= lit(from).cast("timestamp") &&
              col("o_orderdate") < lit(until).cast("timestamp"))
        .select("o_custkey")
    (month("1995-01-01", "1995-02-01"), month("1995-02-01", "1995-03-01"))
  }

  private val oJan = "SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-02-01'"
  private val oFeb = "SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-02-01' AND o_orderdate < TIMESTAMP '1995-03-01'"

  val setUnionAll: Op = Op(
    "set_union_all",
    (s, d) => {
      val (jan, feb) = janFeb(s, d)
      jan.unionAll(feb).groupBy("o_custkey").agg(count(lit(1)).as("cnt")).orderBy("o_custkey")
    },
    Some(s"SELECT o_custkey, COUNT(*) AS cnt FROM (($oJan) UNION ALL ($oFeb)) GROUP BY o_custkey ORDER BY o_custkey"))

  val setUnionDistinct: Op = Op(
    "set_union_distinct",
    (s, d) => {
      val (jan, feb) = janFeb(s, d)
      jan.union(feb).distinct().orderBy("o_custkey")
    },
    Some(s"SELECT o_custkey FROM (($oJan) UNION ($oFeb)) ORDER BY o_custkey"))

  val setIntersect: Op = Op(
    "set_intersect",
    (s, d) => {
      val (jan, feb) = janFeb(s, d)
      jan.intersect(feb).orderBy("o_custkey")
    },
    Some(s"($oJan) INTERSECT ($oFeb) ORDER BY o_custkey"))

  val setExcept: Op = Op(
    "set_except",
    (s, d) => {
      val (jan, feb) = janFeb(s, d)
      jan.except(feb).orderBy("o_custkey")
    },
    Some(s"($oJan) EXCEPT ($oFeb) ORDER BY o_custkey"))

  /** MULTISET difference — `EXCEPT ALL` keeps multiplicity (a customer with
    * 3 January orders and 1 February order survives twice), the semantics a
    * reconciliation diff actually needs; the distinct EXCEPT above would
    * hide partial drift. Spark plans it as one hash aggregation computing
    * per-row count deltas — one shuffle, never a join per duplicate.
    * Duplicate output rows are identical, so the key-only ordering stays
    * hash-deterministic. */
  val setExceptAll: Op = Op(
    "set_except_all",
    (s, d) => {
      val (jan, feb) = janFeb(s, d)
      jan.exceptAll(feb).orderBy("o_custkey")
    },
    Some(s"($oJan) EXCEPT ALL ($oFeb) ORDER BY o_custkey"))

  /** MULTISET intersection — `INTERSECT ALL` keeps min(multiplicity) per
    * row, the "how much genuinely matches" measure between two deliveries
    * of the same feed. Same single-aggregation plan shape as EXCEPT ALL. */
  val setIntersectAll: Op = Op(
    "set_intersect_all",
    (s, d) => {
      val (jan, feb) = janFeb(s, d)
      jan.intersectAll(feb).orderBy("o_custkey")
    },
    Some(s"($oJan) INTERSECT ALL ($oFeb) ORDER BY o_custkey"))

  /** SCHEMA-RECONCILING union (round 13): two generations of a feed with
    * DIFFERENT column sets union by NAME with missing columns null-filled
    * (`unionByName(allowMissingColumns = true)`) — the schema-evolution
    * union every long-lived table eventually needs, where positional
    * unionAll would silently misalign or refuse. Jan rows carry the price,
    * Feb rows the priority; each side's missing column is null on the other
    * side's rows, and the total-order sort covers every output column.
    * Oracle: DuckDB `UNION ALL BY NAME` — the same reconciliation rule. */
  val setUnionByName: Op = Op(
    "set_union_by_name",
    (s, d) => {
      val o = Tables.orders(s, d)
      def month(from: String, until: String) =
        o.where(col("o_orderdate") >= lit(from).cast("timestamp") &&
                col("o_orderdate") < lit(until).cast("timestamp"))
      val jan = month("1995-01-01", "1995-02-01")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("double").as("price"))
      val feb = month("1995-02-01", "1995-03-01")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority").as("prio"))
      jan.unionByName(feb, allowMissingColumns = true)
        .orderBy(col("o_orderkey"), col("o_custkey"),
          col("price").asc_nulls_first, col("prio").asc_nulls_first)
    },
    Some("SELECT * FROM (" +
      "SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price FROM orders " +
      "WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-02-01' " +
      "UNION ALL BY NAME " +
      "SELECT o_orderkey, o_custkey, o_orderpriority AS prio FROM orders " +
      "WHERE o_orderdate >= TIMESTAMP '1995-02-01' AND o_orderdate < TIMESTAMP '1995-03-01') " +
      "ORDER BY o_orderkey, o_custkey, price NULLS FIRST, prio NULLS FIRST"))

  val all: Seq[Op] = Seq(sortMultiKey, topkGlobal, setUnionAll, setUnionDistinct, setIntersect,
    setUnionByName,
    setExcept, setExceptAll, setIntersectAll)
}
