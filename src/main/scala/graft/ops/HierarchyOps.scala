package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.tables.Tables

/** Recursive-hierarchy operators — the dimension shape every warehouse
  * eventually meets (org charts, site → feeder → circuit trees, category
  * taxonomies) and the one relational form a single window or join cannot
  * express: aggregation over ALL descendants of every node at once.
  *
  * The hierarchy: customers form a tree by key arithmetic — `parent(v) =
  * v div 8` for v ≥ 1, customer 0 is the root. Derived purely from driver
  * testdata (SURVEY.md §1.3), deterministic, and DEEP enough to be honest:
  * depth grows as log₈(|customer|) (5 levels at sf0.1), so any fixed-join
  * "flatten N levels" cheat would break at the next sf while the doubling
  * closure below does not.
  *
  * Determinism (SURVEY.md §7.2): the closure is all-integer (keys), the
  * rollup measure is exact-decimal-summed `o_totalprice` cast to double once
  * at the end; every output row is keyed by the unique node id.
  *
  * Scale notes (100 TB): the ancestor closure is built by POINTER DOUBLING —
  * round k composes the ≤2^k-step closure with itself, so `Rounds = 4` covers
  * depth 16 (= 8^16 customers, far past any real sf) in 4 equi-join+distinct
  * rounds, each one shuffle on the node key. Closure cardinality is
  * |nodes| · depth = n·log n rows — the linear-ish closure-table every
  * hierarchy engine materializes, never the n² reachability matrix. The
  * rollup is then ONE map-side-combinable groupBy on the ancestor key.
  * Lineage is truncated per round ([[GraphOps]]' playbook); HierarchySpec
  * asserts Rounds−1 ≡ Rounds on real data (convergence with slack).
  */
object HierarchyOps {

  /** Doubling rounds: closure reach 2^Rounds = 16 levels ≥ any tree this
    * key arithmetic can produce below 8^16 customers. */
  private[graft] val Rounds = 4

  /** Rounds actually NEEDED for this data: the tree is defined by key
    * arithmetic (`parent = v div 8`), so the max depth is exactly the
    * div-8 chain length of the max key — one tiny aggregate, computed
    * exactly with integer ops (no float log). The closure is converged once
    * 2^rounds ≥ depth, so running the worst-case [[Rounds]] past that point
    * composes an already-transitive relation with itself — identical rows,
    * wasted join+distinct+barrier per extra round (guide §1.2: don't compute
    * things you throw away). Capped at [[Rounds]], the proven worst case. */
  private[graft] def roundsFor(s: SparkSession, d: String): Int = {
    // max() over an EMPTY table is a null aggregate — fall back to the
    // proven worst case instead of NPE-ing where the old fixed-Rounds
    // path ran fine.
    val maxRow = Tables.customer(s, d).agg(max(col("c_custkey"))).first()
    if (maxRow.isNullAt(0)) return Rounds
    val maxKey = maxRow.getLong(0)
    var depth = 0L
    var v = math.max(maxKey, 1L)
    while (v > 0) { v /= 8; depth += 1 }
    var r = 0
    var reach = 1L
    while (reach < depth) { reach *= 2; r += 1 }
    math.min(math.max(r, 1), Rounds)
  }

  /** Ancestor closure (descendant, ancestor) — self-pairs included — after
    * `rounds` doubling rounds. Shared by the op and HierarchySpec's
    * convergence assertion. */
  private[graft] def closure(s: SparkSession, d: String, rounds: Int): DataFrame = {
    val base = Tables.customer(s, d)
      .select(col("c_custkey").as("des"), col("c_custkey").as("anc"))
      .union(Tables.customer(s, d).where(col("c_custkey") > 0)
        .select(col("c_custkey").as("des"), expr("c_custkey div 8").as("anc")))
      .distinct()
    var acc = base.transform(Housekeeping.iterationBarrier)
    for (_ <- 1 to rounds) {
      // self-composition: (x.des → x.anc → y.anc); self-pairs on both ends
      // make the result a superset of the previous round, so no union needed
      acc = acc.as("x").join(acc.as("y"), col("x.anc") === col("y.des"))
        .select(col("x.des").as("des"), col("y.anc").as("anc"))
        .distinct()
        .transform(Housekeeping.iterationBarrier)
    }
    acc
  }

  /** The oracle's spelling of the same closure: the recursive parent chain
    * (strictly decreasing keys, so UNION ALL terminates at the root). */
  private val closureCte =
    "anc(des, anc) AS (SELECT c_custkey, c_custkey FROM customer " +
      "UNION ALL SELECT a.des, a.anc // 8 FROM anc a WHERE a.anc > 0)"

  /** Subtree rollup over the customer hierarchy: for EVERY node, its depth,
    * subtree size, and the order count + exact-decimal sales total across
    * all descendants (self included) — the "roll the measure up the tree"
    * query (regional sales up an org chart, energy up a feeder tree) that
    * needs the transitive closure, not a fixed number of self-joins.
    */
  val dimHierarchyRollup: Op = Op(
    "dim_hierarchy_rollup",
    (s, d) => {
      val cl = Housekeeping.cacheBounded("hier_closure", closure(s, d, roundsFor(s, d)))
      // per-customer order aggregates (left join: childless customers carry 0)
      val co = Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n"), sum(Dets.d2(col("o_totalprice"))).as("s_dec"))
      val depth = cl.groupBy(col("des").as("node_d"))
        .agg((count(lit(1)) - 1).cast("int").as("depth"))
      cl.join(co, cl("des") === co("c_custkey"))
        .groupBy(col("anc").as("node"))
        .agg(count(lit(1)).as("n_subtree"),
          sum(col("n")).as("n_orders"),
          coalesce(sum(col("s_dec")), Dets.d2(lit(0))).cast(DoubleType).as("subtree_sales"))
        .join(depth, col("node") === col("node_d"))
        .select(col("node"), col("depth"), col("n_subtree"), col("n_orders"),
          col("subtree_sales"))
        .orderBy("node")
    },
    Some("WITH RECURSIVE " + closureCte + ", " +
      "co AS (SELECT c_custkey, COUNT(o_orderkey) AS n, " +
      "SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS s " +
      "FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY 1), " +
      "dep AS (SELECT des, CAST(COUNT(*) - 1 AS INT) AS depth FROM anc GROUP BY 1), " +
      "ru AS (SELECT a.anc AS node, COUNT(*) AS n_subtree, " +
      "CAST(SUM(co.n) AS BIGINT) AS n_orders, " +
      "CAST(COALESCE(SUM(co.s), 0) AS DOUBLE) AS subtree_sales " +
      "FROM anc a JOIN co ON co.c_custkey = a.des GROUP BY 1) " +
      "SELECT node, depth, n_subtree, n_orders, subtree_sales " +
      "FROM ru JOIN dep ON dep.des = ru.node ORDER BY node"))

  /** The SAME recursive traversal stated as SQL and executed by Spark's own
    * recursive-CTE machinery (`WITH RECURSIVE` → `UnionLoopExec`, new in
    * Spark 4.x) — the SQL-surface twin of [[dimHierarchyRollup]]'s DataFrame
    * doubling loop. Two independent engine formulations (Spark's iterative
    * UnionLoop vs DuckDB's recursive CTE) against one oracle text proves the
    * traversal itself, not a shared implementation.
    *
    * Scale notes (100 TB): UnionLoop executes the step query per level —
    * O(depth) = O(log n) rounds of one equi-join each, the same envelope as
    * the doubling loop (more rounds, smaller per-round frontier). Output is
    * the per-depth census + per-depth sales rollup, |depth| rows.
    */
  val sqlRecursiveCte: Op = Op(
    "sql_recursive_cte",
    (s, d) => {
      // views via the memoized catalog registrar — hand-rolled
      // createOrReplaceTempView here would poison the shared views for a
      // later op in a multi-sf session (the memo would skip re-registering)
      GraftCatalog.registerAll(s, d)
      s.sql("WITH RECURSIVE chain(node, anc, steps) AS (" +
        "SELECT c_custkey, c_custkey, 0 FROM customer " +
        "UNION ALL SELECT c.node, c.anc div 8, c.steps + 1 FROM chain c WHERE c.anc > 0) " +
        // depth of a node = steps taken to reach the root = chain row count - 1
        "SELECT depth, COUNT(*) AS n_nodes, " +
        "CAST(SUM(sales) AS DOUBLE) AS level_sales FROM (" +
        "  SELECT ch.node, MAX(ch.steps) AS depth, MIN(co.s) AS sales FROM chain ch " +
        "  JOIN (SELECT c_custkey, COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), " +
        "        CAST(0 AS DECIMAL(12,2))) AS s " +
        "        FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY 1) co " +
        "  ON co.c_custkey = ch.node GROUP BY ch.node) " +
        "GROUP BY depth ORDER BY depth")
    },
    Some("WITH RECURSIVE chain(node, anc, steps) AS (" +
      "SELECT c_custkey, c_custkey, 0 FROM customer " +
      "UNION ALL SELECT c.node, c.anc // 8, c.steps + 1 FROM chain c WHERE c.anc > 0) " +
      "SELECT depth, COUNT(*) AS n_nodes, " +
      "CAST(SUM(sales) AS DOUBLE) AS level_sales FROM (" +
      "  SELECT ch.node, MAX(ch.steps) AS depth, MIN(co.s) AS sales FROM chain ch " +
      "  JOIN (SELECT c_custkey, COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), " +
      "        CAST(0 AS DECIMAL(12,2))) AS s " +
      "        FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY 1) co " +
      "  ON co.c_custkey = ch.node GROUP BY ch.node) " +
      "GROUP BY depth ORDER BY depth"))

  val all: Seq[Op] = Seq(dimHierarchyRollup, sqlRecursiveCte)
}
