package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.functions._
import Dets._

/** Explicit hot-key skew mitigation — the manual counterpart to the AQE
  * skew-join split proven in SkewJoinSpec. AQE can only rebalance a skewed
  * SHUFFLE after observing it; these two operators restructure the plan so
  * the hot key never concentrates on one reducer in the first place, which is
  * the shape a 100 TB pipeline hard-codes for keys it KNOWS are pathological
  * (the one user producing half the events, the one event_type carrying most
  * of the firehose).
  *
  * Both are result-transparent: the salted plan provably computes the exact
  * same relation as the naive plan, so the DuckDB oracle is simply the
  * unsalted query.
  *
  * Scale notes (100 TB):
  *  - `join_skew_salted` replicates the DIM side SALTS times (bounded: dims
  *    are small by definition) and splits each fact key's rows across SALTS
  *    reducers via a salt derived from a per-row column — reducer input for
  *    the hottest key drops by SALTS×, at the cost of a SALTS× larger (still
  *    tiny) dim shuffle. The salt is DETERMINISTIC (pmod of event_id), never
  *    rand(): retried tasks must re-derive identical salts or a retry
  *    produces a different (wrong) partitioning of the same rows.
  *  - `agg_distinct_salted` makes exact COUNT(DISTINCT) scale under hot
  *    group keys: the distinct sets are partitioned by a salt derived from
  *    the DISTINCT column itself, so per-(key,salt) partial distinct counts
  *    are over DISJOINT value sets and the final per-key sum is exact — the
  *    reduce state for the hot key shrinks from |all its distinct values| on
  *    one task to 1/SALTS of it per task.
  */
object SkewOps {

  private val JoinSalts = 8
  private val AggSalts = 16

  /** Salted fact⋈dim equi-join: events (fact, skewed on user_id in the
    * wild) ⋈ customer (dim). The merge hint forces the shuffle path — a
    * broadcast would sidestep the very skew this operator exists to handle,
    * and at warehouse scale the dim may exceed driver memory anyway.
    * SkewOpsSpec proves (a) result ≡ the unsalted join, (b) the join keys
    * include the salt, and (c) the hot key's rows really do spread across
    * all SALTS salt values. */
  val joinSkewSalted: Op = Op(
    "join_skew_salted",
    (s, d) => {
      val e = Tables.events(s, d)
        .withColumn("salt", pmod(col("event_id"), lit(JoinSalts)).cast("int"))
      val c = Tables.customer(s, d)
        .withColumn("salt", explode(sequence(lit(0), lit(JoinSalts - 1))))
        .hint("merge")
      e.join(c, e("user_id") === c("c_custkey") && e("salt") === c("salt"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        .orderBy("c_mktsegment")
    },
    Some("SELECT c_mktsegment, COUNT(*) AS cnt, " + oSum("value") + " AS sum_value " +
      "FROM events e JOIN customer c ON c.c_custkey = e.user_id " +
      "GROUP BY 1 ORDER BY c_mktsegment"))

  /** Two-phase exact distinct under a hot group key: phase 1 counts
    * distinct user_ids per (event_type, pmod(user_id, SALTS)) — disjoint
    * slices of each type's user set — and phase 2 sums the partials. The
    * event count rides along the same two phases (sum of partial counts). */
  val aggDistinctSalted: Op = Op(
    "agg_distinct_salted",
    (s, d) => {
      val e = Tables.events(s, d)
        .withColumn("salt", pmod(col("user_id"), lit(AggSalts)).cast("int"))
      e.groupBy(col("event_type"), col("salt"))
        .agg(countDistinct(col("user_id")).as("part_uniq"), count(lit(1)).as("part_cnt"))
        .groupBy(col("event_type"))
        .agg(sum(col("part_uniq")).as("uniq_users"), sum(col("part_cnt")).as("cnt"))
        .orderBy("event_type")
    },
    Some("SELECT event_type, COUNT(DISTINCT user_id) AS uniq_users, COUNT(*) AS cnt " +
      "FROM events GROUP BY 1 ORDER BY event_type"))

  val all: Seq[Op] = Seq(joinSkewSalted, aggDistinctSalted)
}
