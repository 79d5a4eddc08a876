package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Dets._

/** SURVEY.md §2 category E — window functions.
  *
  * Scale notes (100 TB): every window here partitions by a real key
  * (customer/user/nation), so the physical plan is one hash exchange on the
  * partition key + per-partition sort — no global sort, no driver funnel.
  * The two global windows (`window_range_frame`, `window_ntile_pct`) are
  * single-partition by construction; at warehouse scale those would be
  * replaced by a range-partitioned two-pass (documented on the ops) — kept
  * here because the *semantics* (RANGE frame, ntile) are the contract.
  * Tie-breaks: every ordering includes a unique id (§7.2 rule 4).
  */
object WindowOps {

  val windowTopkPerGroup: Op = Op(
    "window_topk_per_group",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },
    Some("SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (SELECT o_custkey, o_orderkey, o_totalprice, " +
      "CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn " +
      "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"))

  /** rank/dense_rank ordered by value only (ties produce equal ranks — the
    * point of the op); output rows totally ordered by the unique custkey. */
  val windowRankDense: Op = Op(
    "window_rank_dense",
    (s, d) => {
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc)
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
        .orderBy("c_nationkey", "c_custkey")
    },
    Some("SELECT c_nationkey, c_custkey, c_acctbal, " +
      "CAST(rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INT) AS rnk, " +
      "CAST(dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INT) AS drnk " +
      "FROM customer ORDER BY c_nationkey, c_custkey"))

  /** Δt to previous event + next event type per user. Time delta emitted in
    * microseconds as a long (timestamp subtraction yields engine-specific
    * interval types otherwise). */
  val windowLagLead: Op = Op(
    "window_lag_lead",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("delta_us"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy("event_id")
    },
    Some("SELECT event_id, user_id, ts, " +
      "epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_us, " +
      "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type " +
      "FROM events ORDER BY event_id"))

  /** 7-day moving average of daily revenue — ROWS frame over the daily
    * rollup (one row per date, so the frame is well-defined). */
  val windowMovingAvg: Op = Op(
    "window_moving_avg",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(d2(col("o_totalprice"))).as("rev_dec"))
      val w = Window.orderBy("day").rowsBetween(-6, 0)
      daily
        .select(col("day"), col("rev_dec").cast("double").as("rev"),
          (sum(col("rev_dec")).over(w).cast("double") / count(lit(1)).over(w)).as("ma7"))
        .orderBy("day")
    },
    Some("SELECT day, CAST(rev_dec AS DOUBLE) AS rev, " +
      "CAST(SUM(rev_dec) OVER w AS DOUBLE) / COUNT(*) OVER w AS ma7 " +
      "FROM (SELECT CAST(o_orderdate AS DATE) AS day, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec " +
      "FROM orders GROUP BY 1) " +
      "WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) ORDER BY day"))

  /** RANGE frame on an integer order key: revenue within ±1 of p_size.
    * Deterministic without a tie-break — the frame depends only on the
    * p_size value. Global window; scale path = pre-aggregate by p_size
    * then range-join, noted per §7.5. */
  val windowRangeFrame: Op = Op(
    "window_range_frame",
    (s, d) => {
      val w = Window.orderBy("p_size").rangeBetween(-1, 1)
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_size"),
          sum(d2(col("p_retailprice"))).over(w).cast("double").as("band_rev"))
        .orderBy("p_partkey")
    },
    Some("SELECT p_partkey, p_size, CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) OVER " +
      "(ORDER BY p_size RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS band_rev " +
      "FROM part ORDER BY p_partkey"))

  val windowNtilePct: Op = Op(
    "window_ntile_pct",
    (s, d) => {
      val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("c_custkey")
    },
    Some("SELECT c_custkey, c_acctbal, " +
      "CAST(ntile(4) OVER w AS INT) AS quartile, percent_rank() OVER w AS pr, cume_dist() OVER w AS cd " +
      "FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey) ORDER BY c_custkey"))

  /** First/last event type per (user, day) — full frame for last (§7.2);
    * one row per group via distinct after the windows. */
  val windowFirstLast: Op = Op(
    "window_first_last",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"), col("day")).orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .withColumn("day", to_date(col("ts")))
        .select(col("user_id"), col("day"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(w).as("last_type"))
        .distinct()
        .orderBy("user_id", "day")
    },
    Some("SELECT DISTINCT user_id, day, " +
      "first_value(event_type) OVER w AS first_type, last_value(event_type) OVER w AS last_type " +
      "FROM (SELECT *, CAST(ts AS DATE) AS day FROM events) " +
      "WINDOW w AS (PARTITION BY user_id, day ORDER BY ts, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) ORDER BY user_id, day"))

  /** Running decimal total per user — the prefix form of the counter-delta
    * computation in category F. */
  val windowCumsum: Op = Op(
    "window_cumsum",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          sum(d2(col("value"))).over(w).cast("double").as("cum_value"))
        .orderBy("event_id")
    },
    Some("SELECT event_id, user_id, ts, " +
      "CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_value " +
      "FROM events ORDER BY event_id"))

  /** Longest consecutive-day activity streak per user — the classic
    * gaps-and-islands shape the window family was missing: distinct active
    * days, island key = day-number − row_number (constant exactly along a
    * run of consecutive days), island length by groupBy, max per user. All
    * integer (day arithmetic against a fixed epoch), so the oracle compares
    * exact; both engines read the NTZ timestamps as the same naive dates
    * under the pinned UTC session.
    *
    * Scale notes (100 TB): distinct → window → two groupBys, all keyed on
    * user_id (one shuffle, reused across every stage — the island groupBy
    * includes user_id in its key, so AQE plans no second exchange). */
  val windowStreakLongest: Op = Op(
    "window_streak_longest",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("day")
      Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .withColumn("grp",
          datediff(col("day"), lit("2024-01-01")) - row_number().over(w))
        .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(max("len").as("longest_streak"), sum("len").as("n_active_days"))
        .orderBy("user_id")
    },
    Some("WITH dd AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), " +
      "g AS (SELECT user_id, day, (day - DATE '2024-01-01') - " +
      "row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp FROM dd), " +
      "st AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2) " +
      "SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak, " +
      "CAST(SUM(len) AS BIGINT) AS n_active_days FROM st GROUP BY 1 ORDER BY user_id"))

  /** RATIO_TO_REPORT — each (mktsegment, orderpriority) cell's share of its
    * segment's revenue and of the grand total, the percent-of-parent column
    * every BI rollup carries. Shares are computed on exact cents BIGINTs
    * (the cell, segment, and grand sums are associative integer aggregates);
    * the two ratios are each ONE IEEE division over those exact integers.
    *
    * Scale notes (100 TB): the base rollup is a two-phase aggregate onto
    * the (segment, priority) grid — tiny; both report windows
    * (per-segment, global) then run over the grid, not raw rows, so the
    * unpartitioned total-window is bounded by the grid's cardinality. */
  val windowRatioToReport: Op = Op(
    "window_ratio_to_report",
    (s, d) => {
      val cells = Tables.orders(s, d).join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
        .agg(sum((col("o_totalprice").cast(D12_2) * 100).cast("bigint")).as("cents"))
      val wSeg = Window.partitionBy("seg")
      val wAll = Window.partitionBy()
      cells
        .withColumn("seg_cents", sum(col("cents")).over(wSeg))
        .withColumn("all_cents", sum(col("cents")).over(wAll))
        .select(col("seg"), col("pri"), col("cents"),
          (col("cents").cast("double") / col("seg_cents")).as("share_of_segment"),
          (col("cents").cast("double") / col("all_cents")).as("share_of_total"))
        .orderBy("seg", "pri")
    },
    Some("WITH cells AS (SELECT c_mktsegment AS seg, o_orderpriority AS pri, " +
      "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents " +
      "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2) " +
      "SELECT seg, pri, cents, " +
      "CAST(cents AS DOUBLE) / CAST(SUM(cents) OVER (PARTITION BY seg) AS BIGINT) AS share_of_segment, " +
      "CAST(cents AS DOUBLE) / CAST(SUM(cents) OVER () AS BIGINT) AS share_of_total " +
      "FROM cells ORDER BY seg, pri"))

  /** INTERVAL range frame over EVENT TIME (round 13): per user, count + exact
    * cents sum of the trailing ONE HOUR ending at each event — `RANGE BETWEEN
    * INTERVAL ... PRECEDING` ordered by a timestamp, the time-window-per-row
    * spelling warehouse queries use constantly and `window_range_frame`'s
    * integer frame cannot express. RANGE (not ROWS) means equal-ts peers are
    * all in frame on both engines, so ties cannot flip the value; the sum is
    * exact BIGINT cents. One shuffle on user_id, one sort — the standard
    * window envelope at any width. */
  val windowRangeInterval: Op = Op(
    "window_range_interval",
    (s, d) => {
      GraftCatalog.registerAll(s, d)
      s.sql("SELECT user_id, event_id, ts, " +
        "COUNT(*) OVER w AS trail_cnt, " +
        "CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) OVER w AS BIGINT) AS trail_cents " +
        "FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts " +
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) " +
        "ORDER BY user_id, event_id")
    },
    Some("SELECT user_id, event_id, ts, " +
      "COUNT(*) OVER w AS trail_cnt, " +
      "CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) OVER w AS BIGINT) AS trail_cents " +
      "FROM events " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts " +
      "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) " +
      "ORDER BY user_id, event_id"))

  val all: Seq[Op] = Seq(windowTopkPerGroup, windowRankDense, windowLagLead, windowMovingAvg,
    windowRangeFrame, windowNtilePct, windowFirstLast, windowCumsum, windowStreakLongest,
    windowRatioToReport, windowRangeInterval)
}
