package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Dets._

/** SURVEY.md §2 category F — time-series operators, the reference's core
  * domain (hourly energy rollups, sessions, outage gaps, counter deltas,
  * daily load profiles over SharedSolar-style circuit samples; here over the
  * `events` table per the testdata mapping in SURVEY §1.3).
  *
  * Scale notes (100 TB): all per-user windows shuffle once on user_id;
  * bucket aggregations are two-phase hash aggregates keyed on
  * (user, bucket) — bounded state, no global sort. The resample grid is
  * generated per user (never a driver-side loop) and the forward-fill is the
  * single-pass union+window formulation, not a per-gridpoint lookup join.
  */
object TimeSeriesOps {

  /** Hourly per-user rollup — the reference's hourly energy table. */
  val tsTumblingHourly: Op = Op(
    "ts_tumbling_hourly",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("h"), col("user_id"), col("cnt"), col("sum_value"))
        .orderBy("h", "user_id"),
    Some("SELECT date_trunc('hour', ts) AS h, user_id, COUNT(*) AS cnt, " +
      oSum("value") + " AS sum_value FROM events GROUP BY 1, 2 ORDER BY h, user_id"))

  /** 1h windows sliding every 30min — each event lands in exactly two
    * windows; oracle = union of the two offset 30-min bucketings. */
  val tsSlidingWindow: Op = Op(
    "ts_sliding_window",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("ws"), col("cnt"), col("sum_value"))
        .orderBy("ws"),
    Some("SELECT ws, COUNT(*) AS cnt, " + oSum("value") + " AS sum_value FROM " +
      "(SELECT time_bucket(INTERVAL 30 MINUTES, ts) AS ws, value FROM events " +
      "UNION ALL SELECT time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES AS ws, value FROM events) " +
      "GROUP BY ws ORDER BY ws"))

  /** Usage sessions with a 30-minute inactivity gap. Spark merges an event
    * into the current session iff gap <= 30min (boundary-inclusive — verified
    * by CoreOpsSpec's gap-equality fixture), so the oracle's gaps-and-islands
    * breaks only on gap > 30min; session_end = last ts + gap. */
  val tsSessionWindow: Op = Op(
    "ts_session_window",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("cnt"))
        .orderBy("user_id", "session_start"),
    Some("WITH x AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL OR " +
      "ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk " +
      "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
      "y AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM x) " +
      "SELECT user_id, MIN(ts) AS session_start, MAX(ts) + INTERVAL 30 MINUTE AS session_end, " +
      "COUNT(*) AS cnt FROM y GROUP BY user_id, sid ORDER BY user_id, session_start"))

  /** Outage/gap detection: per-user inter-sample gaps > 2 hours. */
  val tsGapDetection: Op = Op(
    "ts_gap_detection",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .where(col("prev_ts").isNotNull &&
               unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 2L * 3600 * 1000000)
        .select(col("user_id"), col("prev_ts").as("gap_start"), col("ts").as("gap_end"),
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))).as("gap_us"))
        .orderBy("user_id", "gap_start", "gap_end")
    },
    Some("SELECT user_id, gap_start, gap_end, epoch_us(gap_end) - epoch_us(gap_start) AS gap_us FROM " +
      "(SELECT user_id, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_start, ts AS gap_end " +
      "FROM events) WHERE gap_start IS NOT NULL AND gap_end - gap_start > INTERVAL 2 HOUR " +
      "ORDER BY user_id, gap_start, gap_end"))

  /** THE reference computation (SURVEY §7.4#6): treat the running decimal
    * sum of `value` per user as a lifetime Wh counter; per-hour energy =
    * counter delta with reset semantics (delta < 0 ⇒ counter restarted from
    * zero ⇒ energy = raw counter value). First bucket counts from zero. */
  /** Core of ts_counter_delta, exposed for unit fixtures (CounterDeltaSpec):
    * input (user_id, ts, counter) → per-hour (user_id, h, energy). Hourly
    * bucket end = max(counter); energy = delta to the previous bucket's end;
    * negative delta ⇒ the counter reset (gateway reboot) ⇒ energy = the raw
    * bucket-end value (counting from zero); first bucket counts from zero. */
  def counterDelta(withCounter: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val wLag = Window.partitionBy("user_id").orderBy("h")
    withCounter
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(max(col("counter")).as("c_end"))
      .withColumn("prev", lag(col("c_end"), 1).over(wLag))
      .withColumn("energy",
        when(col("prev").isNull, col("c_end"))
          .when(col("c_end") - col("prev") < 0, col("c_end"))
          .otherwise(col("c_end") - col("prev"))
          .cast("double"))
      .select("user_id", "h", "energy")
      .orderBy("user_id", "h")
  }

  val tsCounterDelta: Op = Op(
    "ts_counter_delta",
    (s, d) => {
      val wCum = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      counterDelta(
        Tables.events(s, d).withColumn("counter", sum(d2(col("value"))).over(wCum)))
    },
    Some("WITH c AS (SELECT user_id, ts, event_id, SUM(CAST(value AS DECIMAL(12,2))) OVER " +
      "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctr FROM events), " +
      "h AS (SELECT user_id, date_trunc('hour', ts) AS h, MAX(ctr) AS c_end FROM c GROUP BY 1, 2), " +
      "dlt AS (SELECT user_id, h, c_end, lag(c_end) OVER (PARTITION BY user_id ORDER BY h) AS prev FROM h) " +
      "SELECT user_id, h, CAST(CASE WHEN prev IS NULL THEN c_end WHEN c_end - prev < 0 THEN c_end " +
      "ELSE c_end - prev END AS DOUBLE) AS energy FROM dlt ORDER BY user_id, h"))

  /** The OTHER register semantic (SURVEY §1.1): `Watt Hours Today` — a
    * counter that resets BY SCHEDULE at midnight, on top of the reboot
    * resets `ts_counter_delta` already handles. The two reset kinds need
    * different detection: a day-boundary crossing is a scheduled reset
    * regardless of the delta's sign (a small prior day can make the
    * boundary delta POSITIVE — a lifetime-counter reader would book that
    * positive delta as energy and be wrong), while a negative delta within
    * a day is a reboot. Emits the discriminated reset kind alongside the
    * energy so downstream QA can count reboots without re-deriving them.
    *
    * Core exposed for the CoreOpsSpec fixture (reset-at-boundary edge with
    * a positive cross-day delta): input (user_id, ts, counter) → per-hour
    * (user_id, h, energy, reset_kind). Same bucketing conventions as
    * [[counterDelta]] (hourly c_end = max(counter), first bucket counts
    * from zero). */
  def counterDailyReset(withCounter: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val wLag = Window.partitionBy("user_id").orderBy("h")
    withCounter
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(max(col("counter")).as("c_end"))
      .withColumn("prev", lag(col("c_end"), 1).over(wLag))
      .withColumn("prev_h", lag(col("h"), 1).over(wLag))
      .withColumn("reset_kind",
        when(col("prev").isNull, "first")
          .when(to_date(col("prev_h")) =!= to_date(col("h")), "schedule")
          .when(col("c_end") - col("prev") < 0, "reboot")
          .otherwise("none"))
      .withColumn("energy",
        when(col("reset_kind") === "none", col("c_end") - col("prev"))
          .otherwise(col("c_end"))
          .cast("double"))
      .select("user_id", "h", "energy", "reset_kind")
      .orderBy("user_id", "h")
  }

  val tsCounterDailyReset: Op = Op(
    "ts_counter_daily_reset",
    (s, d) => {
      // synthesize the daily-reset register: cumulative per (user, day) in
      // event order — exactly what a `Wh Today` field holds
      val wCumDay = Window.partitionBy(col("user_id"), to_date(col("ts")))
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      counterDailyReset(
        Tables.events(s, d).withColumn("counter", sum(d2(col("value"))).over(wCumDay)))
    },
    Some("WITH c AS (SELECT user_id, ts, SUM(CAST(value AS DECIMAL(12,2))) OVER " +
      "(PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctr FROM events), " +
      "h AS (SELECT user_id, date_trunc('hour', ts) AS h, MAX(ctr) AS c_end FROM c GROUP BY 1, 2), " +
      "dlt AS (SELECT user_id, h, c_end, lag(c_end) OVER w AS prev, lag(h) OVER w AS prev_h " +
      "FROM h WINDOW w AS (PARTITION BY user_id ORDER BY h)), " +
      "k AS (SELECT user_id, h, c_end, prev, CASE WHEN prev IS NULL THEN 'first' " +
      "WHEN CAST(prev_h AS DATE) <> CAST(h AS DATE) THEN 'schedule' " +
      "WHEN c_end - prev < 0 THEN 'reboot' ELSE 'none' END AS reset_kind FROM dlt) " +
      "SELECT user_id, h, CAST(CASE WHEN reset_kind = 'none' THEN c_end - prev ELSE c_end END AS DOUBLE) AS energy, " +
      "reset_kind FROM k ORDER BY user_id, h"))

  /** Daily load profile — avg value by hour-of-day × event type, the
    * reference's signature output. */
  val tsDailyProfile: Op = Op(
    "ts_daily_profile",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(hour(col("ts")).as("hod"), col("event_type"))
        .agg(davg(col("value")).as("avg_value"), count(lit(1)).as("cnt"))
        .orderBy("hod", "event_type"),
    Some("SELECT CAST(extract(HOUR FROM ts) AS INT) AS hod, event_type, " +
      oAvg("value") + " AS avg_value, COUNT(*) AS cnt " +
      "FROM events GROUP BY 1, 2 ORDER BY hod, event_type"))

  /** Gap-aware resampling: per-user 1-hour grid (hour-truncated min..max ts),
    * forward-filled with the last observed value, but only if that value is
    * at most 3 hours old at the grid point — older ⇒ null (an outage stays
    * visible instead of being silently extrapolated).
    *
    * Single-pass formulation: union(events, grid) sorted per user; grid rows
    * pick up the last event value/ts via an ignore-nulls window (events sort
    * before grid points at the same instant via the src column).
    */
  val tsResampleFfill: Op = Op(
    "ts_resample_ffill",
    (s, d) => {
      val e = Tables.events(s, d)
      val grid = e.groupBy("user_id")
        .agg(date_trunc("hour", min(col("ts"))).as("mn"), date_trunc("hour", max(col("ts"))).as("mx"))
        .select(col("user_id"), explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 HOUR"))).as("g"))
      val evs = e.select(col("user_id"), col("ts"), col("value"), lit(0).as("src"),
        col("event_id"), lit(null).cast("timestamp").as("g"))
      val grd = grid.select(col("user_id"), col("g").as("ts"), lit(null).cast("double").as("value"),
        lit(1).as("src"), lit(null).cast("long").as("event_id"), col("g"))
      val w = Window.partitionBy("user_id").orderBy("ts", "src", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      evs.unionAll(grd)
        .withColumn("lv", last(when(col("src") === 0, col("value")), ignoreNulls = true).over(w))
        .withColumn("lt", last(when(col("src") === 0, col("ts")), ignoreNulls = true).over(w))
        .where(col("src") === 1)
        .select(col("user_id"), col("g"),
          when(col("lt").isNotNull &&
               unix_micros(col("g")) - unix_micros(col("lt")) <= 3L * 3600 * 1000000, col("lv")).as("v"))
        .orderBy("user_id", "g")
    },
    Some("WITH b AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS mn, date_trunc('hour', MAX(ts)) AS mx " +
      "FROM events GROUP BY 1), " +
      "grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS g FROM b), " +
      "u AS (SELECT user_id, ts, value, 0 AS src, event_id, NULL::TIMESTAMP AS g FROM events " +
      "UNION ALL SELECT user_id, g AS ts, NULL::DOUBLE AS value, 1 AS src, NULL::BIGINT AS event_id, g FROM grid), " +
      "f AS (SELECT user_id, g, src, " +
      "last_value(CASE WHEN src = 0 THEN value END IGNORE NULLS) OVER w AS lv, " +
      "last_value(CASE WHEN src = 0 THEN ts END IGNORE NULLS) OVER w AS lt " +
      "FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ts, src, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
      "SELECT user_id, g, CASE WHEN lt IS NOT NULL AND g - lt <= INTERVAL 3 HOUR THEN lv END AS v " +
      "FROM f WHERE src = 1 ORDER BY user_id, g"))

  /** Linear interpolation onto the same per-user hourly grid as
    * [[tsResampleFfill]] — the other standard gap-fill a meter pipeline
    * offers: each grid point takes the line between its bracketing
    * observations, but only when the bracket spans ≤ 6 hours (a longer gap is
    * an outage and stays null rather than being smoothly bridged).
    *
    * Same single-pass union(events, grid) formulation: one backward
    * ignore-nulls window picks the previous observation, one forward window
    * the next — two window passes over one user_id sort, no self-join. An
    * event at the grid instant sorts before the grid row (src column), so the
    * forward neighbor is strictly later and the bracket is never empty-width:
    * nt > g ≥ lt, no division by zero.
    *
    * Determinism: the interpolant is lv + (nv − lv) · Δ, with Δ one IEEE
    * division of exact microsecond integers — both engines evaluate the
    * identical operation sequence on identical doubles, so values hash-match
    * bit-for-bit (same argument as dedup_near_minhash's Jaccard). */
  /** The interpolation core over an (user_id, ts, value, event_id) frame —
    * exposed for CoreOpsSpec's hand-computed bracket fixture. */
  def interpolateLinear(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val grid = e.groupBy("user_id")
        .agg(date_trunc("hour", min(col("ts"))).as("mn"), date_trunc("hour", max(col("ts"))).as("mx"))
        .select(col("user_id"), explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 HOUR"))).as("g"))
      val evs = e.select(col("user_id"), col("ts"), col("value"), lit(0).as("src"),
        col("event_id"), lit(null).cast("timestamp").as("g"))
      val grd = grid.select(col("user_id"), col("g").as("ts"), lit(null).cast("double").as("value"),
        lit(1).as("src"), lit(null).cast("long").as("event_id"), col("g"))
      val wb = Window.partitionBy("user_id").orderBy("ts", "src", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("user_id").orderBy("ts", "src", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      evs.unionAll(grd)
        .withColumn("lv", last(when(col("src") === 0, col("value")), ignoreNulls = true).over(wb))
        .withColumn("lt", last(when(col("src") === 0, col("ts")), ignoreNulls = true).over(wb))
        .withColumn("nv", first(when(col("src") === 0, col("value")), ignoreNulls = true).over(wf))
        .withColumn("nt", first(when(col("src") === 0, col("ts")), ignoreNulls = true).over(wf))
        .where(col("src") === 1)
        .select(col("user_id"), col("g"),
          when(col("lt").isNotNull && col("nt").isNotNull &&
              unix_micros(col("nt")) - unix_micros(col("lt")) <= 6L * 3600 * 1000000,
            col("lv") + (col("nv") - col("lv")) *
              ((unix_micros(col("g")) - unix_micros(col("lt"))).cast("double") /
                (unix_micros(col("nt")) - unix_micros(col("lt"))).cast("double"))).as("v"))
        .orderBy("user_id", "g")
  }

  val tsInterpolateLinear: Op = Op(
    "ts_interpolate_linear",
    (s, d) => interpolateLinear(Tables.events(s, d)),
    Some("WITH b AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS mn, date_trunc('hour', MAX(ts)) AS mx " +
      "FROM events GROUP BY 1), " +
      "grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS g FROM b), " +
      "u AS (SELECT user_id, ts, value, 0 AS src, event_id, NULL::TIMESTAMP AS g FROM events " +
      "UNION ALL SELECT user_id, g AS ts, NULL::DOUBLE AS value, 1 AS src, NULL::BIGINT AS event_id, g FROM grid), " +
      "f AS (SELECT user_id, g, src, " +
      "last_value(CASE WHEN src = 0 THEN value END IGNORE NULLS) OVER wb AS lv, " +
      "last_value(CASE WHEN src = 0 THEN ts END IGNORE NULLS) OVER wb AS lt, " +
      "first_value(CASE WHEN src = 0 THEN value END IGNORE NULLS) OVER wf AS nv, " +
      "first_value(CASE WHEN src = 0 THEN ts END IGNORE NULLS) OVER wf AS nt " +
      "FROM u WINDOW wb AS (PARTITION BY user_id ORDER BY ts, src, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
      "wf AS (PARTITION BY user_id ORDER BY ts, src, event_id " +
      "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
      "SELECT user_id, g, CASE WHEN lt IS NOT NULL AND nt IS NOT NULL " +
      "AND epoch_us(nt) - epoch_us(lt) <= 21600000000 " +
      "THEN lv + (nv - lv) * (CAST(epoch_us(g) - epoch_us(lt) AS DOUBLE) / " +
      "CAST(epoch_us(nt) - epoch_us(lt) AS DOUBLE)) END AS v " +
      "FROM f WHERE src = 1 ORDER BY user_id, g"))

  /** Credit-event detection — the reference's derived fact (SURVEY §1.1):
    * given only a prepaid credit BALANCE series per account, recover the
    * events behind it — a jump up is a top-up (credit purchase), a drain is
    * consumption. The balance series is synthesized first (purchases add
    * credit, every other event draws it down, cumulative per user in event
    * order) and the detector then reads ONLY (user, ts, balance), exactly the
    * position a meter-register analyst is in.
    *
    * Determinism: the balance is an exact-decimal running sum (order-free
    * partials), the lag-diff compares identical decimals, and the emitted
    * amount is a final double cast — both engines agree bitwise. Detection is
    * one lag window per user; at 100 TB this is a single shuffle on user_id
    * with no state beyond the sort. */
  val creditEventDetect: Op = Op(
    "credit_event_detect",
    (s, d) => {
      val wCum = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wLag = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val signed = when(col("event_type") === "purchase", d2(col("value")))
        .otherwise(-d2(col("value")))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), signed.as("delta"))
        .withColumn("balance", sum(col("delta")).over(wCum))
        // from here on, only (user_id, ts, balance) are "observed"
        .withColumn("prev", lag(col("balance"), 1).over(wLag))
        .where(col("prev").isNotNull && col("balance") =!= col("prev"))
        .select(col("user_id"), col("ts"),
          when(col("balance") > col("prev"), lit("topup"))
            .otherwise(lit("consumption")).as("event_kind"),
          abs(col("balance") - col("prev")).cast("double").as("amount"))
        .orderBy("user_id", "ts", "event_kind", "amount")
    },
    Some("WITH b AS (SELECT user_id, ts, event_id, " +
      "SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2)) " +
      "ELSE -CAST(value AS DECIMAL(12,2)) END) OVER " +
      "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS balance " +
      "FROM events), " +
      "x AS (SELECT user_id, ts, balance, lag(balance) OVER " +
      "(PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM b) " +
      "SELECT user_id, ts, CASE WHEN balance > prev THEN 'topup' ELSE 'consumption' END AS event_kind, " +
      "CAST(abs(balance - prev) AS DOUBLE) AS amount " +
      "FROM x WHERE prev IS NOT NULL AND balance <> prev " +
      "ORDER BY user_id, ts, event_kind, amount"))

  /** The site/circuit dimensional surface (SURVEY §1.1): every circuit
    * (user_id) belongs to a site of ~20 circuits, and maps to a household
    * account (the customer dimension). The dimension is assembled once —
    * circuit → (site, account nation) — and BROADCAST onto the sample stream;
    * the rollup is then per (site, day): samples, circuits actually
    * reporting, distinct account nations, and site energy. At 100 TB the
    * fact side streams through one broadcast-hash-join stage plus a single
    * two-phase aggregate on (site, day) — the dimension is a few thousand
    * rows regardless of fact volume, which is exactly why it is a dimension. */
  val siteCircuitRollup: Op = Op(
    "site_circuit_rollup",
    (s, d) => {
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("circuit_id"),
          floor(col("c_custkey") / 20).cast("long").as("site_id"),
          col("c_nationkey").as("nation"))
      Tables.events(s, d)
        .join(broadcast(dim), col("user_id") === col("circuit_id"))
        .groupBy(col("site_id"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n_samples"),
          countDistinct(col("circuit_id")).as("circuits_reporting"),
          countDistinct(col("nation")).as("household_nations"),
          dsum(col("value")).as("site_energy"))
        .orderBy("site_id", "d")
    },
    Some("SELECT CAST(floor(c.c_custkey / 20) AS BIGINT) AS site_id, CAST(e.ts AS DATE) AS d, " +
      "COUNT(*) AS n_samples, COUNT(DISTINCT c.c_custkey) AS circuits_reporting, " +
      "COUNT(DISTINCT c.c_nationkey) AS household_nations, " + oSum("e.value") + " AS site_energy " +
      "FROM events e JOIN customer c ON c.c_custkey = e.user_id " +
      "GROUP BY 1, 2 ORDER BY site_id, d"))

  /** Monitoring-dashboard downsample: one representative point per
    * (series, 6-hour bucket), chosen by largest-triangle-one-bucket — the
    * point forming the largest triangle with its immediate neighbors (the
    * per-bucket-independent variant of LTTB, so it stays a pure window
    * computation with no sequential dependency between buckets). Area is the
    * cross-product magnitude |(px−nx)(y−py) − (px−x)(ny−py)| — identical
    * fixed-order IEEE arithmetic on both engines, so ranking on it is
    * deterministic; series endpoints (null neighbors) rank NULLS LAST with a
    * ts tie-break.
    *
    * Scale notes (100 TB): one shuffle on user_id for the neighbor window,
    * then a per-(user, bucket) row_number — no global sort, no driver
    * participation; the output is |buckets| rows, the 1000×-smaller relation
    * a dashboard actually plots. */
  val tsDownsampleLtob: Op = Op(
    "ts_downsample_ltob",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val neigh = Tables.events(s, d)
        .withColumn("x", col("ts").cast("double"))
        .withColumn("px", lag(col("ts").cast("double"), 1).over(w))
        .withColumn("py", lag(col("value"), 1).over(w))
        .withColumn("nx", lead(col("ts").cast("double"), 1).over(w))
        .withColumn("ny", lead(col("value"), 1).over(w))
        .withColumn("bucket", window(col("ts"), "6 hours").getField("start"))
        .withColumn("area", abs((col("px") - col("nx")) * (col("value") - col("py")) -
          (col("px") - col("x")) * (col("ny") - col("py"))))
      val pick = Window.partitionBy("user_id", "bucket")
        .orderBy(col("area").desc_nulls_last, col("ts"))
      neigh.withColumn("rn", row_number().over(pick))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("bucket"), col("ts"), col("value"))
        .orderBy("user_id", "bucket")
    },
    Some("WITH n AS (SELECT user_id, ts, event_id, value, epoch(ts) AS x, " +
      "time_bucket(INTERVAL 6 HOURS, ts) AS bucket, " +
      "lag(epoch(ts)) OVER w AS px, lag(value) OVER w AS py, " +
      "lead(epoch(ts)) OVER w AS nx, lead(value) OVER w AS ny FROM events " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
      "a AS (SELECT *, abs((px - nx)*(value - py) - (px - x)*(ny - py)) AS area FROM n), " +
      "r AS (SELECT *, row_number() OVER (PARTITION BY user_id, bucket " +
      "ORDER BY area DESC NULLS LAST, ts) AS rn FROM a) " +
      "SELECT user_id, bucket, ts, value FROM r WHERE rn = 1 ORDER BY user_id, bucket"))

  /** Robust sensor-outlier flagging: per event_type exact median and exact
    * MAD (median absolute deviation), flag readings with |v − med| >
    * 3.5·MAD. Both medians are computed RELATIONALLY — rank + pick the
    * middle one-or-two rows + single-addition average — never an engine
    * median builtin, whose interpolation formula differs between engines
    * (`lo + (hi−lo)·f` vs `(lo+hi)/2` are different IEEE expressions). The
    * middle-row average is one double addition and one division on both
    * sides, so `med`/`mad` are bit-identical and safe to emit.
    *
    * Scale notes (100 TB): exact median of a 100 TB column is a sort — here
    * it is a per-group window sort (one shuffle per median pass, group
    * cardinality × 2 rows collected by nobody); for hot single groups the
    * approx-percentile key is the estimator alternative. The two join-backs
    * broadcast a |event_type|-row relation. */
  val tsOutlierMad: Op = Op(
    "ts_outlier_mad",
    (s, d) => {
      val v = Tables.events(s, d).select(col("event_id"), col("event_type"), col("value"))
      def medianOf(df: org.apache.spark.sql.DataFrame, c: String, out: String) = {
        val w = Window.partitionBy("event_type").orderBy(col(c), col("event_id"))
        val cw = Window.partitionBy("event_type")
        df.withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(cw))
          .filter(col("rn") === floor((col("cnt") + 1) / 2) ||
            col("rn") === floor((col("cnt") + 2) / 2))
          .groupBy("event_type")
          .agg((sum(col(c)) / count(lit(1))).as(out))
      }
      val med = medianOf(v, "value", "med")
      val dev = v.join(broadcast(med), Seq("event_type"))
        .withColumn("dev", abs(col("value") - col("med")))
      val mad = medianOf(dev.select(col("event_id"), col("event_type"), col("dev")), "dev", "mad")
      dev.join(broadcast(mad), Seq("event_type"))
        .filter(col("dev") > lit(3.5) * col("mad"))
        .select(col("event_id"), col("event_type"), col("value"), col("med"), col("mad"))
        .orderBy("event_id")
    },
    Some("WITH v AS (SELECT event_id, event_type, value FROM events), " +
      "r AS (SELECT v.*, row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn, " +
      "COUNT(*) OVER (PARTITION BY event_type) AS cnt FROM v), " +
      "m AS (SELECT event_type, SUM(value)/COUNT(*) AS med FROM r " +
      "WHERE rn = floor((cnt+1)/2) OR rn = floor((cnt+2)/2) GROUP BY 1), " +
      "dv AS (SELECT v.event_id, v.event_type, v.value, m.med, abs(v.value - m.med) AS dev " +
      "FROM v JOIN m USING (event_type)), " +
      "r2 AS (SELECT dv.*, row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn, " +
      "COUNT(*) OVER (PARTITION BY event_type) AS cnt FROM dv), " +
      "mad AS (SELECT event_type, SUM(dev)/COUNT(*) AS mad FROM r2 " +
      "WHERE rn = floor((cnt+1)/2) OR rn = floor((cnt+2)/2) GROUP BY 1) " +
      "SELECT dv.event_id, dv.event_type, dv.value, dv.med, mad.mad " +
      "FROM dv JOIN mad USING (event_type) WHERE dv.dev > 3.5 * mad.mad ORDER BY dv.event_id"))

  /** Rolling z-score anomaly flagging — the streaming-adjacent per-sensor
    * monitor: each reading scored against the mean/stddev of its own
    * trailing 24-sample frame, |z| > 3 flagged. The frame sums follow the
    * exact-decimal policy ([[Dets]]): sum(v) and sum(v²) accumulate as
    * exact decimals (560² × 24 sits far inside (24,4)), so the window's
    * partial-order can't change them; mean/variance/z are then fixed-order
    * IEEE arithmetic on identical doubles — bit-equal across engines. The
    * strict `variance > 0` gate drops constant frames before the division
    * on both sides identically.
    *
    * Scale notes (100 TB): one shuffle on user_id; the rolling frame is
    * O(frame) state per row in the window operator, no self-join; output is
    * only the anomalies. */
  val tsZscoreRolling: Op = Op(
    "ts_zscore_rolling",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-23, Window.currentRow)
      Tables.events(s, d)
        .withColumn("s1", sum(d2(col("value"))).over(w).cast("double"))
        .withColumn("s2", sum(d2(col("value")) * d2(col("value"))).over(w).cast("double"))
        .withColumn("n", count(lit(1)).over(w).cast("double"))
        .withColumn("mean", col("s1") / col("n"))
        .withColumn("variance", (col("s2") - col("s1") * col("s1") / col("n")) / col("n"))
        .filter(col("variance") > 0)
        .withColumn("z", (col("value") - col("mean")) / sqrt(col("variance")))
        .filter(abs(col("z")) > 3)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"), col("mean"), col("z"))
        .orderBy("event_id")
    },
    Some("WITH r AS (SELECT event_id, user_id, ts, value, " +
      "CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS s1, " +
      "CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS s2, " +
      "CAST(COUNT(*) OVER w AS DOUBLE) AS n FROM events " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)), " +
      "v AS (SELECT *, s1/n AS mean, (s2 - s1*s1/n)/n AS variance FROM r) " +
      "SELECT event_id, user_id, ts, value, mean, (value - mean)/sqrt(variance) AS z " +
      "FROM v WHERE variance > 0 AND abs((value - mean)/sqrt(variance)) > 3 ORDER BY event_id"))

  /** Exponentially weighted moving average — THE recursive smoother every
    * monitoring stack runs, and normally impossible to hash-oracle because
    * e_t = α·x_t + (1−α)·e_{t−1} compounds float rounding differently under
    * any reassociation. Made bit-exact the same way PageRank was: the whole
    * recurrence runs in integer CENTS with integer division,
    * `e_t = (20·c_t + 80·e_{t−1}) div 100` (α = 0.20), seeded e_1 = c_1 over
    * each user's (ts, event_id)-ordered stream — a total order, so both
    * engines fold the identical sequence. Spark evaluates the fold as ONE
    * `aggregate()` higher-order function over each user's sorted event
    * array (per-user state is a single BIGINT — the same state size the
    * streaming `flatMapGroupsWithState` ops carry); the oracle replays the
    * recurrence as a row-by-row recursive CTE. Emits the final smoothed
    * value and sample count per user.
    *
    * Scale: one groupBy shuffle; per-user work linear in events, state O(1).
    * A per-user event list too big for one array is the signal to move the
    * fold into the streaming stateful op — same recurrence, same state. */
  val tsEwmaScaled: Op = Op(
    "ts_ewma_scaled",
    (s, d) => {
      Tables.events(s, d)
        .select(col("user_id"),
          struct(col("ts"), col("event_id"),
            (col("value").cast(Dets.D12_2) * 100).cast("bigint").as("c")).as("ev"))
        .groupBy("user_id")
        .agg(array_sort(collect_list(col("ev"))).as("evs"))
        .select(col("user_id"),
          size(col("evs")).as("n_samples"),
          aggregate(col("evs"), lit(Long.MinValue),
            (acc, x) => {
              // (20c + 80e) div 100 spelled exactly: strip the remainder
              // first so the double division is of an exact multiple of 100
              // (always representable, always exact) — no `div` Column op
              // exists inside a lambda
              val s = lit(20L) * x.getField("c") + lit(80L) * acc
              when(acc === Long.MinValue, x.getField("c"))
                .otherwise(((s - s % 100L) / 100L).cast("bigint"))
            }).as("ewma_cents"))
        .orderBy("user_id")
    },
    Some("WITH RECURSIVE s AS (SELECT user_id, " +
      "CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn, " +
      "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c FROM events), " +
      "r(user_id, rn, e) AS (SELECT user_id, rn, c FROM s WHERE rn = 1 " +
      "UNION ALL SELECT s.user_id, s.rn, (20 * s.c + 80 * r.e) // 100 " +
      "FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1), " +
      "f AS (SELECT user_id, MAX(rn) AS mx FROM r GROUP BY 1) " +
      "SELECT r.user_id AS user_id, CAST(f.mx AS INT) AS n_samples, r.e AS ewma_cents " +
      "FROM r JOIN f ON f.user_id = r.user_id AND r.rn = f.mx ORDER BY r.user_id"))

  /** One-sided CUSUM drift detection per user — the sequential
    * change-detection statistic (S_t = max(0, S_{t-1} + x_t − target))
    * monitoring stacks run beside the z-score/MAD outlier passes. The
    * recurrence is NOT window-expressible (each step clips at zero), so the
    * Spark side runs it as a stateful scan INSIDE the engine: per-user
    * events collect into a (ts, event_id, v)-sorted array and a single
    * higher-order `aggregate` folds the recurrence — the surface Spark
    * offers for exactly this shape (bounded per-key sequences; for
    * unbounded keys the same fold runs in
    * `flatMapGroupsWithState`, the J-family machinery). All-integer:
    * x_t = floor(value·10⁶) (one IEEE multiply + floor, the proven
    * engine-identical quantization), target = per-user floor-mean, so the
    * max-drift statistic hash-compares exactly against DuckDB's recursive
    * CTE marching the identical recurrence row by row.
    *
    * Scale notes (100 TB): one shuffle on user_id; per-user state is one
    * (s, mx) pair regardless of history length; collect_list is bounded by
    * per-key event counts (33 events/user here — for million-event keys,
    * switch to the stateful-streaming fold, same recurrence). */
  val tsCusumDrift: Op = Op(
    "ts_cusum_drift",
    (s, d) => {
      Tables.events(s, d)
        .select(col("user_id"),
          struct(unix_micros(col("ts")).as("us"), col("event_id").as("eid"),
            floor(col("value") * 1000000).cast("long").as("v")).as("x"))
        .groupBy("user_id")
        .agg(sort_array(collect_list(col("x"))).as("xs"),
          count(lit(1)).as("n"), sum(col("x.v")).as("sv"))
        .withColumn("target", expr("sv div n"))
        .select(col("user_id"), col("n"), col("target"),
          expr("aggregate(xs, named_struct('s', CAST(0 AS BIGINT), 'mx', CAST(0 AS BIGINT)), " +
            "(acc, x) -> named_struct(" +
            "'s', greatest(CAST(0 AS BIGINT), acc.s + x.v - target), " +
            "'mx', greatest(acc.mx, greatest(CAST(0 AS BIGINT), acc.s + x.v - target))), " +
            "acc -> acc.mx)").as("max_cusum"))
        .orderBy("user_id")
    },
    Some("WITH RECURSIVE x AS (SELECT user_id, event_id, " +
      "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn, " +
      "CAST(floor(value * 1000000) AS BIGINT) AS v FROM events), " +
      "t AS (SELECT user_id, COUNT(*) AS n, " +
      "CAST(SUM(v) AS BIGINT) // COUNT(*) AS target FROM x GROUP BY 1), " +
      "rec AS (SELECT x.user_id, x.rn, " +
      "GREATEST(CAST(0 AS BIGINT), x.v - t.target) AS s, " +
      "GREATEST(CAST(0 AS BIGINT), x.v - t.target) AS mx " +
      "FROM x JOIN t USING (user_id) WHERE x.rn = 1 " +
      "UNION ALL " +
      "SELECT r.user_id, x.rn, " +
      "GREATEST(CAST(0 AS BIGINT), r.s + x.v - t.target), " +
      "GREATEST(r.mx, GREATEST(CAST(0 AS BIGINT), r.s + x.v - t.target)) " +
      "FROM rec r JOIN x ON x.user_id = r.user_id AND x.rn = r.rn + 1 " +
      "JOIN t ON t.user_id = r.user_id) " +
      "SELECT t.user_id AS user_id, t.n, t.target, CAST(MAX(r.mx) AS BIGINT) AS max_cusum " +
      "FROM rec r JOIN t ON t.user_id = r.user_id " +
      "GROUP BY 1, 2, 3 ORDER BY 1"))

  /** Trailing-7-day DISTINCT actives per day (rolling DAU/WAU) — the
    * windowed-distinct shape ordinary window frames cannot express (distinct
    * doesn't compose with range frames): every event is fanned out to the 7
    * window-END days it contributes to (an explode over a generated date
    * sequence — pure map side), then ONE two-phase distinct aggregate per
    * window day; a semi-join on observed days keeps the output on the data's
    * own calendar (no phantom trailing windows). Exact and integer-only.
    *
    * Scale notes (100 TB): fan-out is a fixed ×7 of the scan — no pair
    * space, no per-day self-join (the naive spelling joins the event table
    * to itself once per window day); the distinct is the usual partial
    * aggregate. For wider windows at corpus scale the same shape drops the
    * exact distinct for [[AggOps.aggHllMergeable]]'s sketches — the fan-out
    * then carries 1 sketch-update per (event, window) instead of a row. */
  val tsSlidingDistinct: Op = Op(
    "ts_sliding_distinct",
    (s, d) => {
      val ev = Tables.events(s, d).select(to_date(col("ts")).as("d0"), col("user_id"))
      val days = ev.select(col("d0").as("wday")).distinct()
      ev.select(explode(expr("sequence(d0, date_add(d0, 6), interval 1 day)")).as("wday"),
          col("user_id"))
        .join(days, Seq("wday"), "left_semi")
        .groupBy("wday")
        .agg(countDistinct(col("user_id")).as("active_7d"))
        .orderBy("wday")
    },
    Some("WITH e AS (SELECT CAST(ts AS DATE) AS d0, user_id FROM events), " +
      "days AS (SELECT DISTINCT d0 AS wday FROM e), " +
      "x AS (SELECT CAST(g.w AS DATE) AS wday, user_id FROM e, " +
      "LATERAL (SELECT unnest(generate_series(CAST(d0 AS TIMESTAMP), " +
      "CAST(d0 AS TIMESTAMP) + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS w) g) " +
      "SELECT x.wday, COUNT(DISTINCT user_id) AS active_7d FROM x " +
      "JOIN days USING (wday) GROUP BY 1 ORDER BY 1"))

  /** Classical seasonal decomposition of the hourly series, per series key
    * (event_type here; site/circuit in the reference's domain):
    * trend = centered 25-hour moving average, seasonal = per-hour-of-day
    * mean of the detrended series, residual = the rest. Determinism: the
    * hourly level is an exact decimal-cents BIGINT; trend/seasonal/residual
    * are then FIXED single-spelling IEEE chains over exact integers — the
    * one float-accumulation hazard (summing detrended values across days)
    * is removed by flooring the detrended series to micro-units BIGINT
    * before the seasonal aggregate, so that sum is exact integer math.
    *
    * Scale notes (100 TB): everything is partitioned by the series key —
    * the rollup is a two-phase aggregate, both windows are
    * partition-locally sorted (no global window), and the hourly grid is
    * tiny relative to raw events (8 760 rows/series/year), so the windows
    * run over reduced data. Thousands of independent series parallelize
    * across the shuffle; a single series never needs more than one
    * partition. */
  val tsSeasonalDecompose: Op = Op(
    "ts_seasonal_decompose",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg((sum(d2(col("value"))) * 100).cast("long").as("y_e2"))
      val w25 = Window.partitionBy("event_type").orderBy("h").rowsBetween(-12, 12)
      val wSeas = Window.partitionBy(col("event_type"), hour(col("h")))
      val t = hourly
        .withColumn("y", col("y_e2").cast("double") / 100)
        .withColumn("trend",
          sum(col("y_e2")).over(w25).cast("double") / count(lit(1)).over(w25) / 100)
        .withColumn("det_e6", floor((col("y") - col("trend")) * 1000000).cast("long"))
      t.withColumn("seasonal",
          sum(col("det_e6")).over(wSeas).cast("double") / count(lit(1)).over(wSeas) / 1000000.0)
        .select(col("event_type"), col("h"), col("y"), col("trend"), col("seasonal"),
          (col("y") - col("trend") - col("seasonal")).as("resid"))
        .orderBy("event_type", "h")
    },
    Some("WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h, " +
      "CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS y_e2 " +
      "FROM events GROUP BY 1, 2), " +
      "tr AS (SELECT event_type, h, CAST(y_e2 AS DOUBLE) / 100 AS y, " +
      "CAST(SUM(y_e2) OVER w25 AS DOUBLE) / (COUNT(*) OVER w25) / 100 AS trend " +
      "FROM hourly WINDOW w25 AS (PARTITION BY event_type ORDER BY h " +
      "ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)), " +
      "dt AS (SELECT event_type, h, y, trend, " +
      "CAST(floor((y - trend) * 1000000) AS BIGINT) AS det_e6 FROM tr), " +
      "se AS (SELECT event_type, h, y, trend, " +
      "CAST(SUM(det_e6) OVER ws AS DOUBLE) / (COUNT(*) OVER ws) / 1000000.0 AS seasonal " +
      "FROM dt WINDOW ws AS (PARTITION BY event_type, EXTRACT(hour FROM h))) " +
      "SELECT event_type, h, y, trend, seasonal, y - trend - seasonal AS resid " +
      "FROM se ORDER BY event_type, h"))

  /** Peak detection on the hourly series, per series key: an hour is a peak
    * iff it strictly exceeds its left neighbour, at-least-ties its right
    * neighbour (so a flat-topped peak reports its FIRST hour, not twice),
    * and clears a 25% exceedance floor over the trailing 24-hour mean —
    * the load-spike / generation-peak detector of the reference's domain.
    * All three conditions are EXACT integer comparisons on the decimal-cents
    * level (the floor is 4·y·count ≥ 5·Σy — no division anywhere), so the
    * hash oracle is exact.
    *
    * Scale notes (100 TB): runs on the hourly rollup (8 760 rows/series/
    * year), one window partitioned by the series key — same reduced-data
    * shape as [[tsSeasonalDecompose]]. */
  val tsPeakDetect: Op = Op(
    "ts_peak_detect",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg((sum(d2(col("value"))) * 100).cast("long").as("y_e2"))
      val w = Window.partitionBy("event_type").orderBy("h")
      val wTrail = w.rowsBetween(-24, -1)
      hourly
        .withColumn("prev", lag(col("y_e2"), 1).over(w))
        .withColumn("next", lead(col("y_e2"), 1).over(w))
        .withColumn("s24", sum(col("y_e2")).over(wTrail))
        .withColumn("c24", count(lit(1)).over(wTrail))
        .where(col("prev").isNotNull && col("next").isNotNull && col("c24") === 24 &&
          col("y_e2") > col("prev") && col("y_e2") >= col("next") &&
          col("y_e2") * 4 * col("c24") >= col("s24") * 5)
        .select(col("event_type"), col("h"),
          (col("y_e2").cast("double") / 100).as("y"),
          (col("s24").cast("double") / col("c24") / 100).as("trailing_mean"))
        .orderBy("event_type", "h")
    },
    Some("WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h, " +
      "CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS y_e2 " +
      "FROM events GROUP BY 1, 2), " +
      "k AS (SELECT event_type, h, y_e2, " +
      "lag(y_e2) OVER w AS prev, lead(y_e2) OVER w AS next, " +
      "CAST(SUM(y_e2) OVER wt AS BIGINT) AS s24, CAST(COUNT(*) OVER wt AS BIGINT) AS c24 " +
      "FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY h), " +
      "wt AS (PARTITION BY event_type ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)) " +
      "SELECT event_type, h, CAST(y_e2 AS DOUBLE) / 100 AS y, " +
      "CAST(s24 AS DOUBLE) / c24 / 100 AS trailing_mean FROM k " +
      "WHERE prev IS NOT NULL AND next IS NOT NULL AND c24 = 24 " +
      "AND y_e2 > prev AND y_e2 >= next AND y_e2 * 4 * c24 >= s24 * 5 " +
      "ORDER BY event_type, h"))

  /** Lag-k autocorrelation of the hourly series, per series key, for
    * k ∈ {1, 24} (hour-over-hour persistence and daily seasonality — the
    * two lags an energy-domain monitor actually inspects). Follows the
    * [[StatsOps.statsCorrExact]] mergeable-moments contract: pairs
    * (y_t, y_{t+k}) from ONE lead() over the hourly rollup; the emitted
    * per-(series, lag) row carries n and the three integer-exact
    * correlation numerators (n·Σxy − Σx·Σy etc.) as DECIMAL(38,0)-rendered
    * VARCHAR (wide-decimal/NULL-decimal stay out of the hash surface), plus
    * Pearson r as the ONE fixed IEEE spelling num / sqrt(vx · vy).
    *
    * Scale notes (100 TB): runs on the hourly rollup (8 760 rows/series/
    * year, a two-phase exact-cents aggregate of raw events), one
    * partition-local lead() per lag, then a map-side-combinable groupBy —
    * the moment sums are mergeable across shards/days exactly like the
    * stats-catalog components. */
  val tsAutocorrLag: Op = Op(
    "ts_autocorr_lag",
    (s, d) => {
      val dec = "decimal(38,0)"
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg((sum(d2(col("value"))) * 100).cast("long").as("y_e2"))
      val w = Window.partitionBy("event_type").orderBy("h")
      Seq(1, 24).map { k =>
        hourly
          .withColumn("y2", lead(col("y_e2"), k).over(w))
          .where(col("y2").isNotNull)
          .select(col("event_type"), col("y_e2").cast(dec).as("x"), col("y2").cast(dec).as("y"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("event_type"), lit(k).as("lag"), col("n"),
            (col("n").cast(dec) * col("sxy") - col("sx") * col("sy"))
              .cast(dec).cast("string").as("cov_num"),
            (col("n").cast(dec) * col("sxx") - col("sx") * col("sx"))
              .cast(dec).cast("string").as("var_x_num"),
            (col("n").cast(dec) * col("syy") - col("sy") * col("sy"))
              .cast(dec).cast("string").as("var_y_num"),
            ((col("n").cast(dec) * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt((col("n").cast(dec) * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("n").cast(dec) * col("syy") - col("sy") * col("sy")).cast("double")))
              .as("r"))
      }.reduce(_.unionAll(_))
        .orderBy("event_type", "lag")
    },
    Some(Seq(1, 24).map { k =>
      "SELECT event_type, " + k + " AS lag, COUNT(*) AS n, " +
        "CAST(CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DECIMAL(38,0)) AS VARCHAR) AS cov_num, " +
        "CAST(CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DECIMAL(38,0)) AS VARCHAR) AS var_x_num, " +
        "CAST(CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS DECIMAL(38,0)) AS VARCHAR) AS var_y_num, " +
        "CAST(CAST(CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) / " +
        "sqrt(CAST(CAST(CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) * " +
        "CAST(CAST(CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)) AS r " +
        "FROM (SELECT event_type, CAST(y_e2 AS DECIMAL(38,0)) AS x, " +
        "CAST(lead(y_e2, " + k + ") OVER (PARTITION BY event_type ORDER BY h) AS DECIMAL(38,0)) AS y " +
        "FROM (SELECT event_type, date_trunc('hour', ts) AS h, " +
        "CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS y_e2 " +
        "FROM events GROUP BY 1, 2)) WHERE y IS NOT NULL GROUP BY event_type"
    }.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY event_type, lag")))

  /** Exact trailing 7-hour rolling MEDIAN of the hourly series — the
    * robust smoother a telemetry monitor prefers over the moving average
    * (one outlier hour cannot drag it). Only complete windows are scored
    * (first 6 hours of a series are warm-up). Exactness: the 7 window
    * values are exact cents BIGINTs; the median of 7 is the 4th order
    * statistic — Spark materializes the window as sort_array(collect_list)
    * and indexes it, DuckDB's quantile_disc(0.5) over the same ROWS frame
    * picks the identical element; no interpolation, no floats anywhere.
    *
    * Scale notes (100 TB): runs on the hourly rollup (reduced data), one
    * partition-local window per series key; the collected window is a
    * constant 7 elements, so memory per row is O(1) and the sort is on a
    * 7-array — not a per-partition sort of raw data. */
  val tsRollingMedian: Op = Op(
    "ts_rolling_median",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg((sum(d2(col("value"))) * 100).cast("long").as("y_e2"))
      val w7 = Window.partitionBy("event_type").orderBy("h").rowsBetween(-6, 0)
      hourly
        .withColumn("win", collect_list(col("y_e2")).over(w7))
        .where(size(col("win")) === 7)
        .select(col("event_type"), col("h"), col("y_e2"),
          element_at(sort_array(col("win")), 4).as("med_e2"))
        .orderBy("event_type", "h")
    },
    Some("WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h, " +
      "CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS y_e2 " +
      "FROM events GROUP BY 1, 2), " +
      "k AS (SELECT event_type, h, y_e2, " +
      "CAST(quantile_disc(y_e2, 0.5) OVER w7 AS BIGINT) AS med_e2, " +
      "COUNT(*) OVER w7 AS c FROM hourly WINDOW w7 AS " +
      "(PARTITION BY event_type ORDER BY h ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) " +
      "SELECT event_type, h, y_e2, med_e2 FROM k WHERE c = 7 " +
      "ORDER BY event_type, h"))

  /** Calendar-spine generation — the date dimension every warehouse joins
    * facts against: one row per day spanning the order history
    * (sequence() + explode, no driver loop), carrying day-of-week, month,
    * quarter, and month-end flags, LEFT-joined to the daily order rollup so
    * zero-activity days surface explicitly (n_orders = 0) — the gap-visible
    * spine [[tsResampleFfill]]-style jobs densify against. Day-of-week is
    * pinned to the Sunday=0 convention on both engines (Spark dayofweek is
    * Sunday=1 → minus 1; DuckDB dow is already Sunday=0).
    *
    * Scale notes (100 TB): the spine is bounded by calendar time (≤ a few
    * thousand rows for decades), generated in one task and broadcast to the
    * daily rollup join; the rollup itself is the usual two-phase count.
    * Date-dimension attributes are pure per-row expressions — codegen'd,
    * no shuffle beyond the rollup's own. */
  val tsCalendarSpine: Op = Op(
    "ts_calendar_spine",
    (s, d) => {
      val b = Tables.orders(s, d)
        .agg(to_date(min(col("o_orderdate"))).as("mn"), to_date(max(col("o_orderdate"))).as("mx"))
      val spine = b.select(explode(expr("sequence(mn, mx, interval 1 day)")).as("day"))
        .select(col("day"),
          (dayofweek(col("day")) - 1).as("dow"),
          month(col("day")).as("m"),
          quarter(col("day")).as("q"),
          (col("day") === last_day(col("day"))).as("is_month_end"))
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n_orders"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"), col("dow"), col("m"), col("q"), col("is_month_end"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy("day")
    },
    Some("WITH b AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS mn, " +
      "CAST(MAX(o_orderdate) AS DATE) AS mx FROM orders), " +
      "spine AS (SELECT CAST(g.d AS DATE) AS day FROM b, " +
      "LATERAL (SELECT unnest(generate_series(CAST(mn AS TIMESTAMP), " +
      "CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS d) g), " +
      "daily AS (SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders " +
      "FROM orders GROUP BY 1) " +
      "SELECT s.day, CAST(EXTRACT(dow FROM s.day) AS INTEGER) AS dow, " +
      "CAST(EXTRACT(month FROM s.day) AS INTEGER) AS m, " +
      "CAST(EXTRACT(quarter FROM s.day) AS INTEGER) AS q, " +
      "s.day = last_day(s.day) AS is_month_end, " +
      "COALESCE(d.n_orders, 0) AS n_orders " +
      "FROM spine s LEFT JOIN daily d ON s.day = d.day ORDER BY s.day"))

  /** STL-style anomaly detection — [[tsSeasonalDecompose]]'s residual run
    * through a robust MAD gate: an hour is anomalous when its residual
    * (what trend AND daily seasonality cannot explain) deviates from the
    * series' median residual by more than 3× the median absolute
    * deviation. This catches the spike the raw-value monitors miss (a
    * normal-looking value at an hour where the seasonal pattern predicted
    * much less) and ignores the daily peak that z-score-on-raw flags every
    * day. Exactness: residuals are floored to micro-units BIGINT; both
    * medians use the DOUBLED-median trick (odd count → 2·middle, even →
    * lo+hi — still integers), so the flag predicate 2·dev2 > 3·mad4
    * (= |resid − med| > 3·MAD at the doubled scales) is pure integer
    * comparison — no float ever decides membership.
    *
    * Scale notes (100 TB): same reduced hourly-rollup shape as the
    * decompose op; the two median passes are per-series window ranks (the
    * [[tsOutlierMad]] pattern) and the |series|-row median tables broadcast
    * back. */
  val tsAnomalyStl: Op = Op(
    "ts_anomaly_stl",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg((sum(d2(col("value"))) * 100).cast("long").as("y_e2"))
      val w25 = Window.partitionBy("event_type").orderBy("h").rowsBetween(-12, 12)
      val wSeas = Window.partitionBy(col("event_type"), hour(col("h")))
      val t = hourly
        .withColumn("y", col("y_e2").cast("double") / 100)
        .withColumn("trend",
          sum(col("y_e2")).over(w25).cast("double") / count(lit(1)).over(w25) / 100)
        .withColumn("det_e6", floor((col("y") - col("trend")) * 1000000).cast("long"))
        .withColumn("seasonal",
          sum(col("det_e6")).over(wSeas).cast("double") / count(lit(1)).over(wSeas) / 1000000.0)
        .withColumn("resid_e6",
          floor((col("y") - col("trend") - col("seasonal")) * 1000000).cast("long"))
      def dmed(df: org.apache.spark.sql.DataFrame, c: String, out: String) = {
        val w = Window.partitionBy("event_type").orderBy(col(c), col("h"))
        val cw = Window.partitionBy("event_type")
        df.withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(cw))
          .filter(col("rn") === floor((col("cnt") + 1) / 2) ||
            col("rn") === floor((col("cnt") + 2) / 2))
          .groupBy("event_type")
          .agg((sum(col(c)) * (lit(3) - count(lit(1)))).as(out))
      }
      val med = dmed(t.select("event_type", "h", "resid_e6"), "resid_e6", "med2")
      val dev = t.join(broadcast(med), "event_type")
        .withColumn("dev2", abs(col("resid_e6") * 2 - col("med2")))
      val mad = dmed(dev.select("event_type", "h", "dev2"), "dev2", "mad4")
      dev.join(broadcast(mad), "event_type")
        .where(col("dev2") * 2 > col("mad4") * 3)
        .select(col("event_type"), col("h"), col("y"), col("resid_e6"),
          col("dev2"), col("med2"), col("mad4"))
        .orderBy("event_type", "h")
    },
    Some("WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h, " +
      "CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS y_e2 " +
      "FROM events GROUP BY 1, 2), " +
      "tr AS (SELECT event_type, h, CAST(y_e2 AS DOUBLE) / 100 AS y, " +
      "CAST(SUM(y_e2) OVER w25 AS DOUBLE) / (COUNT(*) OVER w25) / 100 AS trend " +
      "FROM hourly WINDOW w25 AS (PARTITION BY event_type ORDER BY h " +
      "ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)), " +
      "dt AS (SELECT event_type, h, y, trend, " +
      "CAST(floor((y - trend) * 1000000) AS BIGINT) AS det_e6 FROM tr), " +
      "se AS (SELECT event_type, h, y, trend, " +
      "CAST(SUM(det_e6) OVER ws AS DOUBLE) / (COUNT(*) OVER ws) / 1000000.0 AS seasonal " +
      "FROM dt WINDOW ws AS (PARTITION BY event_type, EXTRACT(hour FROM h))), " +
      "rz AS (SELECT event_type, h, y, " +
      "CAST(floor((y - trend - seasonal) * 1000000) AS BIGINT) AS resid_e6 FROM se), " +
      "r1 AS (SELECT rz.*, row_number() OVER (PARTITION BY event_type " +
      "ORDER BY resid_e6, h) AS rn, COUNT(*) OVER (PARTITION BY event_type) AS cnt FROM rz), " +
      "m AS (SELECT event_type, CAST(SUM(resid_e6) * (3 - COUNT(*)) AS BIGINT) AS med2 " +
      "FROM r1 WHERE rn = floor((cnt+1)/2) OR rn = floor((cnt+2)/2) GROUP BY 1), " +
      "dv AS (SELECT rz.event_type, rz.h, rz.y, rz.resid_e6, m.med2, " +
      "abs(rz.resid_e6 * 2 - m.med2) AS dev2 FROM rz JOIN m USING (event_type)), " +
      "r2 AS (SELECT dv.*, row_number() OVER (PARTITION BY event_type " +
      "ORDER BY dev2, h) AS rn, COUNT(*) OVER (PARTITION BY event_type) AS cnt FROM dv), " +
      "mad AS (SELECT event_type, CAST(SUM(dev2) * (3 - COUNT(*)) AS BIGINT) AS mad4 " +
      "FROM r2 WHERE rn = floor((cnt+1)/2) OR rn = floor((cnt+2)/2) GROUP BY 1) " +
      "SELECT dv.event_type, dv.h, dv.y, dv.resid_e6, dv.dev2, dv.med2, mad.mad4 " +
      "FROM dv JOIN mad USING (event_type) WHERE dv.dev2 * 2 > mad.mad4 * 3 " +
      "ORDER BY dv.event_type, dv.h"))

  /** Load-duration curve — the power-engineering standard view of a load
    * series: hourly loads per series key sorted DESCENDING with each row's
    * exceedance fraction (what share of hours are at least this loaded).
    * Capacity planning reads "the top 5 % of hours carry X" straight off
    * it. Ranks are integers; the exceedance fraction is ONE IEEE division
    * rank/n over exact integers. Ties broken by hour for a total order.
    *
    * Scale notes (100 TB): runs on the hourly rollup (reduced data, the
    * exact-cents two-phase aggregate); the per-series sort is the window's
    * partition sort — no global sort across series. */
  val tsLoadDurationCurve: Op = Op(
    "ts_load_duration_curve",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg((sum(d2(col("value"))) * 100).cast("long").as("y_e2"))
      val w = Window.partitionBy("event_type").orderBy(col("y_e2").desc, col("h").asc)
      val cw = Window.partitionBy("event_type")
      hourly
        .withColumn("rank", row_number().over(w))
        .withColumn("n_hours", count(lit(1)).over(cw))
        .select(col("event_type"), col("rank"), col("h"), col("y_e2"), col("n_hours"),
          (col("rank").cast("double") / col("n_hours")).as("exceed_frac"))
        .orderBy("event_type", "rank")
    },
    Some("WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h, " +
      "CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS y_e2 " +
      "FROM events GROUP BY 1, 2), " +
      "r AS (SELECT event_type, h, y_e2, " +
      "CAST(row_number() OVER (PARTITION BY event_type ORDER BY y_e2 DESC, h ASC) AS INT) AS rank, " +
      "CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_hours FROM hourly) " +
      "SELECT event_type, rank, h, y_e2, n_hours, " +
      "CAST(rank AS DOUBLE) / n_hours AS exceed_frac " +
      "FROM r ORDER BY event_type, rank"))

  /** Seasonal-naive forecast BACKTEST — the baseline every load-forecasting
    * effort must beat, and the honest way to report it: ŷ(t) = y(t − 1 day)
    * and y(t − 7 days), scored against actuals per series as n / Σ|err| /
    * MAE. The lag is a CALENDAR self-join on (series, h − interval) — not
    * a row-offset lag(), which silently mis-forecasts across gaps in the
    * hourly grid (a row-lag of 24 is "24 observed hours ago", not
    * "yesterday", the moment an hour is missing). Errors are exact cents;
    * MAE is one IEEE chain.
    *
    * Scale notes (100 TB): two co-partitionable equi-joins of the hourly
    * rollup with itself (same key, same exchange reusable), then a tiny
    * per-series aggregate. */
  val tsForecastSnaiveBacktest: Op = Op(
    "ts_forecast_snaive_backtest",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg((sum(d2(col("value"))) * 100).cast("long").as("y_e2"))
      def backtest(days: Int, label: String) =
        hourly.as("a").join(hourly.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("b.h") === col("a.h") - expr(s"INTERVAL $days DAYS"))
          .groupBy(col("a.event_type").as("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(abs(col("a.y_e2") - col("b.y_e2"))).as("sae_e2"))
          .select(col("event_type"), lit(label).as("horizon"), col("n"), col("sae_e2"),
            (col("sae_e2").cast("double") / col("n") / 100.0).as("mae"))
      backtest(1, "snaive_1d").unionAll(backtest(7, "snaive_7d"))
        .orderBy("event_type", "horizon")
    },
    Some("WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h, " +
      "CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS y_e2 " +
      "FROM events GROUP BY 1, 2), " +
      "bt AS (SELECT a.event_type, 'snaive_1d' AS horizon, " +
      "CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(abs(a.y_e2 - b.y_e2)) AS BIGINT) AS sae_e2 " +
      "FROM hourly a JOIN hourly b ON a.event_type = b.event_type " +
      "AND b.h = a.h - INTERVAL 1 DAY GROUP BY 1 " +
      "UNION ALL SELECT a.event_type, 'snaive_7d', " +
      "CAST(COUNT(*) AS BIGINT), CAST(SUM(abs(a.y_e2 - b.y_e2)) AS BIGINT) " +
      "FROM hourly a JOIN hourly b ON a.event_type = b.event_type " +
      "AND b.h = a.h - INTERVAL 7 DAY GROUP BY 1) " +
      "SELECT event_type, horizon, n, sae_e2, " +
      "CAST(sae_e2 AS DOUBLE) / n / 100.0 AS mae FROM bt " +
      "ORDER BY event_type, horizon"))

  /** Uptime / SLA report — what [[tsGapDetection]]'s raw gap list rolls up
    * to for an availability dashboard: per device (user), the observed
    * span, the number of outages (gaps over the same 2-hour heartbeat
    * threshold), total downtime, and the availability fraction. Span and
    * downtime are exact epoch-micro integers; the percentage is ONE IEEE
    * division. Devices with a single observation report a zero span and
    * are pinned to 'no_span' status rather than dividing by zero.
    *
    * Scale notes (100 TB): one shuffle on the device key, one window pass
    * (lag) feeding a two-phase aggregate; output ∝ devices. */
  val tsUptimeSla: Op = Op(
    "ts_uptime_sla",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapUs = unix_micros(col("ts")) - unix_micros(col("prev_ts"))
      val thresholdUs = 2L * 3600 * 1000000
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .groupBy("user_id")
        .agg(
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("span_us"),
          sum(when(col("prev_ts").isNotNull && gapUs > thresholdUs, 1L).otherwise(0L))
            .as("n_outages"),
          sum(when(col("prev_ts").isNotNull && gapUs > thresholdUs, gapUs).otherwise(0L))
            .as("downtime_us"))
        .select(col("user_id"), col("span_us"), col("n_outages"), col("downtime_us"),
          when(col("span_us") === 0, "no_span").otherwise("measured").as("status"),
          when(col("span_us") === 0, lit(0.0))
            .otherwise((col("span_us") - col("downtime_us")).cast("double") / col("span_us"))
            .as("uptime_frac"))
        .orderBy("user_id")
    },
    Some("WITH l AS (SELECT user_id, epoch_us(ts) AS us, " +
      "epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS prev_us " +
      "FROM events), " +
      "a AS (SELECT user_id, MAX(us) - MIN(us) AS span_us, " +
      "CAST(SUM(CASE WHEN prev_us IS NOT NULL AND us - prev_us > 7200000000 " +
      "THEN 1 ELSE 0 END) AS BIGINT) AS n_outages, " +
      "CAST(SUM(CASE WHEN prev_us IS NOT NULL AND us - prev_us > 7200000000 " +
      "THEN us - prev_us ELSE 0 END) AS BIGINT) AS downtime_us FROM l GROUP BY 1) " +
      "SELECT user_id, span_us, n_outages, downtime_us, " +
      "CASE WHEN span_us = 0 THEN 'no_span' ELSE 'measured' END AS status, " +
      "CASE WHEN span_us = 0 THEN 0.0 " +
      "ELSE CAST(span_us - downtime_us AS DOUBLE) / span_us END AS uptime_frac " +
      "FROM a ORDER BY user_id"))

  /** Per-device degradation slope — the PV-health question ("is this
    * panel's daily output trending down, and how fast?") as a per-group
    * OLS fit: x = epoch day (exact integer), y = daily energy in exact
    * cents, slope = (nΣxy − ΣxΣy)/(nΣxx − ΣxΣx) in cents/day. The
    * DECLINING verdict comes from the SIGN of the integer covariance
    * numerator — an exact comparison, never a float threshold — and
    * one-day devices are pinned to 'short_history' instead of dividing by
    * a zero variance. The slope itself is the one IEEE division, per the
    * mergeable-moments contract ([[StatsOps.statsCorrExact]]).
    *
    * Scale notes (100 TB): the daily rollup reduces events to
    * device × days; the moment sums are one map-side-combinable groupBy
    * over that reduction; output is one row per device. */
  val tsDegradationSlope: Op = Op(
    "ts_degradation_slope",
    (s, d) => {
      val dec = "decimal(38,0)"
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg((sum(d2(col("value"))) * 100).cast("long").as("y_e2"))
      val m = daily
        .select(col("user_id"),
          datediff(col("day"), lit("1970-01-01").cast("date")).cast("long").cast(dec).as("x"),
          col("y_e2").cast(dec).as("y"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      val cov = (col("n_days").cast(dec) * col("sxy") - col("sx") * col("sy")).cast(dec)
      val vx = (col("n_days").cast(dec) * col("sxx") - col("sx") * col("sx")).cast(dec)
      m.select(col("user_id"), col("n_days"),
          when(col("n_days") < 2, "short_history").otherwise("fitted").as("status"),
          (col("n_days") >= 2 && cov < 0).as("declining"),
          when(col("n_days") >= 2, cov.cast("double") / vx.cast("double"))
            .otherwise(0.0).as("slope_cents_per_day"))
        .orderBy("user_id")
    },
    Some("WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, " +
      "CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS y_e2 " +
      "FROM events GROUP BY 1, 2), " +
      "m AS (SELECT user_id, COUNT(*) AS n_days, " +
      "CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DECIMAL(38,0)) AS cov, " +
      "CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DECIMAL(38,0)) AS vx " +
      "FROM (SELECT user_id, CAST(CAST(day - DATE '1970-01-01' AS BIGINT) " +
      "AS DECIMAL(38,0)) AS x, CAST(y_e2 AS DECIMAL(38,0)) AS y FROM daily) " +
      "GROUP BY user_id) " +
      "SELECT user_id, n_days, " +
      "CASE WHEN n_days < 2 THEN 'short_history' ELSE 'fitted' END AS status, " +
      "(n_days >= 2 AND cov < 0) AS declining, " +
      "CASE WHEN n_days >= 2 THEN CAST(CAST(cov AS VARCHAR) AS DOUBLE) / CAST(CAST(vx AS VARCHAR) AS DOUBLE) " +
      "ELSE 0.0 END AS slope_cents_per_day " +
      "FROM m ORDER BY user_id"))

  /** Week-over-week feed comparison — the dashboard number every ops review
    * opens with: per (event_type, day), today's event count against the
    * SAME WEEKDAY one week earlier, as an absolute delta and an exact
    * parts-per-million ratio (integer division — no float reaches the
    * hash). Spelled as a self-join of the daily rollup on day−7 rather
    * than a lag-7 window: a missing day yields an honest NULL prior
    * (status `no_prior`), where a ROWS-frame lag would silently compare
    * against whatever day happened to be 7 OBSERVED rows back — the same
    * calendar-vs-observed trap `dq_volume_anomaly` fixed this round.
    *
    * Scale notes (100 TB): the rollup is a two-phase count onto
    * (feed, day) — tiny; both self-join branches are the SAME aggregate
    * subplan shaped for exchange reuse ([[PlanSurfaceOps.planReuseExchange]]
    * documents the canonicalization rules), so the shuffle materializes
    * once. The monitor reads the rollup, never the raw events. */
  val tsWeekOverWeek: Op = Op(
    "ts_week_over_week",
    (s, d) => {
      def daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      daily.as("a")
        .join(daily.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("a.day") === date_add(col("b.day"), 7), "full_outer")
        .select(
          coalesce(col("a.event_type"), col("b.event_type")).as("event_type"),
          coalesce(col("a.day"), date_add(col("b.day"), 7)).as("day"),
          col("a.n").as("n"), col("b.n").as("prior_n"),
          (coalesce(col("a.n"), lit(0L)) - coalesce(col("b.n"), lit(0L))).as("delta"),
          when(col("a.n").isNotNull && col("b.n").isNotNull,
            expr("(a.n * 1000000) div b.n")).as("ratio_ppm"),
          when(col("a.n").isNull, "gone")
            .when(col("b.n").isNull, "no_prior").otherwise("compared").as("status"))
        .orderBy("event_type", "day")
    },
    Some("WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, " +
      "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2) " +
      "SELECT COALESCE(a.event_type, b.event_type) AS event_type, " +
      "COALESCE(a.day, b.day + 7) AS day, a.n AS n, b.n AS prior_n, " +
      "COALESCE(a.n, 0) - COALESCE(b.n, 0) AS delta, " +
      "CASE WHEN a.n IS NOT NULL AND b.n IS NOT NULL " +
      "THEN (a.n * 1000000) // b.n END AS ratio_ppm, " +
      "CASE WHEN a.n IS NULL THEN 'gone' WHEN b.n IS NULL THEN 'no_prior' " +
      "ELSE 'compared' END AS status " +
      "FROM daily a FULL OUTER JOIN daily b " +
      "ON a.event_type = b.event_type AND a.day = b.day + 7 " +
      "ORDER BY event_type, day"))

  /** RAMP-RATE alarm — the grid-operations check a solar/feed warehouse
    * runs on every aggregate series: hour-over-hour change of the hourly
    * total, flagged when |ramp| exceeds the threshold (here 50 currency
    * units = 5 000 exact cents). The prior hour comes from a CALENDAR
    * self-join on hour − 1 (the dq_volume_anomaly / ts_week_over_week
    * discipline): a gap in the feed yields an honest `no_prior` row, never
    * a silent comparison against whatever hour happened to precede it in
    * row order. All arithmetic is exact integer cents.
    *
    * Scale notes (100 TB): the hourly rollup is a two-phase aggregate onto
    * (feed, hour) — tiny; both self-join branches are the same aggregate
    * subplan (exchange-reuse shape). The alarm reads the rollup, never the
    * raw events. */
  val tsRampRateAlarm: Op = Op(
    "ts_ramp_rate_alarm",
    (s, d) => {
      def hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(sum((Dets.d2(col("value")) * 100).cast("long")).as("cents"))
      hourly.as("a")
        .join(hourly.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("a.hr") === col("b.hr") + expr("INTERVAL 1 HOUR"), "left")
        .select(col("a.event_type").as("event_type"), col("a.hr").as("hr"),
          col("a.cents").as("cents"), col("b.cents").as("prev_cents"),
          (col("a.cents") - col("b.cents")).as("ramp_cents"),
          when(col("b.cents").isNull, "no_prior")
            .when(abs(col("a.cents") - col("b.cents")) > 5000L, "alarm")
            .otherwise("ok").as("status"))
        .orderBy("event_type", "hr")
    },
    Some("WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hr, " +
      "CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) " +
      "AS cents FROM events GROUP BY 1, 2) " +
      "SELECT a.event_type, a.hr, a.cents, b.cents AS prev_cents, " +
      "a.cents - b.cents AS ramp_cents, " +
      "CASE WHEN b.cents IS NULL THEN 'no_prior' " +
      "WHEN abs(a.cents - b.cents) > 5000 THEN 'alarm' ELSE 'ok' END AS status " +
      "FROM hourly a LEFT JOIN hourly b " +
      "ON a.event_type = b.event_type AND a.hr = b.hr + INTERVAL 1 HOUR " +
      "ORDER BY a.event_type, a.hr"))

  /** TIME-WEIGHTED AVERAGE — the canonical statistic for irregularly
    * sampled meter readings (the reference's data arrives on kiosk upload
    * schedules, not a clock): a plain AVG over-weights chatty intervals;
    * the TWA weights each reading by how long it was the standing value
    * (until the next sample, within the same user-day). All mass math is
    * exact integers — value cents × duration micros summed as
    * DECIMAL(38,0) (order-free), emitted as an exact VARCHAR beside ONE
    * IEEE division for the human-readable column, with the wide-decimal →
    * double conversion routed through VARCHAR per the round-11 rounding
    * rule (DuckDB's decimal128→double is 1 ulp off past 2^53).
    *
    * Scale notes (100 TB): one shuffle on (user, day) covers both the
    * lead() segmentation and the aggregate; output ∝ user-days. */
  val tsTimeWeightedAvg: Op = Op(
    "ts_time_weighted_avg",
    (s, d) => {
      val w = Window.partitionBy("user_id", "day").orderBy("us", "event_id")
      val seg = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          unix_micros(col("ts")).as("us"), col("event_id"),
          (Dets.d2(col("value")) * 100).cast("long").as("cents"))
        .withColumn("next_us", lead(col("us"), 1).over(w))
        .where(col("next_us").isNotNull)
      seg.groupBy("user_id", "day")
        .agg(count(lit(1)).as("n_segments"),
          sum(col("next_us") - col("us")).as("span_us"),
          sum((col("cents") * (col("next_us") - col("us"))).cast("decimal(38,0)"))
            .as("mass"))
        .select(col("user_id"), col("day"), col("n_segments"), col("span_us"),
          col("mass").cast("string").as("mass_e2us"),
          (col("mass").cast("string").cast("double") / col("span_us")).as("twa_cents"))
        .orderBy("user_id", "day")
    },
    Some("WITH s AS (SELECT user_id, CAST(ts AS DATE) AS day, epoch_us(ts) AS us, " +
      "event_id, CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents " +
      "FROM events), " +
      "seg AS (SELECT user_id, day, us, cents, " +
      "lead(us) OVER (PARTITION BY user_id, day ORDER BY us, event_id) AS next_us " +
      "FROM s) " +
      "SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n_segments, " +
      "CAST(SUM(next_us - us) AS BIGINT) AS span_us, " +
      "CAST(CAST(SUM(CAST(cents * (next_us - us) AS DECIMAL(38,0))) " +
      "AS DECIMAL(38,0)) AS VARCHAR) AS mass_e2us, " +
      "CAST(CAST(CAST(SUM(CAST(cents * (next_us - us) AS DECIMAL(38,0))) " +
      "AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) / CAST(SUM(next_us - us) AS BIGINT) " +
      "AS twa_cents " +
      "FROM seg WHERE next_us IS NOT NULL " +
      "GROUP BY 1, 2 ORDER BY user_id, day"))

  val all: Seq[Op] = Seq(tsTumblingHourly, tsSlidingWindow, tsSessionWindow, tsGapDetection,
    tsCounterDelta, tsCounterDailyReset, tsDailyProfile, tsResampleFfill, tsInterpolateLinear,
    creditEventDetect, siteCircuitRollup, tsDownsampleLtob, tsOutlierMad, tsZscoreRolling,
    tsEwmaScaled, tsCusumDrift, tsSlidingDistinct, tsSeasonalDecompose, tsPeakDetect,
    tsAutocorrLag, tsRollingMedian, tsCalendarSpine, tsAnomalyStl, tsLoadDurationCurve,
    tsForecastSnaiveBacktest, tsUptimeSla, tsDegradationSlope, tsWeekOverWeek,
    tsRampRateAlarm, tsTimeWeightedAvg)
}
