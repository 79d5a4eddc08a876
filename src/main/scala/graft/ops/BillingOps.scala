package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Dets._

/** Metering/billing operators over the event stream — the revenue side of
  * an energy warehouse (the reference's domain is prepaid community solar:
  * consumption metering, credit top-ups, tariffs, cutoffs). The event
  * taxonomy maps as in [[TimeSeriesOps.creditEventDetect]]: 'purchase'
  * events are credit top-ups, every other event consumes.
  *
  * Determinism: all money math is exact integer cents (or cent-products)
  * end to end; the single double in each output is one IEEE division for
  * the human-readable column.
  *
  * Scale notes (100 TB): both ops are one-shuffle shapes — a (user, month)
  * two-phase aggregate and a per-user window — with output proportional to
  * users, never events.
  */
object BillingOps {

  /** Time-of-use tariff billing: each consumption event is charged at its
    * hour's band rate — peak 17–21h at 18 (rate·100), shoulder 7–17 and
    * 21–23 at 12, off-peak 23–7 at 7 — and bills aggregate to
    * (user, month) with a per-band breakdown. charge_e4 = cents × rate_e2
    * is an exact integer (scale 10⁻⁴ currency units); the conditional
    * band sums are the FILTER-clause shape ([[FuncOps]]' agg_filter_clause)
    * so ONE scan produces all four measures map-side-partially.
    *
    * Scale notes (100 TB): band assignment is a codegen'd CASE on
    * hour(ts) — scan-local; the only shuffle carries (user, month) partial
    * sums. Rate-table changes ship as a broadcast dim join instead of the
    * CASE without changing the shape. */
  val billingTimeOfUse: Op = Op(
    "billing_time_of_use",
    (s, d) => {
      val hr = hour(col("ts"))
      val rate = when(hr >= 17 && hr < 21, 18L)
        .when((hr >= 7 && hr < 17) || (hr >= 21 && hr < 23), 12L)
        .otherwise(7L)
      val charge = (d2(col("value")) * 100).cast("long") * rate
      Tables.events(s, d)
        .where(col("event_type") =!= "purchase")
        .select(col("user_id"), date_trunc("month", col("ts")).as("month"),
          rate.as("rate_e2"), charge.as("charge_e4"))
        .groupBy("user_id", "month")
        .agg(
          sum(when(col("rate_e2") === 7L, col("charge_e4")).otherwise(0L)).as("offpeak_e4"),
          sum(when(col("rate_e2") === 12L, col("charge_e4")).otherwise(0L)).as("shoulder_e4"),
          sum(when(col("rate_e2") === 18L, col("charge_e4")).otherwise(0L)).as("peak_e4"),
          sum(col("charge_e4")).as("total_e4"))
        .withColumn("total", col("total_e4").cast("double") / 10000.0)
        .orderBy("user_id", "month")
    },
    Some("WITH c AS (SELECT user_id, date_trunc('month', ts) AS month, " +
      "CASE WHEN EXTRACT(hour FROM ts) >= 17 AND EXTRACT(hour FROM ts) < 21 THEN 18 " +
      "WHEN (EXTRACT(hour FROM ts) >= 7 AND EXTRACT(hour FROM ts) < 17) " +
      "OR (EXTRACT(hour FROM ts) >= 21 AND EXTRACT(hour FROM ts) < 23) THEN 12 " +
      "ELSE 7 END AS rate_e2, " +
      "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents " +
      "FROM events WHERE event_type <> 'purchase') " +
      "SELECT user_id, month, " +
      "CAST(SUM(CASE WHEN rate_e2 = 7 THEN cents * rate_e2 ELSE 0 END) AS BIGINT) AS offpeak_e4, " +
      "CAST(SUM(CASE WHEN rate_e2 = 12 THEN cents * rate_e2 ELSE 0 END) AS BIGINT) AS shoulder_e4, " +
      "CAST(SUM(CASE WHEN rate_e2 = 18 THEN cents * rate_e2 ELSE 0 END) AS BIGINT) AS peak_e4, " +
      "CAST(SUM(cents * rate_e2) AS BIGINT) AS total_e4, " +
      "CAST(SUM(cents * rate_e2) AS DOUBLE) / 10000.0 AS total " +
      "FROM c GROUP BY 1, 2 ORDER BY 1, 2"))

  /** Prepaid balance tracking — the reference domain's core mechanic: each
    * user's running credit balance (top-ups +, consumption −) in exact
    * cents, summarized to the account-health row a cutoff scheduler reads:
    * number of below-zero EPISODES (a strictly-positive→negative crossing
    * starts one), total microseconds spent below zero (event-to-next-event
    * spans while negative; the open-ended last span is excluded on both
    * engines), and the worst balance reached. Everything through the
    * output is integer arithmetic on cents and epoch-micros.
    *
    * Scale notes (100 TB): ONE shuffle on user_id feeding one window pass
    * (running sum + lag + lead share the same sort); the output is one row
    * per user. The running balance is exactly the mergeable-state shape a
    * streaming version keeps per key ([[StreamingOps]]' stateful family). */
  val billingPrepaidBalance: Op = Op(
    "billing_prepaid_balance",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // a top-up credits 5 units per currency unit purchased (the prepaid
      // multiplier) — also what makes balances genuinely oscillate around
      // zero in this taxonomy instead of draining monotonically
      val signed = when(col("event_type") === "purchase",
          lit(5L) * (d2(col("value")) * 100).cast("long"))
        .otherwise(-(d2(col("value")) * 100).cast("long"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), signed.as("delta_e2"))
        .withColumn("bal_e2", sum(col("delta_e2")).over(wCum))
        .withColumn("prev_bal", lag(col("bal_e2"), 1).over(w))
        .withColumn("next_us",
          lead(unix_micros(col("ts")), 1).over(w))
        .groupBy("user_id")
        .agg(
          sum(when(col("bal_e2") < 0 && (col("prev_bal").isNull || col("prev_bal") >= 0), 1L)
            .otherwise(0L)).as("n_cutoffs"),
          sum(when(col("bal_e2") < 0 && col("next_us").isNotNull,
            col("next_us") - unix_micros(col("ts"))).otherwise(0L)).as("below_zero_us"),
          min(col("bal_e2")).as("min_bal_e2"),
          // the final balance IS the total of the deltas — associative,
          // never "last row wins"
          sum(col("delta_e2")).as("final_bal_e2"))
        .orderBy("user_id")
    },
    Some("WITH s AS (SELECT user_id, ts, event_id, " +
      "CASE WHEN event_type = 'purchase' " +
      "THEN 5 * CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) " +
      "ELSE -CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) END AS delta_e2, " +
      "epoch_us(ts) AS us FROM events), " +
      "b AS (SELECT user_id, ts, event_id, delta_e2, us, " +
      "SUM(delta_e2) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal_e2 FROM s), " +
      "b2 AS (SELECT *, lag(bal_e2, 1) OVER w AS prev_bal, " +
      "lead(us, 1) OVER w AS next_us FROM b " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
      "SELECT user_id, " +
      "CAST(SUM(CASE WHEN bal_e2 < 0 AND (prev_bal IS NULL OR prev_bal >= 0) " +
      "THEN 1 ELSE 0 END) AS BIGINT) AS n_cutoffs, " +
      "CAST(SUM(CASE WHEN bal_e2 < 0 AND next_us IS NOT NULL " +
      "THEN next_us - us ELSE 0 END) AS BIGINT) AS below_zero_us, " +
      "CAST(MIN(bal_e2) AS BIGINT) AS min_bal_e2, " +
      "CAST(SUM(delta_e2) AS BIGINT) AS final_bal_e2 " +
      "FROM b2 GROUP BY user_id ORDER BY user_id"))

  /** Weekly account statement — the customer-facing reconciliation view:
    * per (user, week) the opening balance, credits (top-ups at the 5×
    * prepaid multiplier), charges, and closing balance, with the
    * accounting identity closing(w) = opening(w) + credits − charges =
    * opening(next w) holding EXACTLY because everything is integer cents
    * and the opening is a window cumsum over the same weekly deltas
    * (weeks are ISO Monday-start on both engines). This is the artifact
    * that proves the ledger and the statement can never disagree — they
    * are the same integer stream.
    *
    * Scale notes (100 TB): one two-phase aggregate onto (user, week), one
    * per-user window over the weekly grid (weeks/user rows, not events);
    * output ∝ users × weeks. */
  val billingWeeklyStatement: Op = Op(
    "billing_weekly_statement",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("week")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cents = (d2(col("value")) * 100).cast("long")
      Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("week"),
          when(col("event_type") === "purchase", lit(5L) * cents).otherwise(0L).as("credit"),
          when(col("event_type") =!= "purchase", cents).otherwise(0L).as("charge"))
        .groupBy("user_id", "week")
        .agg(sum(col("credit")).as("credits_e2"), sum(col("charge")).as("charges_e2"))
        .withColumn("opening_e2",
          coalesce(sum(col("credits_e2") - col("charges_e2")).over(w), lit(0L)))
        .select(col("user_id"), col("week"), col("opening_e2"),
          col("credits_e2"), col("charges_e2"),
          (col("opening_e2") + col("credits_e2") - col("charges_e2")).as("closing_e2"))
        .orderBy("user_id", "week")
    },
    Some("WITH wk AS (SELECT user_id, date_trunc('week', ts) AS week, " +
      "CAST(SUM(CASE WHEN event_type = 'purchase' " +
      "THEN 5 * CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS credits_e2, " +
      "CAST(SUM(CASE WHEN event_type <> 'purchase' " +
      "THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS charges_e2 " +
      "FROM events GROUP BY 1, 2) " +
      "SELECT user_id, week, " +
      "CAST(COALESCE(SUM(credits_e2 - charges_e2) OVER " +
      "(PARTITION BY user_id ORDER BY week " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS opening_e2, " +
      "credits_e2, charges_e2, " +
      "CAST(COALESCE(SUM(credits_e2 - charges_e2) OVER " +
      "(PARTITION BY user_id ORDER BY week " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
      "+ credits_e2 - charges_e2 AS BIGINT) AS closing_e2 " +
      "FROM wk ORDER BY user_id, week"))

  /** Progressive TIERED-RATE billing — the inclining-block tariff most
    * utilities actually run (and the shape the reference's flat prepaid
    * rate grows into): each (user, month)'s consumption fills tier 1
    * (first 5 000 cents of usage at rate 7), then tier 2 (next 15 000 at
    * 12), then tier 3 (the rest at 18). Tier splits are LEAST/GREATEST
    * integer arithmetic on exact cents — no conditionals-over-floats, no
    * rounding anywhere until the single per-row display division; the
    * per-tier charge columns sum exactly to total_e4 by construction
    * (an accounting identity the oracle's hash enforces).
    *
    * Scale notes (100 TB): one (user, month) two-phase aggregate; the tier
    * math is a scan-local projection of the AGGREGATED row — tier edges
    * ship as config (or a broadcast dim for per-plan tiers) without
    * changing the shape. */
  val billingTieredRates: Op = Op(
    "billing_tiered_rates",
    (s, d) => {
      val usage = col("usage_cents")
      val t1 = least(usage, lit(5000L))
      val t2 = least(greatest(usage - 5000L, lit(0L)), lit(15000L))
      val t3 = greatest(usage - 20000L, lit(0L))
      Tables.events(s, d)
        .where(col("event_type") =!= "purchase")
        .groupBy(col("user_id"), date_trunc("month", col("ts")).as("month"))
        .agg(sum((d2(col("value")) * 100).cast("long")).as("usage_cents"))
        .select(col("user_id"), col("month"), usage,
          (t1 * 7L).as("tier1_e4"), (t2 * 12L).as("tier2_e4"),
          (t3 * 18L).as("tier3_e4"),
          (t1 * 7L + t2 * 12L + t3 * 18L).as("total_e4"))
        .withColumn("total", col("total_e4").cast("double") / 10000.0)
        .orderBy("user_id", "month")
    },
    Some("WITH u AS (SELECT user_id, date_trunc('month', ts) AS month, " +
      "CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) " +
      "AS usage_cents FROM events WHERE event_type <> 'purchase' GROUP BY 1, 2), " +
      "t AS (SELECT user_id, month, usage_cents, " +
      "LEAST(usage_cents, 5000) AS t1, " +
      "LEAST(GREATEST(usage_cents - 5000, 0), 15000) AS t2, " +
      "GREATEST(usage_cents - 20000, 0) AS t3 FROM u) " +
      "SELECT user_id, month, usage_cents, " +
      "CAST(t1 * 7 AS BIGINT) AS tier1_e4, CAST(t2 * 12 AS BIGINT) AS tier2_e4, " +
      "CAST(t3 * 18 AS BIGINT) AS tier3_e4, " +
      "CAST(t1 * 7 + t2 * 12 + t3 * 18 AS BIGINT) AS total_e4, " +
      "CAST(t1 * 7 + t2 * 12 + t3 * 18 AS DOUBLE) / 10000.0 AS total " +
      "FROM t ORDER BY user_id, month"))

  val all: Seq[Op] = Seq(billingTimeOfUse, billingPrepaidBalance, billingWeeklyStatement,
    billingTieredRates)
}
