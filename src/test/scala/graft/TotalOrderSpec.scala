package graft

import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Project, Sort, SubqueryAlias, WithCTE}
import org.apache.spark.sql.functions.{col, count_distinct, max, struct, to_json}
import org.apache.spark.sql.graft.PlanBridge
import org.scalatest.funsuite.AnyFunSuite

/** Tree-wide TOTAL-ORDER guard (the round-12 verdict's #1): the driver's
  * hash compare is row-order-sensitive, so every oracle-backed query that
  * ends in a global sort must have sort keys that FUNCTIONALLY DETERMINE
  * the row. Two distinct rows tying on the sort key would be emitted in an
  * engine-dependent order (Spark's range-partitioned sort vs DuckDB's) and
  * flip the hash even though the result SET is identical — the exact
  * latent-flake class the four raw-ingest keys carried until round 13.
  *
  * Check, per query at sf0.01: locate the top-level global [[Sort]] in the
  * analyzed plan (descending through Project/SubqueryAlias/Limit/WithCTE
  * wrappers that don't change row multiplicity), project the sort-key
  * expressions alongside the sort child's full output, and assert each
  * sort-key group contains at most ONE DISTINCT payload. Duplicate
  * identical rows are fine (set_union_all retains them by contract — order
  * among equal rows can't flip a hash); distinct payloads under one key are
  * the bug. Payload identity goes through to_json of the aliased row struct
  * so map-typed columns (not comparable in Spark) still participate.
  *
  * This kills the whole failure class the way HashEnvelopeSpec killed the
  * DECIMAL one: a future query with a non-total sort fails here at build
  * time instead of flaking in some later round's driver run.
  */
class TotalOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Top-level global Sort plus a re-wrap function restoring any WithCTE
    * scaffolding the projected child still references. */
  private def sortAndWrap(plan: LogicalPlan): Option[(Sort, LogicalPlan => LogicalPlan)] =
    plan match {
      case s: Sort if s.global => Some((s, identity))
      case p: Project => sortAndWrap(p.child)
      case a: SubqueryAlias => sortAndWrap(a.child)
      case l: GlobalLimit => sortAndWrap(l.child)
      case l: LocalLimit => sortAndWrap(l.child)
      case w: WithCTE =>
        sortAndWrap(w.plan).map { case (s, f) =>
          (s, (np: LogicalPlan) => w.copy(plan = f(np)))
        }
      case _ => None
    }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
       if SparkEntry.oracleSql.contains(name)) {
    test(s"$name: sort keys functionally determine the row at sf0.01") {
      val df = fn(spark, TestSpark.sf001)
      sortAndWrap(df.queryExecution.analyzed) match {
        case Some((s, wrap)) =>
          val keys = s.order.zipWithIndex.map { case (o, i) => Alias(o.child, s"k$i")() }
          val payload = s.child.output.zipWithIndex.map { case (a, i) => Alias(a, s"p$i")() }
          val projected = PlanBridge.ofRows(spark, wrap(Project(keys ++ payload, s.child)))
          val keyCols = keys.indices.map(i => col(s"k$i"))
          val payloadCols = payload.indices.map(i => col(s"p$i"))
          val worst = projected
            .groupBy(keyCols: _*)
            .agg(count_distinct(to_json(struct(payloadCols: _*))).as("payloads"))
            .agg(max(col("payloads")))
            .first().getLong(0)
          assert(worst <= 1,
            s"$name: ${worst} distinct payloads under one sort-key group — " +
              "row order is engine-dependent; add the differing columns to the sort key")
        case None =>
          // The driver hash is row-order-sensitive, so an oracle-backed
          // query with NO top-level global sort has undefined output order —
          // a flake waiting for an engine or plan change — UNLESS the
          // result is a single row, where order is moot. The five such keys
          // are all scalar summaries (global aggregates cross-joined into
          // one report row); if one ever grows a second row this fails and
          // demands the total orderBy.
          val n = df.count()
          assert(n <= 1,
            s"$name has an oracle, no top-level global Sort, and $n rows — " +
              "row order is undefined; add a total orderBy (the TREE-WIDE " +
              "invariant this spec enforces)")
      }
    }
  }
}
