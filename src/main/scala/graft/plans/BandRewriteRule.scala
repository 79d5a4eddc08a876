package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType, TimestampType}

/** Optimizer rule: the DECLARATIVE equi+band join pattern → the native
  * [[RangeJoin]] operator — the round-12 verdict's standing top-next.
  *
  * Without this rule the efficient sliding-buffer plan required opting into
  * `Band.join` explicitly; a user writing the natural theta form
  *
  * {{{
  *   fact.join(other, key === key2 && t2 > t1 && t2 <= t1 + expr("INTERVAL 10 MINUTES"))
  * }}}
  *
  * got Catalyst's sort-merge join with the band evaluated as a POST-JOIN
  * condition: the merge buffers each key's entire right group and compares
  * every in-key pair — O(per-key n²) compares with hot keys. This rule
  * recognizes the shape inside the optimizer and rewrites it onto
  * [[RangeJoin]], whose exec slides a buffer of only the in-band rows down
  * both time-sorted sides (compares and memory ∝ band occupancy) under the
  * SAME exchange envelope — one co-partitioned shuffle per side, or a
  * broadcast when the right side is dimension-sized
  * ([[RangeJoinStrategy]]'s JoinSelection-style decision).
  *
  * Recognized: INNER or LEFT OUTER join whose condition splits into
  *   - ≥ 1 equi predicate `leftExpr = rightExpr` (orderable key types),
  *   - a finite band on ONE time pair: a lower bound `rt >(=) lt + loUs` and
  *     an upper bound `rt <(=) lt + hiUs`, in any written orientation, with
  *     literal day-time-interval or long offsets (both sides TIMESTAMP or
  *     both LONG micros),
  *   - INNER only: anything else left over — re-applied as a [[Filter]]
  *     ABOVE the RangeJoin (inner-join conjuncts are pair filters, so this
  *     preserves semantics exactly). A LEFT OUTER join rewrites only when
  *     the equi+band conjuncts are the WHOLE condition — a leftover cannot
  *     be hoisted above an outer join without dropping null-extended rows.
  * Joins with streaming children, non-deterministic conditions, or an empty
  * band are left untouched.
  *
  * Registration: globally via `spark.sql.extensions=graft.GraftExtensions`
  * (beside [[RollupMvRule]]); per-session via [[Band.ensureOptimized]],
  * which also registers the planner strategy so a rewritten node can always
  * plan. RangeJoinSpec asserts the fired plan shape AND result equality
  * with the un-rewritten sort-merge formulation.
  */
object BandRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  /** One normalized band bound: `rt OP lt + deltaUs`. */
  private case class Bound(lt: Expression, rt: Expression, deltaUs: Long,
                           lower: Boolean, strict: Boolean)

  /** Decompose `e` as `base + offsetMicros` (literal day-time interval on a
    * timestamp, or literal long on a long), else offset 0. */
  private def baseAndOffset(e: Expression): (Expression, Long) = e match {
    case TimestampAddInterval(b, Literal(d: Long, _: DayTimeIntervalType), _) => (b, d)
    case Add(b, Literal(d: Long, LongType), _) => (b, d)
    case Add(Literal(d: Long, LongType), b, _) => (b, d)
    case _ => (e, 0L)
  }

  private def timeTyped(a: Expression, b: Expression): Boolean =
    (a.dataType, b.dataType) match {
      case (TimestampType, TimestampType) => true
      case (LongType, LongType) => true
      case _ => false
    }

  /** Normalize one comparison conjunct into a [[Bound]] when it compares a
    * left-only time expression against a right-only one (either written
    * orientation, offset on either side). */
  private def normalize(cmp: Expression, leftSet: AttributeSet,
                        rightSet: AttributeSet): Option[Bound] = {
    def sided(e: Expression): Option[Boolean] = // Some(true)=left-only
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(leftSet)) Some(true)
      else if (e.references.subsetOf(rightSet)) Some(false)
      else None

    // a OP b with OP encoded as (lowerWhenRtFirst, strict)
    def build(a: Expression, b: Expression, gt: Boolean, strict: Boolean): Option[Bound] = {
      val (ab, ao) = baseAndOffset(a)
      val (bb, bo) = baseAndOffset(b)
      (sided(ab), sided(bb)) match {
        case (Some(false), Some(true)) if timeTyped(bb, ab) =>
          // rt + ao OP lt + bo  ≡  rt OP lt + (bo - ao)
          Some(Bound(bb, ab, bo - ao, lower = gt, strict = strict))
        case (Some(true), Some(false)) if timeTyped(ab, bb) =>
          // lt + ao OP rt + bo  ≡  rt invOP lt + (ao - bo)
          Some(Bound(ab, bb, ao - bo, lower = !gt, strict = strict))
        case _ => None
      }
    }

    cmp match {
      case GreaterThan(a, b) => build(a, b, gt = true, strict = true)
      case GreaterThanOrEqual(a, b) => build(a, b, gt = true, strict = false)
      case LessThan(a, b) => build(a, b, gt = false, strict = true)
      case LessThanOrEqual(a, b) => build(a, b, gt = false, strict = false)
      case _ => None
    }
  }

  /** Kill switch (standard practice for a custom rewrite): set
    * `graft.band.rewrite=false` to get Catalyst's stock plan — also how the
    * equality specs obtain the INDEPENDENT un-rewritten formulation to
    * compare the native exec against. */
  val RewriteConfKey = "graft.band.rewrite"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(RewriteConfKey, "true") != "true") plan
    else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // INNER: leftover conjuncts re-apply as a Filter above (pair filters
    // commute with an inner join). LEFT OUTER: the same shape rewrites to
    // the exec's native leftOuter emission, but ONLY when the band+equi
    // conjuncts are the WHOLE condition — a leftover conjunct cannot be
    // hoisted above an outer join (it would drop the null-extended rows).
    case j @ Join(left, right, jt @ (Inner | LeftOuter), Some(cond), _)
        if !j.isStreaming && cond.deterministic =>
      val leftSet = left.outputSet
      val rightSet = right.outputSet
      val conjuncts = splitConjunctivePredicates(cond)

      def equiOf(e: Expression): Option[(Expression, Expression)] = e match {
        case EqualTo(a, b)
            if a.references.nonEmpty && b.references.nonEmpty &&
              RowOrdering.isOrderable(a.dataType) =>
          if (a.references.subsetOf(leftSet) && b.references.subsetOf(rightSet)) Some((a, b))
          else if (b.references.subsetOf(leftSet) && a.references.subsetOf(rightSet)) Some((b, a))
          else None
        case _ => None
      }

      val equis = conjuncts.flatMap(c => equiOf(c).map(c -> _))
      val bounds = conjuncts.flatMap(c => normalize(c, leftSet, rightSet).map(c -> _))

      // One time pair carrying both a lower and an upper bound; tightest of
      // each (larger lo / smaller hi; strict beats non-strict on a tie).
      val pair = bounds
        .groupBy { case (_, b) => (b.lt.canonicalized, b.rt.canonicalized) }
        .values.find(g => g.exists(_._2.lower) && g.exists(!_._2.lower))

      val rewritten = for {
        g <- pair if equis.nonEmpty
        (loC, loB) = g.filter(_._2.lower)
          .maxBy { case (_, b) => (b.deltaUs, b.strict) }
        (hiC, hiB) = g.filterNot(_._2.lower)
          .minBy { case (_, b) => (b.deltaUs, !b.strict) }
        if loB.deltaUs < hiB.deltaUs ||
          (loB.deltaUs == hiB.deltaUs && !loB.strict && !hiB.strict)
        taken = equis.map(_._1).toSet + loC + hiC
        leftover = conjuncts.filterNot(taken.contains)
        if jt == Inner || leftover.isEmpty
      } yield {
        val rj = RangeJoin(left, right,
          equis.map(_._2._1), equis.map(_._2._2),
          loB.lt, loB.rt, loB.deltaUs, hiB.deltaUs, loB.strict, hiB.strict,
          leftOuter = jt == LeftOuter)
        if (leftover.isEmpty) rj else Filter(leftover.reduce(And), rj)
      }
      rewritten.getOrElse(j)
  }
}
