package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, DecimalType, DoubleType}

/** Materialized-view AGGREGATE NAVIGATION — the warehouse classic: a daily
  * rollup MV is maintained next to the fact table, and an injected optimizer
  * rule rewrites a user's full-scan rollup query to read the MV instead —
  * the user query never changes, the scan drops from the corpus to
  * |days| rows. This exercises the second Catalyst extension surface
  * (`injectOptimizerRule` / `experimental.extraOptimizations`) alongside the
  * as-of family's planner strategy.
  *
  * The match is deliberately NARROW (soundness over coverage): a
  * single-grouping Aggregate whose grouping is a date-cast chain rooted at
  * the fact table's `ts`, whose aggregates are exactly
  * `count(1)` and `cast(sum(cast(value as decimal(12,2))) as double)` — the
  * engine's exact-decimal rollup idiom — directly over a Project of the
  * REGISTERED base relation (any intervening Filter/Join defeats the match,
  * so a filtered rollup is never wrongly navigated). Both sides of the
  * rewrite are exact decimal arithmetic, so MV-read ≡ recompute
  * bit-for-bit — which the driver's oracle (plain SQL over the BASE table)
  * verifies on every run.
  */
object MvCatalog {
  /** base fact parquet path → MV parquet path with columns (day, cnt, sum_value). */
  @volatile private[plans] var entries: Map[String, String] = Map.empty
  def register(basePath: String, mvPath: String): Unit =
    synchronized { entries += basePath -> mvPath }
  def clear(): Unit = synchronized { entries = Map.empty }
}

class RollupMvRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def relationPaths(rel: LogicalRelation): Seq[String] = rel.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
    case _ => Nil
  }

  private def dateCastRoot(e: Expression): Option[Attribute] = e match {
    case c: Cast => dateCastRoot(c.child)
    case a: Attribute => Some(a)
    case _ => None
  }

  private def isCountLit1(e: Expression): Boolean = e match {
    case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Count(Seq(Literal(1, _))) => true
        case _ => false
      }
    case _ => false
  }

  private def isExactDecimalSumOfValue(e: Expression): Boolean = e match {
    case c: Cast if c.dataType == DoubleType =>
      c.child match {
        case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case Sum(inner: Cast, _) => (inner.child, inner.dataType) match {
              case (v: AttributeReference, dt: DecimalType) =>
                v.name == "value" && dt.precision == 12 && dt.scale == 2
              case _ => false
            }
            case _ => false
          }
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MvCatalog.entries.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(Seq(g: AttributeReference), aggExprs,
          Project(projList, rel: LogicalRelation), _) if aggExprs.size == 3 =>
        val paths = relationPaths(rel)
        val mvOpt = MvCatalog.entries.collectFirst {
          case (base, mv) if paths.exists(p => p.contains(base) || base.contains(p)) => mv
        }
        val groupingDef = projList.collectFirst {
          case al: Alias if al.exprId == g.exprId => al.child
        }
        val shapeOk = mvOpt.isDefined &&
          groupingDef.exists(gd => gd.dataType == DateType &&
            dateCastRoot(gd).exists(_.name == "ts")) &&
          (aggExprs match {
            case Seq(a0: Alias, a1: Alias, a2: Alias) =>
              a0.child.semanticEquals(g) && isCountLit1(a1.child) &&
                isExactDecimalSumOfValue(a2.child)
            case _ => false
          })
        // an unreadable/vanished MV must never break the query — fall back
        // to the base-table plan (navigation is an optimization, not a
        // dependency)
        val mvPlanOpt = if (!shapeOk) None else
          try Some(spark.read.parquet(mvOpt.get).queryExecution.analyzed)
          catch { case e: Exception =>
            logWarning(s"RollupMvRule: MV ${mvOpt.get} unreadable, not navigating: $e")
            None
          }
        if (mvPlanOpt.isEmpty) agg
        else {
          val mvPlan = mvPlanOpt.get
          val byName = mvPlan.output.map(a => a.name -> a).toMap
          if (!Seq("day", "cnt", "sum_value").forall(byName.contains)) agg
          else {
            val out = agg.output
            logInfo(s"RollupMvRule: navigating rollup over ${paths.mkString(",")} " +
              s"to MV ${mvOpt.get}")
            Project(Seq(
              Alias(byName("day"), out(0).name)(exprId = out(0).exprId),
              Alias(byName("cnt"), out(1).name)(exprId = out(1).exprId),
              Alias(byName("sum_value"), out(2).name)(exprId = out(2).exprId)), mvPlan)
          }
        }
    }
  }
}

object MvRewrite {
  /** Idempotently adds the rule via the public `extraOptimizations` hook
    * (production path: `GraftExtensions.injectOptimizerRule`). */
  def ensureRegistered(s: SparkSession): Unit = synchronized {
    if (!s.experimental.extraOptimizations.exists(_.isInstanceOf[RollupMvRule]))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ new RollupMvRule(s)
  }

  def register(s: SparkSession, basePath: String, mvPath: String): Unit = {
    ensureRegistered(s)
    MvCatalog.register(basePath, mvPath)
  }
}
