package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** SQL spelling for the two native join operators (round 14; the round-13
  * verdict's #4): table-valued functions
  *
  *   graft_asof_join(left, right, leftKey, rightKey, leftTime, rightTime
  *                   [, rightTiebreak])
  *   graft_band_join(left, right, leftKey, rightKey, leftTime, rightTime,
  *                   loMicros, hiMicros)
  *
  * so pure-`spark.sql` users reach [[AsofJoinExec]] / [[RangeJoinExec]]
  * without the DataFrame API ([[Asof.join]] / [[Band.join]]) and without
  * depending on [[BandRewriteRule]] recognizing their particular theta
  * spelling — the as-of pattern in particular HAS no declarative rewrite
  * (latest-prior-row is a window, not a theta join). Arguments are
  * literals: two table/view names (the analyzer resolves them like any FROM
  * reference — temp views and catalog tables both work) and column names
  * (emitted as UnresolvedAttributes the analyzer binds against the two
  * children; left/right column NAMES must be disjoint, the same contract as
  * the DataFrame API). The builders return the SAME logical nodes the
  * DataFrame API assembles, so analysis, broadcast-vs-shuffle selection,
  * and exec semantics are literally shared code paths — SqlNativeJoinSpec
  * asserts the native execs fire from pure SQL text.
  *
  * Band semantics: `leftTime < rightTime <= leftTime + hiMicros` shifted by
  * loMicros — i.e. `(leftTime + loMicros, leftTime + hiMicros]`, the
  * follow-within-window contract shared with [[Band.join]]'s defaults.
  * As-of semantics: strictly-prior latest right row per left row, ties
  * broken by the optional tiebreak column descending — [[Asof.join]]'s
  * defaults.
  *
  * Registered per-session by [[ensureRegistered]] (the session's
  * TableFunctionRegistry — the TVF counterpart of the
  * `experimental.extraStrategies` fallback) and globally via
  * `spark.sql.extensions=graft.GraftExtensions` (`injectTableFunction`). */
object SqlTableFunctions {

  private def strLit(fn: String, args: Seq[Expression], i: Int): String = args(i) match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${i + 1} must be a string literal, got $other")
  }

  private def longLit(fn: String, args: Seq[Expression], i: Int): Long = args(i) match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${i + 1} must be an integer literal, got $other")
  }

  val asofName: FunctionIdentifier = FunctionIdentifier("graft_asof_join")
  val bandName: FunctionIdentifier = FunctionIdentifier("graft_band_join")

  val asofBuilder: Seq[Expression] => LogicalPlan = args => {
    require(args.length == 6 || args.length == 7,
      "graft_asof_join(left, right, leftKey, rightKey, leftTime, rightTime" +
        s"[, rightTiebreak]): got ${args.length} arguments")
    def s(i: Int) = strLit("graft_asof_join", args, i)
    AsofJoin(
      UnresolvedRelation(Seq(s(0))), UnresolvedRelation(Seq(s(1))),
      Seq(UnresolvedAttribute(s(2))), Seq(UnresolvedAttribute(s(3))),
      UnresolvedAttribute(s(4)), UnresolvedAttribute(s(5)),
      strict = true,
      rightTiebreak = if (args.length == 7) Seq(UnresolvedAttribute(s(6))) else Nil)
  }

  val bandBuilder: Seq[Expression] => LogicalPlan = args => {
    require(args.length == 8,
      "graft_band_join(left, right, leftKey, rightKey, leftTime, rightTime, " +
        s"loMicros, hiMicros): got ${args.length} arguments")
    def s(i: Int) = strLit("graft_band_join", args, i)
    val lo = longLit("graft_band_join", args, 6)
    val hi = longLit("graft_band_join", args, 7)
    require(lo <= hi, s"graft_band_join: empty band ($lo, $hi)")
    RangeJoin(
      UnresolvedRelation(Seq(s(0))), UnresolvedRelation(Seq(s(1))),
      Seq(UnresolvedAttribute(s(2))), Seq(UnresolvedAttribute(s(3))),
      UnresolvedAttribute(s(4)), UnresolvedAttribute(s(5)),
      lo, hi, loStrict = true, hiStrict = false)
  }

  /** Idempotently registers both TVFs in the session's table-function
    * registry AND the planner strategies their nodes need — always together,
    * so a plan the TVFs produce can always plan (the [[Band.ensureOptimized]]
    * discipline). */
  def ensureRegistered(s: SparkSession): Unit = synchronized {
    Asof.ensureRegistered(s)
    Band.ensureRegistered(s)
    val reg = s.sessionState.tableFunctionRegistry
    if (!reg.functionExists(asofName))
      reg.registerFunction(asofName,
        new ExpressionInfo(classOf[AsofJoin].getName, asofName.funcName), asofBuilder)
    if (!reg.functionExists(bandName))
      reg.registerFunction(bandName,
        new ExpressionInfo(classOf[RangeJoin].getName, bandName.funcName), bandBuilder)
  }
}
