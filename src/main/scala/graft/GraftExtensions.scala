package graft

import graft.functions.{BloomMightContain, DotProduct, HyperplaneBuckets, MinHashSig, SimHash64, SpaceSavingTopK, WinnowMins}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Production registration path for graft's native expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * makes the graft_* functions available to every session (SQL and
  * DataFrame API) without the per-session `GraftFunctions.register` call
  * the operators use as a fallback. No custom optimizer rules or strategies
  * are injected — SURVEY §4.3's audit holds: Catalyst's built-in planning
  * covers the whole declared surface, and the engine's extensions are six
  * scalar expressions plus one native aggregate (the Space-Saving
  * heavy-hitters sketch, a TypedImperativeAggregate).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args(0), graft.functions.GraftFunctions.intParam(args(1), "graft_minhash_sig"))))
    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_winnow_mins"),
      new ExpressionInfo(classOf[WinnowMins].getName, "graft_winnow_mins"),
      (args: Seq[Expression]) => WinnowMins(args(0), graft.functions.GraftFunctions.intParam(args(1), "graft_winnow_mins"))))
    ext.injectFunction((FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[SpaceSavingTopK].getName, "graft_heavy_hitters"),
      (args: Seq[Expression]) => SpaceSavingTopK(args(0),
        graft.functions.GraftFunctions.intParam(args(1), "graft_heavy_hitters"))))
    ext.injectFunction((FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_might_contain"),
      (args: Seq[Expression]) => BloomMightContain(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "graft_hyperplane_buckets"),
      (args: Seq[Expression]) => HyperplaneBuckets(args(0),
        graft.functions.GraftFunctions.intParam(args(1), "graft_hyperplane_buckets"),
        graft.functions.GraftFunctions.intParam(args(2), "graft_hyperplane_buckets"))))
  }
}
