package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two ArrayType(DoubleType)
  * columns with whole-stage-codegen support.
  *
  * Why custom (SURVEY §4.3): the higher-order-function spelling
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` materializes the zipped array
  * and interprets two lambdas per row — measured ~5× slower on the n² pair
  * space of sim_search_topk. This expression generates a single fused loop
  * over the two ArrayData buffers (no allocation, no virtual calls), keeping
  * the similarity join inside WholeStageCodegen.
  *
  * Determinism: strictly left-to-right accumulation — bit-identical to the
  * sequential HOF fold it replaces, on every partitioning.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<double> arguments, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.DotProduct.dot($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Shared by interpreted and generated code. Mismatched lengths raise
    * rather than silently truncating — a ragged embedding is a data-quality
    * defect that must not flow into similarity rankings unnoticed. */
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_dot: vector length mismatch ($n vs ${y.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }
}

/** Registration + Column-level entry points for graft's native expressions. */
object GraftFunctions {

  /** Resolve a parameter that must be a foldable integer (e.g. numPerm) —
    * a clear error beats a ClassCastException from a blind eval cast when a
    * SQL user passes a column or a BIGINT literal. */
  private[graft] def intParam(e: Expression, fn: String): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$fn: parameter must be a literal integer, got ${e.sql}")
    e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other =>
        throw new IllegalArgumentException(s"$fn: parameter must be an integer literal, got $other")
    }
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", (args: Seq[Expression]) => DotProduct(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_sig",
      (args: Seq[Expression]) =>
        MinHashSig(args(0), intParam(args(1), "graft_minhash_sig")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", (args: Seq[Expression]) => SimHash64(args(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow_mins",
      (args: Seq[Expression]) =>
        WinnowMins(args(0), intParam(args(1), "graft_winnow_mins")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_heavy_hitters",
      (args: Seq[Expression]) =>
        SpaceSavingTopK(args(0), intParam(args(1), "graft_heavy_hitters")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might_contain",
      (args: Seq[Expression]) => BloomMightContain(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hyperplane_buckets",
      (args: Seq[Expression]) =>
        HyperplaneBuckets(args(0), intParam(args(1), "graft_hyperplane_buckets"),
          intParam(args(2), "graft_hyperplane_buckets")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_theta_sketch",
      (args: Seq[Expression]) =>
        ThetaSketchAgg(args(0), intParam(args(1), "graft_theta_sketch")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_theta_estimate", (args: Seq[Expression]) => ThetaEstimate(args(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_theta_union",
      (args: Seq[Expression]) =>
        ThetaUnionOp(args(0), args(1), intParam(args(2), "graft_theta_union")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_theta_intersect",
      (args: Seq[Expression]) => ThetaIntersectOp(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_theta_anotb",
      (args: Seq[Expression]) => ThetaAnotBOp(args(0), args(1)), "built-in")
  }

  /** Requires register(spark) on the session first. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Requires register(spark) on the session first. */
  def minhashSig(elementHashes: Column, numPerm: Int): Column =
    call_function("graft_minhash_sig", elementHashes,
      org.apache.spark.sql.functions.lit(numPerm))

  /** Requires register(spark) on the session first. */
  def simhash64(elementHashes: Column): Column =
    call_function("graft_simhash64", elementHashes)

  /** Requires register(spark) on the session first. */
  def winnowMins(elementHashes: Column, window: Int): Column =
    call_function("graft_winnow_mins", elementHashes,
      org.apache.spark.sql.functions.lit(window))

  /** Requires register(spark) on the session first. */
  def heavyHitters(item: Column, capacity: Int): Column =
    call_function("graft_heavy_hitters", item,
      org.apache.spark.sql.functions.lit(capacity))

  /** Requires register(spark) on the session first. */
  def hyperplaneBuckets(vec: Column, numTables: Int, numBits: Int): Column =
    call_function("graft_hyperplane_buckets", vec,
      org.apache.spark.sql.functions.lit(numTables),
      org.apache.spark.sql.functions.lit(numBits))

  /** Requires register(spark) on the session first. `filterBytes` is the
    * `spark.util.sketch.BloomFilter` wire format (`writeTo`). */
  def bloomMightContain(key: Column, filterBytes: Array[Byte]): Column =
    call_function("graft_bloom_might_contain", key,
      org.apache.spark.sql.functions.lit(filterBytes))

  /** Theta sketch family (distinct-set algebra). Requires register(spark). */
  def thetaSketch(item: Column, lgK: Int): Column =
    call_function("graft_theta_sketch", item, org.apache.spark.sql.functions.lit(lgK))
  def thetaEstimate(sk: Column): Column = call_function("graft_theta_estimate", sk)
  def thetaUnion(a: Column, b: Column, lgK: Int): Column =
    call_function("graft_theta_union", a, b, org.apache.spark.sql.functions.lit(lgK))
  def thetaIntersect(a: Column, b: Column): Column =
    call_function("graft_theta_intersect", a, b)
  def thetaAnotB(a: Column, b: Column): Column =
    call_function("graft_theta_anotb", a, b)
}
