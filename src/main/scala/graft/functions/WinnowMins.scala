package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: winnowing fingerprints — the distinct minima
  * of every `window`-length sliding window over an array of rolling hashes
  * (array<long> → array<long>, ascending order for deterministic output).
  *
  * Replaces the interpreted
  * `array_distinct(transform(sequence(...), i -> array_min(slice(hs, i, w))))`
  * spelling, which allocates a slice per window; this is one fused pass with
  * a sliding minimum. Output order is sorted ascending (a set, pinned).
  */
case class WinnowMins(child: Expression, window: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if window >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow_mins requires array<long> (got $t) and window >= 1")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_mins"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(WinnowMins.winnow(input.asInstanceOf[ArrayData], window))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => s"""
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
       |  graft.functions.WinnowMins.winnow($h, $window));
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowMins {
  /** Distinct sliding-window minima, sorted ascending. Called from both the
    * interpreted path and generated code. */
  def winnow(hs: ArrayData, w: Int): Array[Long] = {
    val n = hs.numElements()
    if (n < w) return Array.emptyLongArray
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + w <= n) {
      var m = Long.MaxValue
      var j = i
      while (j < i + w) { val v = hs.getLong(j); if (v < m) m = v; j += 1 }
      out.add(m)
      i += 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    arr
  }
}
