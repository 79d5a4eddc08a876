package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: 64-bit SimHash of a feature-hash set
  * (array<long> → long). Bit k of the output is 1 iff the majority of
  * feature hashes have bit k set (unweighted bit voting). Near-duplicate
  * documents land within a small Hamming distance.
  *
  * Deterministic: pure function of the input hashes — byte-identical across
  * runs and partitionings. Codegen keeps the 64-way vote inside the
  * whole-stage-generated loop.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 requires array<long>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      h => s"${ev.value} = graft.functions.SimHash64.simhash($h);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Called from both interpreted and generated code. */
  def simhash(hs: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hs.numElements()
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      j += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) > 0) out |= (1L << k)
      k += 1
    }
    out
  }
}
