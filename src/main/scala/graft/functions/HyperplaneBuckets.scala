package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: random-hyperplane LSH bucket ids of a vector
  * (array<double>) for `numTables` independent tables of `numBits` sign-bits
  * each — returns array<int> of length `numTables`.
  *
  * Hyperplane component (t, p, j) derives deterministically from SplitMix64
  * (seed (t·numBits + p)·dim + j, scaled to [-1, 1]), so buckets are
  * byte-identical across runs, partitionings, and JVMs — the same fixed-seed
  * policy as [[MinHashSig]].
  *
  * Why custom (SURVEY §4.3): the column-expression spelling inlines
  * numTables·numBits literal plane arrays (dim doubles each) into a
  * when-chain — for 4×6 tables over 64-dim vectors that is 1 536 literals
  * and a generated method large enough that Janino compile time dominates the
  * whole ANN query at bench scale. This expression is one fused loop with the
  * planes held in a process-wide cache; the generated call is three lines.
  */
case class HyperplaneBuckets(child: Expression, numTables: Int, numBits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if numTables >= 1 && numBits >= 1 && numBits <= 30 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_hyperplane_buckets requires 1 <= numBits <= 30 and numTables >= 1, " +
          s"got numTables=$numTables numBits=$numBits")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_buckets requires array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_buckets"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      HyperplaneBuckets.buckets(input.asInstanceOf[ArrayData], numTables, numBits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      s"""
         |int[] $out = graft.functions.HyperplaneBuckets.buckets($v, $numTables, $numBits);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {

  /** planes(t·numBits + p) = the dim components of hyperplane p of table t. */
  private def planes(numTables: Int, numBits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(numTables * numBits) { tp =>
      Array.tabulate(dim) { j =>
        MinHashSig.splitmix64(tp.toLong * dim + j).toDouble / Long.MaxValue.toDouble
      }
    }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  /** Called from both the interpreted path and the generated code. */
  def buckets(vec: ArrayData, numTables: Int, numBits: Int): Array[Int] = {
    val dim = vec.numElements()
    val ps = cache.computeIfAbsent((numTables, numBits, dim),
      k => planes(k._1, k._2, k._3))
    val out = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0
      var p = 0
      while (p < numBits) {
        val plane = ps(t * numBits + p)
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += vec.getDouble(j) * plane(j); j += 1 }
        if (dot >= 0) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }
}
