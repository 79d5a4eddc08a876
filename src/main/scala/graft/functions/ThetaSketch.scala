package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketch (KMV-family) distinct-set summaries — the sketch that closes
  * the gap HLL leaves open: set ALGEBRA. HLL unions; theta additionally
  * INTERSECTS and DIFFERENCES (audience overlap, churn = active-then-gone,
  * incremental-vs-standing distinct deltas), because its state is the k
  * smallest value hashes — an actual sample of the set — rather than
  * register maxima.
  *
  * Determinism (the property every graft oracle rides on): a theta sketch's
  * state is a pure function of the input SET — hashing uses the library's
  * fixed default seed, the retained set is "the k smallest hashes", and
  * union/intersection/difference are set operations on those hashes — so
  * results are bit-identical under any shuffle partitioning or merge order
  * (serialization always emits the ORDERED compact form). Contrast KLL/
  * t-digest, whose randomized compaction is merge-order-sensitive — that is
  * why mergeable quantiles ship as the fixed-bin `stats_histogram` instead.
  *
  * Backed by the datasketches-java library Spark itself ships for its
  * `hll_sketch_agg` functions (/opt/spark/jars/datasketches-java-6.2.0.jar).
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_sketch requires a long/int/string argument, got $other")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()

  override def update(b: Union, row: InternalRow): Union = {
    child.eval(row) match {
      case null =>
      case l: Long => b.update(l)
      case i: Int => b.update(i.toLong)
      case s: UTF8String => b.update(s.toString)
    }
    b
  }

  override def merge(b: Union, o: Union): Union = {
    b.union(o.getResult(true, null)); b
  }

  override def eval(b: Union): Any = b.getResult(true, null).toByteArray

  override def serialize(b: Union): Array[Byte] = b.getResult(true, null).toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct-count estimate of a serialized theta sketch. CodegenFallback is
  * deliberate: these scalar set-ops run over per-group sketch rows (tens of
  * rows — one per day/segment), never over the event stream; the scan-side
  * heavy lifting is the codegen'd aggregate above. */
case class ThetaEstimate(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(b: Any): Any =
    CompactSketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]])).getEstimate
  override def prettyName: String = "graft_theta_estimate"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

sealed trait ThetaBinarySetOp extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  protected def compute(a: CompactSketch, b: CompactSketch): CompactSketch
  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(
      CompactSketch.heapify(Memory.wrap(a.asInstanceOf[Array[Byte]])),
      CompactSketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]]))).toByteArray
}

/** Union of two sketches at the given nominal size. */
case class ThetaUnionOp(left: Expression, right: Expression, lgK: Int)
  extends ThetaBinarySetOp {
  override protected def compute(a: CompactSketch, b: CompactSketch): CompactSketch = {
    val u = SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()
    u.union(a); u.union(b)
    u.getResult(true, null)
  }
  override def prettyName: String = "graft_theta_union"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Intersection — the operation HLL cannot express. */
case class ThetaIntersectOp(left: Expression, right: Expression)
  extends ThetaBinarySetOp {
  override protected def compute(a: CompactSketch, b: CompactSketch): CompactSketch = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(a); i.intersect(b)
    i.getResult(true, null)
  }
  override def prettyName: String = "graft_theta_intersect"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** A \ B — members of A absent from B (churn, decontamination-style deltas). */
case class ThetaAnotBOp(left: Expression, right: Expression)
  extends ThetaBinarySetOp {
  override protected def compute(a: CompactSketch, b: CompactSketch): CompactSketch =
    SetOperation.builder().buildANotB().aNotB(a, b)
  override def prettyName: String = "graft_theta_anotb"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
