package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Space-Saving heavy-hitters sketch (Metwally et al., the classic top-k
  * frequent-items summary): at most `capacity` (item → overestimated count,
  * max error) entries; an unseen item evicts the current minimum and
  * inherits its count as error. Invariants: every tracked count ≥ the item's
  * true count, and any item whose true count exceeds N/capacity is
  * guaranteed present — which is exactly the candidate-recall guarantee the
  * consuming query needs (sketch proposes, exact counting verifies).
  *
  * The cross-partition merge is the guarantee-preserving one: an item absent
  * from the other sketch contributes that sketch's minimum count (its
  * maximum possible undercount) rather than zero, then the union is trimmed
  * back to capacity — overestimates stay overestimates under any merge
  * order. With capacity ≥ the true distinct count no eviction ever fires and
  * the sketch is exact (and therefore bit-deterministic across shuffle
  * partitionings; eval emits items in sorted order so map iteration order
  * never leaks).
  */
final class SpaceSavingSketch(val capacity: Int) {
  private[graft] val counts = mutable.HashMap.empty[String, Long]
  private[graft] val errs = mutable.HashMap.empty[String, Long]

  private def minEntry: (String, Long) =
    counts.minBy { case (k, v) => (v, k) } // deterministic tie-break

  def add(item: String): Unit = counts.get(item) match {
    case Some(c) => counts(item) = c + 1
    case None if counts.size < capacity =>
      counts(item) = 1L
      errs(item) = 0L
    case None =>
      val (evicted, minCnt) = minEntry
      counts.remove(evicted)
      errs.remove(evicted)
      counts(item) = minCnt + 1
      errs(item) = minCnt
  }

  def merge(o: SpaceSavingSketch): Unit = {
    val minSelf = if (counts.size < capacity) 0L else counts.values.min
    val minO = if (o.counts.size < o.capacity) 0L else o.counts.values.min
    val merged = (counts.keySet ++ o.counts.keySet).toSeq.map { k =>
      val ca = counts.getOrElse(k, minSelf)
      val ea = errs.getOrElse(k, minSelf)
      val cb = o.counts.getOrElse(k, minO)
      val eb = o.errs.getOrElse(k, minO)
      (k, ca + cb, ea + eb)
    }
    counts.clear(); errs.clear()
    merged.sortBy { case (k, c, _) => (-c, k) }.take(capacity).foreach {
      case (k, c, e) => counts(k) = c; errs(k) = e
    }
  }

  /** Tracked items in canonical (sorted) order. */
  def items: Seq[String] = counts.keys.toSeq.sorted

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(capacity)
    out.writeInt(counts.size)
    items.foreach { k =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(counts(k))
      out.writeLong(errs.getOrElse(k, 0L))
    }
    out.flush()
    bos.toByteArray
  }
}

object SpaceSavingSketch {
  def fromBytes(bytes: Array[Byte]): SpaceSavingSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new SpaceSavingSketch(in.readInt())
    val n = in.readInt()
    (1 to n).foreach { _ =>
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      val k = new String(b, "UTF-8")
      sk.counts(k) = in.readLong()
      sk.errs(k) = in.readLong()
    }
    sk
  }
}

/** The sketch as a native Catalyst aggregate — `TypedImperativeAggregate`
  * (the serialized-buffer aggregate machinery Spark's own percentile_approx
  * and count_min_sketch use): partial sketches build map-side, ship as
  * bytes, and merge at the reducer, so the full token stream never shuffles.
  * Emits the candidate item array (sorted); the consuming query verifies
  * candidates with exact counts.
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters requires a string argument, got ${child.dataType}")

  override def createAggregationBuffer(): SpaceSavingSketch =
    new SpaceSavingSketch(capacity)

  override def update(b: SpaceSavingSketch, row: InternalRow): SpaceSavingSketch = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: SpaceSavingSketch, o: SpaceSavingSketch): SpaceSavingSketch = {
    b.merge(o); b
  }

  override def eval(b: SpaceSavingSketch): Any =
    new GenericArrayData(b.items.map(UTF8String.fromString))

  override def serialize(b: SpaceSavingSketch): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): SpaceSavingSketch =
    SpaceSavingSketch.fromBytes(bytes)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
