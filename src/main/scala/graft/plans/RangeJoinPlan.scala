package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The native BAND (range) join — `join_range_theta`'s semantics as a
  * first-class Catalyst operator, extension path (c) of the build contract
  * beside [[AsofJoin]]: INNER equi-join on keys plus a time-band predicate
  * `leftTime + loUs < rightTime <= leftTime + hiUs` (each bound's
  * strictness configurable).
  *
  * Why a custom exec: Catalyst plans equi+band as a sort-merge join whose
  * band predicate is evaluated as a POST-JOIN condition — the merge buffers
  * each key's ENTIRE right-side group and compares every (left, right) pair
  * within the key, O(per-key n²) compares and per-key-group memory. This
  * exec exploits that both sides are time-sorted: a sliding buffer holds
  * only the right rows currently inside the band (eviction is monotone as
  * the left time advances), so compares and memory are O(n + output) and
  * O(band occupancy) — at 100 TB with hot keys (one device's whole history
  * in one group) this is the difference between the key's square and the
  * band's width.
  *
  * Scale shape: each side shuffles ONCE on its keys (co-partitioned via
  * `requireAllClusterKeys`, exactly a shuffled join's contract) and sorts
  * by (keys, time); the merge is a single forward pass per partition.
  */
case class RangeJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    loUs: Long,
    hiUs: Long,
    loStrict: Boolean,
    hiStrict: Boolean,
    broadcastRight: Option[Boolean] = None,
    leftOuter: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: [[RangeJoin]] logical node → physical band join, making
  * the JoinSelection-style broadcast-vs-shuffle decision the as-of strategy
  * makes: an explicit `broadcastRight` hint wins; otherwise the right side
  * broadcasts when its estimated size fits
  * `spark.sql.autoBroadcastJoinThreshold`, else both sides shuffle into the
  * sliding-buffer [[RangeJoinExec]]. Registered per-session via
  * [[Band.ensureRegistered]] and globally via [[graft.GraftExtensions]]. */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoin(l, r, lk, rk, lt, rt, lo, hi, ls, hs, bc, outer) =>
      val threshold = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val broadcast = bc.getOrElse(
        threshold > 0 && r.stats.sizeInBytes >= 0 && r.stats.sizeInBytes <= threshold)
      if (broadcast)
        BroadcastRangeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, lo, hi, ls, hs,
          outer) :: Nil
      else
        RangeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, lo, hi, ls, hs,
          outer) :: Nil
    case _ => Nil
  }
}

/** Physical band join: children arrive hash-clustered on the join keys and
  * sorted by (keys, time); one merge pass per partition with a sliding
  * buffer of in-band right rows. Null semantics: a null key or null time on
  * either side can never match (right such rows are discarded on first
  * contact). INNER (default): left rows with no in-band match emit nothing.
  * LEFT OUTER (`leftOuter = true`): every left row emits — unmatched ones
  * (including null-key/null-time lefts) once with nulls on the right, the
  * standard outer-join null semantics. */
case class RangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    loUs: Long,
    hiUs: Long,
    loStrict: Boolean,
    hiStrict: Boolean,
    leftOuter: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  // Input-row metrics are SIZE metrics on purpose: the UI reports per-task
  // min/med/max beside the total — the post-hoc skew signal join_range_sliced
  // exists to fix, now measurable on the executed plan.
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numLeftRows" -> SQLMetrics.createSizeMetric(sparkContext, "left input rows per task"),
    "numRightRows" -> SQLMetrics.createSizeMetric(sparkContext, "right input rows per task"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true) ::
      ClusteredDistribution(rightKeys, requireAllClusterKeys = true) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val lo = loUs; val hi = hiUs
    val loS = loStrict; val hiS = hiStrict
    val outer = leftOuter
    val allOut = output
    val numOutputRows = longMetric("numOutputRows")
    val numLeftRows = longMetric("numLeftRows")
    val numRightRows = longMetric("numRightRows")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = GenerateOrdering.create(StructType(
        lKeys.zipWithIndex.map { case (e, i) => StructField(s"k$i", e.dataType, e.nullable) }))
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // lookahead right row (copied — sort iterators reuse their buffers)
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTimeUs: Long = 0L
        // sliding in-band buffer for the CURRENT left key: rows whose time
        // is <= the current left row's upper bound; the head is evicted as
        // the lower bound advances. Both motions are monotone because both
        // inputs are time-sorted — each right row enters and leaves once.
        private val band = new java.util.ArrayDeque[(Long, InternalRow)]()
        private var bandKey: InternalRow = _
        // pending output: the current left row joined to each in-band right,
        // or (left outer) joined once to the all-null right
        private var pendingLeft: InternalRow = _
        private var pendingIt: java.util.Iterator[(Long, InternalRow)] = _
        private var pendingNull: Boolean = false

        private def fetchRight(): Unit = {
          rRow = null
          while (rRow == null && rIter.hasNext) {
            val raw = rIter.next()
            numRightRows += 1
            val k = rKeyProj(raw)
            val t = rTimeProj(raw)
            if (!k.anyNull && !t.isNullAt(0)) {
              rRow = raw.copy(); rKey = k.copy(); rTimeUs = t.getLong(0)
            }
          }
        }

        private def admitUpTo(lKey: InternalRow, upper: Long): Unit = {
          var advancing = true
          while (advancing) {
            if (rRow == null) fetchRight()
            if (rRow == null) advancing = false
            else {
              val cmp = keyOrd.compare(rKey, lKey)
              if (cmp < 0) rRow = null // right is behind this key: discard
              else if (cmp == 0 && (if (hiS) rTimeUs < upper else rTimeUs <= upper)) {
                band.addLast((rTimeUs, rRow)); rRow = null
              } else advancing = false // ahead in key or beyond the band top
            }
          }
        }

        private def advanceLeft(): Unit = {
          pendingLeft = null; pendingIt = null; pendingNull = false
          while (pendingIt == null && !pendingNull && lIter.hasNext) {
            val lRow = lIter.next()
            numLeftRows += 1
            val lKey = lKeyProj(lRow)
            val lt = lTimeProj(lRow)
            if (!lKey.anyNull && !lt.isNullAt(0)) {
              if (bandKey == null || keyOrd.compare(bandKey, lKey) != 0) {
                band.clear(); bandKey = lKey.copy()
              }
              val ltUs = lt.getLong(0)
              admitUpTo(lKey, ltUs + hi)
              // evict rows at/below the lower bound — monotone in ltUs
              while (!band.isEmpty &&
                (if (loS) band.peekFirst()._1 <= ltUs + lo
                 else band.peekFirst()._1 < ltUs + lo)) band.pollFirst()
              if (!band.isEmpty) {
                pendingLeft = lRow.copy()
                pendingIt = band.iterator()
              } else if (outer) {
                pendingLeft = lRow.copy()
                pendingNull = true
              }
            } else if (outer) {
              // null key/time can never match; outer still keeps the row
              pendingLeft = lRow.copy()
              pendingNull = true
            }
          }
        }

        override def hasNext: Boolean = {
          if (pendingNull || (pendingIt != null && pendingIt.hasNext)) true
          else { advanceLeft(); pendingNull || (pendingIt != null && pendingIt.hasNext) }
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          numOutputRows += 1
          if (pendingNull) {
            pendingNull = false
            resultProj(joined(pendingLeft, nullRight))
          } else resultProj(joined(pendingLeft, pendingIt.next()._2))
        }
      }
    }
  }
}

/** Broadcast band join: the ZERO-FACT-SHUFFLE path for dimension-sized
  * right sides (maintenance windows, campaign intervals, rate periods) —
  * the right side ships to every task, each task builds one
  * key → time-sorted-rows index, and every left row resolves its in-band
  * slice by TWO binary searches (lower admissible bound, upper admissible
  * bound). The fact side keeps its partitioning and ordering — map-only,
  * the broadcast-hash analog for the band shape. */
case class BroadcastRangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    loUs: Long,
    hiUs: Long,
    loStrict: Boolean,
    hiStrict: Boolean,
    leftOuter: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  // numLeftRows is a SIZE metric (per-task min/med/max) — the right side is
  // a broadcast, so the left distribution IS the skew story.
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numLeftRows" -> SQLMetrics.createSizeMetric(sparkContext, "left input rows per task"))

  override def requiredChildDistribution: Seq[Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
      org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
        org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode) :: Nil

  // map-only over the left: partitioning and ordering both survive
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val lo = loUs; val hi = hiUs
    val loS = loStrict; val hiS = hiStrict
    val outer = leftOuter
    val allOut = output
    val numOutputRows = longMetric("numOutputRows")
    val numLeftRows = longMetric("numLeftRows")
    val bcast = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions { lIter =>
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      // per-task index from the broadcast rows: key → rows time-sorted, with
      // the parallel long array the binary searches run over
      val index = new scala.collection.mutable.HashMap[
        InternalRow, scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
      bcast.value.foreach { r =>
        val k = rKeyProj(r)
        val t = rTimeProj(r)
        if (!k.anyNull && !t.isNullAt(0)) {
          index.getOrElseUpdate(k.copy(),
            new scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]())
            .append((t.getLong(0), r))
        }
      }
      val built: Map[InternalRow, (Array[Long], Array[InternalRow])] =
        index.iterator.map { case (k, buf) =>
          val sorted = buf.sortBy(_._1)
          k -> (sorted.map(_._1).toArray, sorted.map(_._2).toArray)
        }.toMap

      // first index with times(i) > bound (gt) / >= bound (ge)
      def upperBound(times: Array[Long], bound: Long, strictGt: Boolean): Int = {
        var loI = 0; var hiI = times.length
        while (loI < hiI) {
          val mid = (loI + hiI) >>> 1
          val beyond = if (strictGt) times(mid) > bound else times(mid) >= bound
          if (beyond) hiI = mid else loI = mid + 1
        }
        loI
      }

      lIter.flatMap { lRow =>
        numLeftRows += 1
        def unmatched: Iterator[InternalRow] =
          if (!outer) Iterator.empty
          else { numOutputRows += 1; Iterator.single(resultProj(joined(lRow, nullRight))) }
        val lKey = lKeyProj(lRow)
        val lt = lTimeProj(lRow)
        if (lKey.anyNull || lt.isNullAt(0)) unmatched
        else built.get(lKey) match {
          case None => unmatched
          case Some((times, rows)) =>
            val ltUs = lt.getLong(0)
            // admissible t: (loS ? t > ltUs+lo : t >= ltUs+lo) and
            //               (hiS ? t < ltUs+hi : t <= ltUs+hi)
            val from = upperBound(times, ltUs + lo, strictGt = loS)
            val until = upperBound(times, ltUs + hi, strictGt = !hiS)
            if (from >= until) unmatched
            else {
              val lCopy = lRow.copy()
              (from until until).iterator.map { i =>
                numOutputRows += 1
                resultProj(joined(lCopy, rows(i)))
              }
            }
        }
      }
    }
  }
}

/** Public construction API for the native band join. */
object Band {
  /** Idempotently adds [[RangeJoinStrategy]] to the session's planner (the
    * per-session fallback; `spark.sql.extensions=graft.GraftExtensions` is
    * the production path). */
  def ensureRegistered(s: SparkSession): Unit = synchronized {
    if (!s.experimental.extraStrategies.contains(RangeJoinStrategy))
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ RangeJoinStrategy
  }

  /** Idempotently adds [[BandRewriteRule]] (declarative equi+band theta →
    * [[RangeJoin]]) to the session's optimizer ALONG WITH the planner
    * strategy — always together, so a node the rule produces can always
    * plan. Per-session fallback for the `injectOptimizerRule` line in
    * [[graft.GraftExtensions]]. */
  def ensureOptimized(s: SparkSession): Unit = synchronized {
    ensureRegistered(s)
    if (!s.experimental.extraOptimizations.contains(BandRewriteRule))
      s.experimental.extraOptimizations = s.experimental.extraOptimizations :+ BandRewriteRule
  }

  /** left BAND JOIN right ON keys AND
    * `leftTime + loMicros (<|<=) rightTime (<|<=) leftTime + hiMicros`.
    * Time columns must be TIMESTAMP or LONG (micros); key pairs must be
    * type-identical; right-side column NAMES must not collide with left
    * ones. Self-join inputs are safe (fresh right-side exprIds).
    * `leftOuter = true` keeps every left row — unmatched ones once with
    * nulls on the right (standard outer semantics; null-key/null-time left
    * rows survive unmatched). */
  def join(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
           leftTimeCol: String, rightTimeCol: String,
           loMicros: Long, hiMicros: Long,
           loStrict: Boolean = true, hiStrict: Boolean = false,
           broadcastRight: Option[Boolean] = None,
           leftOuter: Boolean = false): DataFrame = {
    require(loMicros <= hiMicros, s"band join: empty band ($loMicros, $hiMicros)")
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lp = left.queryExecution.analyzed
    val rightDeduped =
      if (right.queryExecution.analyzed.outputSet.intersect(lp.outputSet).nonEmpty) {
        import org.apache.spark.sql.functions.col
        right.select(right.columns.toIndexedSeq.map(c => col(c).alias(c)): _*)
      } else right
    val rp = rightDeduped.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"band join: no column '$n' on the $side side (have ${p.output.map(_.name).mkString(", ")})"))
    val lks = keys.map(k => attr(lp, k._1, "left"))
    val rks = keys.map(k => attr(rp, k._2, "right"))
    lks.zip(rks).foreach { case (a, b) => require(a.dataType == b.dataType,
      s"band join: key type mismatch ${a.name}:${a.dataType} vs ${b.name}:${b.dataType}") }
    val lt = attr(lp, leftTimeCol, "left")
    val rt = attr(rp, rightTimeCol, "right")
    Seq(lt, rt).foreach(t => require(
      t.dataType == TimestampType || t.dataType == LongType,
      s"band join: time columns must be timestamp/long micros, got ${t.dataType}"))
    require(lt.dataType == rt.dataType,
      s"band join: time type mismatch ${lt.dataType} vs ${rt.dataType}")
    PlanBridge.ofRows(spark,
      RangeJoin(lp, rp, lks, rks, lt, rt, loMicros, hiMicros, loStrict, hiStrict,
        broadcastRight, leftOuter))
  }

  /** TIME-SLICED band join — the HOT-KEY mitigation for the native exec
    * (round 14; the round-13 verdict's #2). [[RangeJoinExec]] requires
    * `ClusteredDistribution(keys)` and is invisible to AQE's
    * `OptimizeSkewedJoin` (which only splits stock SMJ/SHJ), so one heavy
    * key — one device's whole history, the usage-data common case — lands
    * on ONE task regardless of cluster size: the sliding buffer bounds
    * MEMORY to band occupancy but not TASK TIME.
    *
    * The fix is declarative salting along the time axis: `floor(time /
    * sliceMicros)` joins the equi-keys. Each LEFT row belongs to exactly
    * one slice; each RIGHT row is replicated into every slice whose left
    * rows could reach it — `floorDiv(rt − hiUs) .. floorDiv(rt − loUs)`,
    * at most ⌈(hiUs − loUs) / sliceMicros⌉ + 1 copies, = 2 when
    * `sliceMicros ≥ hiUs − loUs` (the recommended setting). Because the
    * left side is never duplicated, every output pair is emitted exactly
    * once and the result is VALUE-IDENTICAL to the unsliced join — LEFT
    * OUTER included (an unmatched left row appears once in its slice).
    * A hot key's rows now hash across (key, slice) groups, so per-task
    * input is bounded by the key's densest time slice instead of its whole
    * history — NativeSkewSpec plants a hot key and pins the spread and the
    * equality (boundary times included).
    *
    * Cost: one integer floor-div per left row, ≤ 2× replication of the
    * right side, and the same single co-partitioned shuffle per side. The
    * slice columns are internal and dropped from the output. Times must be
    * TIMESTAMP or LONG micros (the [[join]] contract); the floor-div is
    * exact integer arithmetic (`(t − pmod(t, S)) / S` — the quotient of an
    * exact multiple, never a rounded double), so a row exactly on a slice
    * boundary lands deterministically. */
  def joinSliced(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
                 leftTimeCol: String, rightTimeCol: String,
                 loMicros: Long, hiMicros: Long, sliceMicros: Long,
                 loStrict: Boolean = true, hiStrict: Boolean = false,
                 leftOuter: Boolean = false): DataFrame = {
    require(sliceMicros > 0, s"band join: sliceMicros must be positive, got $sliceMicros")
    import org.apache.spark.sql.Column
    // selective import: functions.{left, right} would shadow the parameters
    import org.apache.spark.sql.functions.{col, explode, lit, pmod, sequence, unix_micros}
    def micros(df: DataFrame, name: String): Column = df.schema(name).dataType match {
      case TimestampType => unix_micros(col(name))
      case LongType => col(name)
      case other => throw new IllegalArgumentException(
        s"band join: time columns must be timestamp/long micros, got $other")
    }
    // exact floor division for longs of any sign: subtract the non-negative
    // pmod remainder, then divide the exact multiple
    def floorDiv(c: Column): Column =
      ((c - pmod(c, lit(sliceMicros))) / lit(sliceMicros)).cast("long")
    val l2 = left.withColumn("__graft_slice_l", floorDiv(micros(left, leftTimeCol)))
    val rt = micros(right, rightTimeCol)
    val r2 = right.withColumn("__graft_slice_r",
      explode(sequence(floorDiv(rt - hiMicros), floorDiv(rt - loMicros))))
    join(l2, r2, keys :+ ("__graft_slice_l" -> "__graft_slice_r"),
        leftTimeCol, rightTimeCol, loMicros, hiMicros, loStrict, hiStrict,
        broadcastRight = Some(false), leftOuter = leftOuter)
      .drop("__graft_slice_l", "__graft_slice_r")
  }
}
