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
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The native as-of join — SURVEY.md §2 C's as-of semantics as a first-class
  * Catalyst operator instead of the union/forward-fill rewrite
  * (ops/JoinOps.scala `join_asof`): custom [[LogicalPlan]] node → planner
  * [[SparkStrategy]] → sort-merge [[AsofJoinExec]], the extension path (c)
  * from the build contract.
  *
  * Semantics (LEFT OUTER AS-OF): for every left row, attach the single right
  * row with equal join keys and the greatest right-time `< leftTime`
  * (`<= leftTime` when `strict = false`); left rows with no such match keep
  * nulls on the right. Right rows with a null key or null time can never
  * match (SQL equi-join null semantics) and are discarded on first contact;
  * left null-key rows pass through unmatched.
  *
  * Scale shape: each side shuffles ONCE on its join keys
  * ([[ClusteredDistribution]] with `requireAllClusterKeys = true`, so the two
  * children are co-partitioned exactly like a shuffled join) and sorts by
  * (keys, time); the merge itself is a single forward pass per partition with
  * O(1) carried state (one lookahead row + one best-so-far candidate). No
  * window buffering, no union-schema widening, no pair space — the identical
  * cost envelope to a sort-merge join at any corpus width, and both shuffles
  * are AQE-coalesced like any other exchange.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean,
    rightTiebreak: Seq[Expression],
    broadcastRight: Option[Boolean] = None,
    toleranceUs: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: [[AsofJoin]] logical node → physical as-of join, making
  * the same broadcast-vs-shuffle decision Spark's `JoinSelection` makes for
  * equi-joins: an explicit `broadcastRight` hint wins; otherwise the right
  * side broadcasts when its estimated size fits
  * `spark.sql.autoBroadcastJoinThreshold`, else both sides shuffle into the
  * sort-merge [[AsofJoinExec]]. Registered per-session via
  * [[Asof.ensureRegistered]] (`experimental.extraStrategies`, the public
  * hook) and globally via [[graft.GraftExtensions]]
  * (`injectPlannerStrategy`). */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ AsofJoin(l, r, lk, rk, lt, rt, strict, tb, bc, tol) =>
      val threshold = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val broadcast = bc.getOrElse(
        threshold > 0 && r.stats.sizeInBytes >= 0 && r.stats.sizeInBytes <= threshold)
      if (broadcast)
        BroadcastAsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, strict, tb, tol) :: Nil
      else
        AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, strict, tb, tol) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: children arrive hash-clustered on the join keys and
  * sorted by (keys, time); one merge pass per partition emits every left row
  * joined to its latest-prior right row. The right lookahead row and the
  * per-key best candidate are the only copies made — everything else streams
  * through the sort iterators. */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean,
    rightTiebreak: Seq[Expression],
    toleranceUs: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Input-row metrics are SIZE metrics on purpose: the UI then reports the
  // per-task min/med/max beside the total, which is exactly the post-hoc
  // skew signal the sliced variants exist to fix — a hot key shows up as
  // max >> med on the executed plan, not only in a spec fixture.
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numLeftRows" -> SQLMetrics.createSizeMetric(sparkContext, "left input rows per task"),
    "numRightRows" -> SQLMetrics.createSizeMetric(sparkContext, "right input rows per task"))

  // Exactly a shuffled join's contract: both sides clustered on ALL their
  // keys so partition i of the left can only ever need partition i of the
  // right (requireAllClusterKeys pins the full-key hash, ruling out the
  // subset-clustering mismatch).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true) ::
      ClusteredDistribution(rightKeys, requireAllClusterKeys = true) :: Nil

  // The right side additionally sorts by the caller's tiebreak columns, so
  // among right rows tied on (keys, time) the LAST in sort order — i.e. the
  // max tiebreak — deterministically wins the candidate slot. Without it a
  // tie would surface whatever order the sort happened to leave.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    (rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending)) ++
      rightTiebreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    // local copies: the closure must not capture the (non-serializable) plan
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val strictLocal = strict
    val tolLocal = toleranceUs
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
      val timeOrd = GenerateOrdering.create(StructType(
        Seq(StructField("t", lTime.dataType, lTime.nullable))))
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // lookahead right row (copied — sort iterators reuse their buffers)
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTimeRow: InternalRow = _
        // best match so far for the current left key (+ its time in micros
        // for the bounded-lookback check; the time type is long-backed —
        // enforced by Asof.join when a tolerance is set)
        private var cand: InternalRow = _
        private var candKey: InternalRow = _
        private var candTimeUs: Long = 0L

        private def fetchRight(): Unit = {
          rRow = null
          while (rRow == null && rIter.hasNext) {
            val raw = rIter.next()
            numRightRows += 1
            val k = rKeyProj(raw)
            val t = rTimeProj(raw)
            // null key or null time can never match anything: drop here so
            // the merge below only ever reasons about comparable rows
            if (!k.anyNull && !t.isNullAt(0)) {
              rRow = raw.copy(); rKey = k.copy(); rTimeRow = t.copy()
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          numLeftRows += 1
          val lKey = lKeyProj(lRow)
          if (lKey.anyNull) {
            numOutputRows += 1
            resultProj(joined(lRow, nullRight))
          } else {
            if (cand != null && keyOrd.compare(candKey, lKey) != 0) cand = null
            val lTimeRow = lTimeProj(lRow)
            var advancing = true
            while (advancing) {
              if (rRow == null) fetchRight()
              if (rRow == null) advancing = false
              else {
                val cmp = keyOrd.compare(rKey, lKey)
                if (cmp < 0) rRow = null // right is behind this key: discard
                else if (cmp == 0) {
                  val tCmp = timeOrd.compare(rTimeRow, lTimeRow)
                  if (tCmp < 0 || (!strictLocal && tCmp == 0)) {
                    // admissible and later than any previous admissible row
                    // (right side is time-sorted) → new best candidate
                    cand = rRow; candKey = rKey
                    candTimeUs = rTimeRow.getLong(0)
                    rRow = null
                  } else advancing = false
                } else advancing = false // right is ahead: keep as lookahead
              }
            }
            // bounded lookback: the kept candidate is the MAX admissible
            // time for this key, so if IT is older than (leftTime - tol)
            // every other admissible row is too — emit unmatched
            val inWindow = cand != null && tolLocal.forall(t =>
              candTimeUs >= lTimeRow.getLong(0) - t)
            numOutputRows += 1
            resultProj(joined(lRow, if (inWindow) cand else nullRight))
          }
        }
      }
    }
  }
}

/** Broadcast as-of join: the ZERO-FACT-SHUFFLE path for dimension-sized
  * right sides — the version/quote table ships to every task
  * (IdentityBroadcastMode, the same exchange BroadcastNestedLoopJoin uses),
  * each task builds one key → time-sorted-rows index from it, and every left
  * row resolves by binary search. The fact side keeps its partitioning AND
  * its ordering untouched — at 100 TB this is the difference between
  * re-shuffling the corpus and a map-only pass, exactly as with
  * broadcast-hash vs sort-merge equi-joins. */
case class BroadcastAsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean,
    rightTiebreak: Seq[Expression],
    toleranceUs: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // numLeftRows is a SIZE metric (per-task min/med/max in the UI) — the
  // right side is a broadcast, so the left distribution IS the skew story.
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
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val tiebreak = rightTiebreak
    val strictLocal = strict
    val tolLocal = toleranceUs
    val allOut = output
    val numOutputRows = longMetric("numOutputRows")
    val numLeftRows = longMetric("numLeftRows")
    val bcast = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions { lIter =>
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val rSortProj = UnsafeProjection.create(rTime +: tiebreak, rOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val sortOrd = GenerateOrdering.create(StructType(
        (rTime +: tiebreak).zipWithIndex.map { case (e, i) =>
          StructField(s"s$i", e.dataType, e.nullable) }))
      val timeOrd = GenerateOrdering.create(StructType(
        Seq(StructField("t", lTime.dataType, lTime.nullable))))
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      // per-task index build from the broadcast rows: key → rows sorted by
      // (time, tiebreak), plus the parallel array of time-only keys the
      // binary search compares against — built once, dim-sized
      val index = new scala.collection.mutable.HashMap[
        InternalRow, scala.collection.mutable.ArrayBuffer[(InternalRow, InternalRow)]]()
      bcast.value.foreach { r =>
        val k = rKeyProj(r)
        val t = rTimeProj(r)
        if (!k.anyNull && !t.isNullAt(0)) {
          index.getOrElseUpdate(k.copy(),
            new scala.collection.mutable.ArrayBuffer[(InternalRow, InternalRow)]())
            .append((rSortProj(r).copy(), r))
        }
      }
      val built: Map[InternalRow, (Array[InternalRow], Array[InternalRow])] =
        index.iterator.map { case (k, buf) =>
          val sorted = buf.sortWith((a, b) => sortOrd.compare(a._1, b._1) < 0)
          val rows = sorted.map(_._2).toArray
          val times = rows.map(r => rTimeProj(r).copy(): InternalRow)
          k -> (rows, times)
        }.toMap

      lIter.map { lRow =>
        numLeftRows += 1
        val lKey = lKeyProj(lRow)
        val matched: InternalRow =
          if (lKey.anyNull) nullRight
          else built.get(lKey) match {
            case None => nullRight
            case Some((rows, times)) =>
              val lt = lTimeProj(lRow)
              // first index whose time is inadmissible (>= lt strict, > lt
              // inclusive); the candidate is the element just before it —
              // the max admissible time, max tiebreak within equal times
              var lo = 0
              var hi = rows.length
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                val c = timeOrd.compare(times(mid), lt)
                val admissible = c < 0 || (!strictLocal && c == 0)
                if (admissible) lo = mid + 1 else hi = mid
              }
              // bounded lookback mirrors the sort-merge path: the found row
              // has the max admissible time, so the window check on it alone
              // is exhaustive
              if (lo > 0 && tolLocal.forall(t =>
                times(lo - 1).getLong(0) >= lt.getLong(0) - t)) rows(lo - 1)
              else nullRight
          }
        numOutputRows += 1
        resultProj(joined(lRow, matched))
      }
    }
  }
}

/** Public construction API for the native as-of join. */
object Asof {
  /** Idempotently adds [[AsofJoinStrategy]] to the session's planner via the
    * public `experimental.extraStrategies` hook (the per-session fallback;
    * `spark.sql.extensions=graft.GraftExtensions` is the production path). */
  def ensureRegistered(s: SparkSession): Unit = synchronized {
    if (!s.experimental.extraStrategies.contains(AsofJoinStrategy))
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ AsofJoinStrategy
  }

  /** left AS-OF JOIN right ON keys AND right.timeCol is the greatest value
    * `<` (strict) / `<=` (non-strict) left.timeCol. Key pairs and the two
    * time columns must be type-identical; right-side columns must not share
    * a NAME with left-side ones (the output carries both sides' columns).
    * Self-join inputs are safe: overlapping attribute ids on the right are
    * re-aliased to fresh ids before the plan is assembled. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
           leftTimeCol: String, rightTimeCol: String,
           strict: Boolean = true, tiebreakCols: Seq[String] = Nil,
           broadcastRight: Option[Boolean] = None,
           toleranceMicros: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lp = left.queryExecution.analyzed
    // fresh exprIds on the right when both sides descend from the same scan
    // (the analyzer's DeduplicateRelations never sees this plan)
    val rightDeduped =
      if (right.queryExecution.analyzed.outputSet.intersect(lp.outputSet).nonEmpty) {
        import org.apache.spark.sql.functions.col
        right.select(right.columns.toIndexedSeq.map(c => col(c).alias(c)): _*)
      } else right
    val rp = rightDeduped.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"as-of join: no column '$n' on the $side side (have ${p.output.map(_.name).mkString(", ")})"))
    val lks = keys.map(k => attr(lp, k._1, "left"))
    val rks = keys.map(k => attr(rp, k._2, "right"))
    lks.zip(rks).foreach { case (a, b) => require(a.dataType == b.dataType,
      s"as-of join: key type mismatch ${a.name}:${a.dataType} vs ${b.name}:${b.dataType}") }
    val lt = attr(lp, leftTimeCol, "left")
    val rt = attr(rp, rightTimeCol, "right")
    require(lt.dataType == rt.dataType,
      s"as-of join: time type mismatch ${lt.dataType} vs ${rt.dataType}")
    val tb = tiebreakCols.map(attr(rp, _, "right"))
    toleranceMicros.foreach { t =>
      require(t >= 0, "as-of join: tolerance must be non-negative")
      require(Seq(lt.dataType, rt.dataType).forall(d =>
        d == org.apache.spark.sql.types.TimestampType ||
          d == org.apache.spark.sql.types.LongType),
        s"as-of join: tolerance requires timestamp/long time columns, got ${lt.dataType}")
    }
    PlanBridge.ofRows(spark,
      AsofJoin(lp, rp, lks, rks, lt, rt, strict, tb, broadcastRight, toleranceMicros))
  }

  /** TIME-SLICED as-of join — the hot-key mitigation ([[graft.plans.Band.joinSliced]]'s
    * idiom applied to the as-of shape; round-13 verdict #2). Requires a
    * TOLERANCE: an unbounded as-of needs the latest prior row arbitrarily
    * far back, which no time partition can localize — but production
    * pipelines bound staleness anyway (a quote older than the tolerance is
    * not a usable match), and the bounded form slices exactly like the band
    * join. `floor(time / sliceMicros)` joins the equi-keys: each left row
    * keeps its one slice; each right row is replicated into the slices
    * whose left rows could match it (`floorDiv(rt) .. floorDiv(rt + tol)`,
    * ≤ 2 copies at slice ≥ tolerance). Every tolerance-eligible right row
    * for a given left row is present in that left row's slice, so the
    * per-slice as-of picks the SAME latest-prior match as the global one,
    * and the left side's once-emission (matched or null) is preserved —
    * value-identical, NativeSkewSpec pins it on the planted-skew fixture.
    * A hot key's task input drops from its whole history to its densest
    * slice. */
  def joinSliced(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
                 leftTimeCol: String, rightTimeCol: String,
                 toleranceMicros: Long, sliceMicros: Long,
                 strict: Boolean = true, tiebreakCols: Seq[String] = Nil): DataFrame = {
    require(toleranceMicros >= 0, s"as-of join: tolerance must be non-negative")
    require(sliceMicros > 0, s"as-of join: sliceMicros must be positive, got $sliceMicros")
    import org.apache.spark.sql.Column
    // selective import: functions.{left, right} would shadow the parameters
    import org.apache.spark.sql.functions.{col, explode, lit, pmod, sequence, unix_micros}
    def micros(df: DataFrame, name: String): Column = df.schema(name).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(name))
      case org.apache.spark.sql.types.LongType => col(name)
      case other => throw new IllegalArgumentException(
        s"as-of join: sliced time columns must be timestamp/long micros, got $other")
    }
    def floorDiv(c: Column): Column =
      ((c - pmod(c, lit(sliceMicros))) / lit(sliceMicros)).cast("long")
    val l2 = left.withColumn("__graft_slice_l", floorDiv(micros(left, leftTimeCol)))
    val rtc = micros(right, rightTimeCol)
    val r2 = right.withColumn("__graft_slice_r",
      explode(sequence(floorDiv(rtc), floorDiv(rtc + toleranceMicros))))
    join(l2, r2, keys :+ ("__graft_slice_l" -> "__graft_slice_r"),
        leftTimeCol, rightTimeCol, strict, tiebreakCols,
        broadcastRight = Some(false), toleranceMicros = Some(toleranceMicros))
      .drop("__graft_slice_l", "__graft_slice_r")
  }
}
