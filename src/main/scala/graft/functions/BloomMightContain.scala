package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a pre-built Bloom filter
  * over a BIGINT key column, with whole-stage-codegen support. The filter
  * arrives serialized as a foldable BINARY literal (the `spark.util.sketch`
  * wire format), so the function composes through the ordinary registry like
  * every other graft_* expression and an oracle-able query can embed it.
  *
  * Why custom (SURVEY §4.3): Spark's own runtime Bloom pruning
  * (`InjectRuntimeFilter`) only fires when the optimizer sees both sides of
  * ONE join and its size gates pass. The explicit form covers what the
  * optimizer cannot see: a key-set filter built in one job/stage and applied
  * in another (a standing dim key-set probed by tomorrow's fact load). A UDF
  * spelling would leave whole-stage codegen and box every key; this
  * expression deserializes the sketch ONCE per plan (transient lazy, shipped
  * to executors via `ctx.addReferenceObj` like a broadcast hash relation)
  * and probes it inside the generated loop.
  *
  * The literal's size is set by the BUILDER's `expectedNumItems`/`fpp`, not
  * by fact volume — a 1M-key 1% filter is ~1.2 MB, a bounded driver artifact.
  *
  * Correctness: Bloom filters have NO false negatives, so a prefilter keeps
  * every true match; the exact join that follows removes false positives —
  * end-to-end results are exactly the unfiltered join's (which is what the
  * DuckDB oracle runs).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) if right.foldable => TypeCheckResult.TypeCheckSuccess
      case (LongType, BinaryType) => TypeCheckResult.TypeCheckFailure(
        "graft_bloom_might_contain: the serialized filter must be a literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_might_contain requires (bigint key, binary filter), got ($l, $r)")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(
      new ByteArrayInputStream(right.eval().asInstanceOf[Array[Byte]]))

  override protected def nullSafeEval(k: Any, ignoredBytes: Any): Any =
    bloom.mightContainLong(k.asInstanceOf[Long])

  /** Generates a probe against the ONCE-deserialized filter (shipped via the
    * codegen references array) — the bytes literal never re-evaluates per
    * row. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    val key = left.genCode(ctx)
    ev.copy(code =
      code"""
        ${key.code}
        boolean ${ev.isNull} = ${key.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.mightContainLong(${key.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
