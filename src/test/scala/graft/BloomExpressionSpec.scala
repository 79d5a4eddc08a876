package graft

import java.io.ByteArrayOutputStream

import graft.functions.{BloomMightContain, GraftFunctions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom-probe expression's load-bearing guarantee is NO FALSE
  * NEGATIVES — a dropped true match would silently corrupt the prefiltered
  * join, and no downstream exact join can restore it. Exercise it on BOTH
  * evaluation paths (the interpreted `eval` and the codegen'd DataFrame
  * filter), plus the null and type-error contracts.
  */
class BloomExpressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def filterFor(keys: Seq[Long]): Array[Byte] = {
    val bf = BloomFilter.create(math.max(keys.size, 1000), 0.01)
    keys.foreach(bf.putLong)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("no false negatives on the interpreted eval path (10k seeded random keys)") {
    val rnd = new scala.util.Random(42)
    val keys = Seq.fill(10000)(rnd.nextLong())
    val expr = BloomMightContain(
      BoundReference(0, LongType, nullable = true),
      Literal(filterFor(keys), BinaryType))
    keys.foreach { k =>
      assert(expr.eval(InternalRow(k)) == true, s"inserted key $k must probe true")
    }
    assert(expr.eval(InternalRow(null)) == null, "null key probes null")
  }

  test("no false negatives through the codegen'd DataFrame filter") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val keys = Seq.fill(5000)(rnd.nextLong())
    val bytes = filterFor(keys)
    import spark.implicits._
    val kept = keys.toDF("k")
      .filter(GraftFunctions.bloomMightContain(col("k"), bytes))
      .count()
    assert(kept == keys.distinct.size.toLong,
      "every inserted key must survive the prefilter")
  }

  test("rejects non-literal filters and non-bigint keys at analysis time") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val bytes = filterFor(Seq(1L, 2L))
    val e1 = intercept[Exception] {
      Seq(("a", 1L)).toDF("s", "k")
        .filter(call_function("graft_bloom_might_contain", col("s"), lit(bytes)))
        .collect()
    }
    assert(e1.getMessage.contains("graft_bloom_might_contain"))
    val e2 = intercept[Exception] {
      Seq((1L, 2L)).toDF("k", "b")
        .filter(call_function("graft_bloom_might_contain", col("k"), col("b")))
        .collect()
    }
    assert(e2.getMessage.contains("graft_bloom_might_contain"))
  }
}
