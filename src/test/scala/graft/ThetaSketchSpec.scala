package graft

import graft.functions.{GraftFunctions => F}
import graft.ops.AggOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Theta distinct-set sketches (functions/ThetaSketch.scala +
  * agg_theta_setops): exact-mode equality, set algebra on known sets, and
  * the merge-order/partitioning invariance the determinism matrix relies
  * on. */
class ThetaSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact mode: estimates equal true distinct counts on known sets") {
    F.register(spark)
    // A = {0..99}, B = {50..149}: |A|=100 |B|=100 |A∪B|=150 |A∩B|=50 |A\B|=50
    val df = (0L to 149L).map(i => (if (i < 100) "a" else "z", i))
      .toDF("tag", "v")
      .withColumn("inA", col("v") < 100)
      .withColumn("inB", col("v") >= 50)
    val ska = df.where(col("inA")).agg(F.thetaSketch(col("v"), 12).as("sk"))
      .select("sk").as[Array[Byte]].head()
    val skb = df.where(col("inB")).agg(F.thetaSketch(col("v"), 12).as("sk"))
      .select("sk").as[Array[Byte]].head()
    val r = Seq((ska, skb)).toDF("ska", "skb").select(
      F.thetaEstimate(col("ska")).as("a"),
      F.thetaEstimate(col("skb")).as("b"),
      F.thetaEstimate(F.thetaUnion(col("ska"), col("skb"), 12)).as("u"),
      F.thetaEstimate(F.thetaIntersect(col("ska"), col("skb"))).as("i"),
      F.thetaEstimate(F.thetaAnotB(col("ska"), col("skb"))).as("anb")).head()
    assert(r.getDouble(0) == 100.0 && r.getDouble(1) == 100.0)
    assert(r.getDouble(2) == 150.0 && r.getDouble(3) == 50.0 && r.getDouble(4) == 50.0)
  }

  test("sketch bytes are identical across shuffle partitionings (merge-order invariance)") {
    F.register(spark)
    def bytes(parts: String): Seq[Byte] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try graft.tables.Tables.events(spark, TestSpark.sf0001)
        .repartition(parts.toInt)
        .agg(F.thetaSketch(col("user_id"), 14).as("sk"))
        .select("sk").as[Array[Byte]].head().toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val ref = bytes("4")
    assert(bytes("1") == ref, "parts=1 produced different sketch bytes")
    assert(bytes("7") == ref, "parts=7 produced different sketch bytes")
  }

  test("agg_theta_setops: estimates exactly match exact counts at test scale") {
    val rows = AggOps.aggThetaSetops.fn(spark, TestSpark.sf0001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getLong(2).toDouble,
        s"${r.getString(0)}: approx ${r.getDouble(1)} != exact ${r.getLong(2)} (exact mode)")
    }
  }
}
