package graft

import graft.functions.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

/** Native expressions: SQL surface, correctness, and the extensions hook. */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_dot evaluates correctly from SQL and matches the HOF fold") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d").collect()
    assert(r(0).getDouble(0) == 32.0)
    // matches the higher-order-function spelling bit-for-bit on real data
    val cmp = spark.sql(
      "SELECT sum(CASE WHEN graft_dot(v, v) = aggregate(zip_with(v, v, (x, y) -> x * y), 0d, (a, x) -> a + x) THEN 0 ELSE 1 END) AS bad " +
      s"FROM (SELECT transform(embedding, x -> cast(x AS double)) AS v FROM parquet.`${TestSpark.sf0001}/embeddings.parquet`)")
      .collect()(0).getLong(0)
    assert(cmp == 0L)
  }

  test("graft_minhash_sig and graft_simhash64 run from SQL, deterministic") {
    GraftFunctions.register(spark)
    val a = spark.sql("SELECT graft_minhash_sig(array(1L, 2L, 3L), 8) AS s, graft_simhash64(array(1L, 2L, 3L)) AS h")
      .collect()(0)
    val b = spark.sql("SELECT graft_minhash_sig(array(1L, 2L, 3L), 8) AS s, graft_simhash64(array(1L, 2L, 3L)) AS h")
      .collect()(0)
    assert(a.toString == b.toString)
    assert(a.getSeq[Long](0).length == 8)
  }

  test("graft_dot stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = spark.sql(
      s"SELECT graft_dot(transform(embedding, x -> cast(x AS double)), transform(embedding, x -> cast(x AS double))) AS n " +
      s"FROM parquet.`${TestSpark.sf0001}/embeddings.parquet`")
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"))
  }

  test("space-saving sketch: overestimate + guaranteed-hitter invariants under eviction") {
    import graft.functions.SpaceSavingSketch
    // capacity 4 over 8 distinct items forces evictions; item 'hot' carries
    // 40 of N=75 occurrences (> N/capacity ≈ 18.75) so Space-Saving
    // GUARANTEES it stays tracked no matter the arrival order.
    val stream = Seq.fill(40)("hot") ++
      (1 to 7).flatMap(i => Seq.fill(5)(s"cold$i"))
    // adversarial order: all cold items first, hot last
    val sk = new SpaceSavingSketch(4)
    (stream.reverse).foreach(sk.add)
    assert(sk.items.contains("hot"), "guaranteed heavy hitter evicted")
    assert(sk.items.size <= 4)
    // overestimate invariant: tracked count >= true count
    assert(sk.counts("hot") >= 40L)

    // merge across "partitions" preserves both invariants
    val parts = stream.grouped(15).toSeq.map { chunk =>
      val p = new SpaceSavingSketch(4); chunk.foreach(p.add); p
    }
    val merged = parts.reduce { (a, b) => a.merge(b); a }
    assert(merged.items.contains("hot"), "hitter lost in merge")
    assert(merged.counts("hot") >= 40L, "merge broke the overestimate invariant")

    // serialization round trip is lossless
    val rt = SpaceSavingSketch.fromBytes(merged.toBytes)
    assert(rt.items == merged.items && rt.counts == merged.counts && rt.errs == merged.errs)
  }

  test("graft_heavy_hitters runs from SQL as an aggregate") {
    val spark = TestSpark.spark
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val out = (Seq.fill(30)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("x")
      .repartition(4)
      .createOrReplaceTempView("hh_in")
    val cands = spark.sql("SELECT graft_heavy_hitters(x, 2) AS c FROM hh_in")
      .collect().head.getSeq[String](0)
    assert(cands.contains("a"), s"dominant item missing from $cands")
    assert(cands.size <= 2)
  }

  test("GraftExtensions injects the functions into a fresh extensions set") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders validated above
  }
}
