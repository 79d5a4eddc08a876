package graft

import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The planning half of `stats_collect` — proves collected statistics
  * actually change the plan (SURVEY §4.2, the one Catalyst surface the suite
  * never drove before round 9):
  *
  *  1. ANALYZE'd catalog tables expose rowCount to the optimizer under CBO.
  *  2. A selective equality filter on an ANALYZE'd column shrinks the CBO
  *     cardinality estimate enough to flip a join from sort-merge (file-size
  *     estimate above the broadcast threshold) to broadcast-hash — the
  *     stats-informed decision that matters most at 100 TB, where
  *     broadcasting a mis-estimated big side kills the job.
  *  3. The HLL sketch NDV (`agg_hll_mergeable`'s machinery) lands within 5 %
  *     of `stats_collect`'s exact NDV on the same columns — the documented
  *     plug-in swap for the 100 TB collection pass.
  */
class StatsCboSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("CBO + column stats flip a filtered join from sort-merge to broadcast") {
    val run = java.lang.Long.toHexString(System.nanoTime())
    val fact = s"cbo_fact_$run"
    val dim = s"cbo_dim_$run"
    val base = java.nio.file.Files.createTempDirectory("graft_cbo")
    val conf = spark.conf
    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k)).toMap
    try {
      graft.ops.Housekeeping.tablesBounded(spark, Seq(fact, dim), base)
      Tables.lineitem(spark, TestSpark.sf001)
        .select("l_orderkey", "l_partkey", "l_quantity")
        .write.option("path", base.resolve(fact).toString).saveAsTable(fact)
      Tables.part(spark, TestSpark.sf001)
        .write.option("path", base.resolve(dim).toString).saveAsTable(dim)
      spark.sql(s"ANALYZE TABLE $fact COMPUTE STATISTICS FOR ALL COLUMNS")
      spark.sql(s"ANALYZE TABLE $dim COMPUTE STATISTICS FOR ALL COLUMNS")

      // the dim's size estimate (file bytes scaled by column pruning, NOT
      // reduced by the filter — SizeInBytesOnly visitors pass filters
      // through) must exceed the broadcast threshold, so WITHOUT CBO the
      // planner must sort-merge; CBO's filter estimation (1/ndv selectivity
      // from the ANALYZE'd column) shrinks it to ~1 row
      conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
      val pk = spark.table(dim).agg(min(col("p_partkey"))).first().getLong(0)
      def plan = {
        val df = spark.table(fact).join(spark.table(dim), col("l_partkey") === col("p_partkey"))
          .where(col("p_partkey") === pk)
          .groupBy("p_partkey").agg(sum(col("l_quantity")).as("q"))
        df.queryExecution.sparkPlan.toString // pre-AQE physical plan
      }

      conf.set("spark.sql.cbo.enabled", "false")
      val without = plan
      assert(without.contains("SortMergeJoin") && !without.contains("BroadcastHashJoin"),
        s"without CBO the dim should exceed the broadcast threshold:\n$without")

      conf.set("spark.sql.cbo.enabled", "true")
      conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val withCbo = plan
      assert(withCbo.contains("BroadcastHashJoin"),
        s"CBO filter estimation should shrink the dim below the threshold:\n$withCbo")

      // rowCount is actually visible to the optimizer under CBO
      val rc = spark.table(dim).queryExecution.optimizedPlan.stats.rowCount
      assert(rc.exists(_.longValue == spark.table(dim).count()),
        s"catalog rowCount missing or wrong under CBO: $rc")
    } finally {
      saved.foreach { case (k, v) => conf.set(k, v) }
      spark.sql(s"DROP TABLE IF EXISTS $fact")
      spark.sql(s"DROP TABLE IF EXISTS $dim")
    }
  }

  test("histogram bins conserve mass and stay inside [0, 9]") {
    val rows = graft.ops.StatsOps.statsHistogram.fn(TestSpark.spark, TestSpark.sf001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    graft.ops.Housekeeping.releaseAll()

    assert(rows.forall(r => r._3 >= 0 && r._3 <= 9), "bin index range")
    val byCol = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._4).sum).toMap
    graft.ops.StatsOps.histCols.foreach { case (t, c) =>
      val n = (t match {
        case "lineitem" => Tables.lineitem(TestSpark.spark, TestSpark.sf001)
        case "orders" => Tables.orders(TestSpark.spark, TestSpark.sf001)
      }).count()
      assert(byCol((t, c)) == n, s"histogram of $t.$c must cover every row exactly once")
    }
  }

  test("HLL sketch NDV is within 5% of stats_collect's exact NDV") {
    import graft.ops.StatsOps
    val d = TestSpark.sf001
    StatsOps.statCols.foreach { case (t, cols) =>
      val exact = StatsOps.tableStats(spark, d, t, cols)
        .select("column_name", "ndv").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      cols.foreach { c =>
        val table = t match {
          case "customer" => Tables.customer(spark, d)
          case "lineitem" => Tables.lineitem(spark, d)
          case "orders" => Tables.orders(spark, d)
        }
        val approx = table
          .agg(hll_sketch_estimate(hll_sketch_agg(col(c), lit(12))).as("a"))
          .first().getLong(0)
        val err = math.abs(approx.toDouble - exact(c)) / math.max(1.0, exact(c).toDouble)
        assert(err <= 0.05, s"$t.$c: sketch ndv $approx vs exact ${exact(c)} (err $err)")
      }
    }
  }

  test("stats_corr_exact components match a driver-side exact recompute") {
    import spark.implicits._
    val got = graft.ops.StatsOps.statsCorrExact.fn(spark, TestSpark.sf0001)
      .select("l_returnflag", "pair", "n", "cov_num", "var_x_num", "var_y_num")
      .collect()
      // the moments leave the op as VARCHAR (the >18-digit-DECIMAL hash
      // envelope rule); the integer-string rendering parses back exactly
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), new java.math.BigInteger(r.getString(3)),
          new java.math.BigInteger(r.getString(4)),
          new java.math.BigInteger(r.getString(5)))).toMap
    assert(got.nonEmpty)
    for (((xc, yc)) <- graft.ops.StatsOps.corrPairs) {
      val rows = Tables.lineitem(spark, TestSpark.sf0001)
        .select(col("l_returnflag"),
          (col(xc).cast(graft.ops.Dets.D12_2) * 100).cast("long"),
          (col(yc).cast(graft.ops.Dets.D12_2) * 100).cast("long"))
        .as[(String, Long, Long)].collect()
      rows.groupBy(_._1).foreach { case (flag, grp) =>
        val n = BigInt(grp.length)
        val sx = grp.map(r => BigInt(r._2)).sum; val sy = grp.map(r => BigInt(r._3)).sum
        val sxy = grp.map(r => BigInt(r._2) * BigInt(r._3)).sum
        val sxx = grp.map(r => BigInt(r._2) * BigInt(r._2)).sum
        val syy = grp.map(r => BigInt(r._3) * BigInt(r._3)).sum
        val (gn, gcov, gvx, gvy) = got((flag, s"$xc:$yc"))
        assert(BigInt(gn) == n, s"$flag $xc:$yc n")
        assert(BigInt(gcov) == n * sxy - sx * sy, s"$flag $xc:$yc cov_num")
        assert(BigInt(gvx) == n * sxx - sx * sx, s"$flag $xc:$yc var_x_num")
        assert(BigInt(gvy) == n * syy - sy * sy, s"$flag $xc:$yc var_y_num")
        // Cauchy–Schwarz: cov² ≤ varx·vary — violated only by an arithmetic bug
        assert((n * sxy - sx * sy).pow(2) <= (n * sxx - sx * sx) * (n * syy - sy * sy))
      }
    }
  }
}
