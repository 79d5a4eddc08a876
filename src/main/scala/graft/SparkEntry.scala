package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

import scala.collection.immutable.ListMap

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator lives in graft.ops.<Category>Ops as an [[graft.ops.Op]]
  * (query key, Spark program, optional DuckDB oracle SQL); this object only
  * assembles the maps. ListMap keeps a deliberate iteration order so Bench
  * pays JVM/codegen warm-up on the cheapest scan query first.
  */
object SparkEntry {

  private def allOps: Seq[Op] =
    ScanFilterOps.all ++ SourceSinkOps.all ++ AggOps.all ++ JoinOps.all ++ StarOps.all ++
      SubqueryOps.all ++ WindowOps.all ++ SkewOps.all ++
      TimeSeriesOps.all ++ AnalyticsOps.all ++ BillingOps.all ++ SortSetOps.all ++ FuncOps.all ++ LlmOps.all ++
      TextOps.all ++ PipelineOps.all ++ MultimodalOps.all ++ StreamingOps.all ++ StatsOps.all ++
      DqOps.all ++ GraphOps.all ++ GeoOps.all ++ HierarchyOps.all ++ PlanSurfaceOps.all ++
      SqlSurfaceOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggOps.aggPricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(allOps.map(o => o.key -> o.fn): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allOps.flatMap(o => o.oracle.map(sql => o.key -> sql)).toMap
}
