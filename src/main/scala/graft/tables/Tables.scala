package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-pinned loaders for the driver-generated testdata tables
  * (TESTDATA.md / FIXTURES.md §1). One loader per table so every operator
  * reads through the same, audited path.
  *
  * Scale note (100 TB): these are plain parquet scans, so Catalyst predicate
  * pushdown / column pruning applied by downstream operators reaches the file
  * scan unchanged. On a real cluster the same loaders would point at a
  * partitioned (e.g. day-partitioned) table root and partition pruning would
  * compose for free; nothing here materializes or collects.
  */
object Tables {

  // NOTE on timestamp physical output: TimestampType (LTZ) columns write as
  // legacy INT96 parquet under Spark's defaults. That is deliberate here:
  // DuckDB (and pyarrow) read INT96 as a *naive* timestamp, exactly matching
  // the oracle side's naive values. Forcing TIMESTAMP_MICROS instead writes
  // tz-annotated int64, which DuckDB surfaces as TIMESTAMPTZ and the compare
  // breaks — and an NTZ cast upstream is impossible because streaming
  // watermarks and unix_micros require TimestampType. Verified empirically
  // at sf0.001/0.01/0.1 (preflight 76/76 with INT96; 64/76 with µs).
  private def p(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = p(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = p(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = p(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = p(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = p(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = p(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = p(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = p(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = p(s, d, "embeddings")

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(MICROS,
    * isAdjustedToUTC=false), which Spark 4.1.2 infers as TIMESTAMP_NTZ.
    * Downstream operators need TimestampType (LTZ) — watermarks,
    * `unix_micros`, `window()` all require it — so the shared loader casts
    * once here. The session timezone is pinned to UTC everywhere
    * (GraftSession/Verify/Bench), making the NTZ→LTZ cast value-identical to
    * the file's naive micros — exactly the naive values DuckDB reads from
    * the same file, which is what the oracle compares against.
    *
    * (Earlier testdata generations wrote TIMESTAMP(NANOS); the former
    * nanosAsLong floor-division shim lived here. The driver's 2026-08-13
    * regeneration moved the files to plain micros, so the shim is gone —
    * this cast is the single events-specific read-path adaptation left.)
    */
  def events(s: SparkSession, d: String): DataFrame =
    p(s, d, "events").withColumn("ts", ntzColToTimestamp("ts"))

  /** events.parquet's physical schema — shared with the schema-pinned
    * streaming readers so the events read shape has exactly one definition.
    * `ts` MUST be TimestampNTZType to match the file's isAdjustedToUTC=false
    * annotation: pinning LongType here would silently read raw micros as
    * longs, and pinning LTZ would re-interpret naive values through the JVM
    * zone on non-UTC hosts. */
  val rawEventsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  /** The NTZ→LTZ rebuild (see [[events]] scaladoc — UTC session timezone is
    * load-bearing for value identity). */
  def ntzColToTimestamp(colName: String): org.apache.spark.sql.Column =
    col(colName).cast(org.apache.spark.sql.types.TimestampType)
}
