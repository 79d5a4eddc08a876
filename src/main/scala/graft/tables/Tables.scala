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

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * 4.1.2 rejects outright (PARQUET_TYPE_ILLEGAL). Verified shim (SURVEY.md
    * §7.3): read the raw nanos as a long, then floor-divide to micros with
    * *integer* division — `ts div 1000` — and rebuild a TimestampType.
    *
    * Integer division is load-bearing: epoch-nanos for 2024 is ~1.7e18, which
    * does not fit a double's 53-bit mantissa, so a float path
    * (`col/1000 cast long`) can round across a microsecond boundary. Floor
    * division exactly matches DuckDB's own ns→µs truncation of the same file,
    * which is what the oracle compares against.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    p(s, d, "events").withColumn("ts", nsColToTimestamp("ts"))
  }

  /** events.parquet's physical schema under the nanosAsLong shim — shared
    * with the streaming reader so the shim has exactly one definition. */
  val rawEventsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  /** The ns→µs rebuild (see [[events]] scaladoc — integer division is
    * load-bearing). */
  def nsColToTimestamp(colName: String): org.apache.spark.sql.Column =
    timestamp_micros(expr(s"$colName div 1000"))
}
