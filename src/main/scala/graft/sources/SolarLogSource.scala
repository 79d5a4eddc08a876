package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** Custom DataSource V2 for the SharedSolar raw circuit-log format
  * (FIXTURES.md §2 — the published quote-free CSV layout) — the
  * source-side Catalyst extension surface: a `TableProvider` whose scan
  * supports COLUMN PRUNING (`SupportsPushDownRequiredColumns`: only
  * requested fields are parsed/materialized) and FILTER PUSHDOWN
  * (`SupportsPushDownFilters`: string-equality predicates are applied
  * during the line parse, before a row object ever exists). One input
  * partition per log file — the natural parallelism of a kiosk-upload
  * directory; at 100 TB the same reader shape scales by file count
  * exactly like Spark's own file sources.
  *
  * Semantics mirror `csv_log_ingest`'s permissive read: header-NAME
  * binding, numerics as DECIMAL(12,2) via try-cast (malformed → null),
  * compact site-local timestamp parse under the pinned UTC session. The
  * same staged bytes are read by the DuckDB oracle (`read_csv` +
  * TRY_CAST), so the whole custom reader is hash-verified end to end.
  *
  * Usage: `spark.read.format("graft.sources.SolarLogSource")
  *   .option("path", dir).load()`.
  */
class SolarLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SolarLogTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SolarLogTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object SolarLogTable {
  /** Output schema — identical to csv_log_ingest's parsed layout. */
  val schema: StructType = StructType(Seq(
    StructField("machine_id", StringType),
    StructField("circuit_type", StringType),
    StructField("ts", TimestampType),
    StructField("watts", DecimalType(12, 2)),
    StructField("volts", DecimalType(12, 2)),
    StructField("amps", DecimalType(12, 2)),
    StructField("wh_lifetime", DecimalType(12, 2)),
    StructField("wh_today", DecimalType(12, 2)),
    StructField("power_factor", DecimalType(12, 2)),
    StructField("frequency", DecimalType(12, 2)),
    StructField("relay_open", IntegerType),
    StructField("credit", DecimalType(12, 2))))

  /** output field name → source CSV header name */
  val headerOf: Map[String, String] = Map(
    "machine_id" -> "Machine ID", "circuit_type" -> "Type",
    "ts" -> "Time Stamp", "watts" -> "Watts", "volts" -> "Volts",
    "amps" -> "Amps", "wh_lifetime" -> "Watt Hours SC20",
    "wh_today" -> "Watt Hours Today", "power_factor" -> "Power Factor",
    "frequency" -> "Frequency", "relay_open" -> "Relay Not Closed",
    "credit" -> "Credit")
}

class SolarLogTable(path: String) extends Table
  with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"solarlog($path)"
  override def schema(): StructType = SolarLogTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SolarLogScanBuilder(path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new SolarLogWriteBuilder(path, info.schema())
}

class SolarLogScanBuilder(path: String) extends ScanBuilder
  with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = SolarLogTable.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // push string-equality predicates on the two id columns — they apply
  // during the parse, before any row materializes; everything else stays
  // post-scan (returned from pushFilters → Spark keeps evaluating it)
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accept, reject) = filters.partition {
      case EqualTo(a, _: String) => a == "machine_id" || a == "circuit_type"
      case _ => false
    }
    pushed = accept
    reject
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = SolarLogScan(path, required, pushed)
}

case class SolarLogInputPartition(file: String) extends InputPartition

case class SolarLogScan(path: String, required: StructType, pushed: Array[Filter])
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SolarLogScan(path=$path, columns=${required.fieldNames.mkString(",")}, " +
      s"pushed=${pushed.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = java.nio.file.Paths.get(path)
    val files = java.nio.file.Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".csv")).map(_.toString).toArray.sorted
    files.map(SolarLogInputPartition(_): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SolarLogReaderFactory(required, pushed)
}

class SolarLogReaderFactory(required: StructType, pushed: Array[Filter])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SolarLogPartitionReader(
      partition.asInstanceOf[SolarLogInputPartition].file, required, pushed)
}

/** Line-at-a-time reader: header-name binding, pushed equality filters
  * evaluated on the raw string fields, only the PRUNED columns parsed. */
class SolarLogPartitionReader(file: String, required: StructType, pushed: Array[Filter])
  extends PartitionReader[InternalRow] {

  private val lines = java.nio.file.Files.readAllLines(
    java.nio.file.Paths.get(file)).asScala.iterator
  private val header: Map[String, Int] =
    if (lines.hasNext) lines.next().split(",", -1).map(_.trim).zipWithIndex.toMap
    else Map.empty
  // pushed filters as (source column index, expected value); a filter on a
  // column absent from this file can never match → sentinel index kills all
  private val pushedIdx: Array[(Int, String)] = pushed.collect {
    case EqualTo(a, v: String) =>
      header.getOrElse(SolarLogTable.headerOf(a), Int.MaxValue) -> v
  }
  // -1 = column absent from this file (schema-tolerant read → null cells)
  private val fieldIdx: Array[Int] =
    required.fields.map(f => header.getOrElse(SolarLogTable.headerOf(f.name), -1))
  private var current: InternalRow = _

  private def tryDecimal(s: String): org.apache.spark.sql.types.Decimal =
    try org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(s.trim).setScale(2, java.math.RoundingMode.HALF_UP), 12, 2)
    catch { case _: Exception => null }

  private def parseTs(s: String): Any =
    try {
      val t = java.time.LocalDateTime.parse(s.trim,
        java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
      t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
        t.getNano / 1000L
    } catch { case _: Exception => null }

  override def next(): Boolean = {
    current = null
    while (current == null && lines.hasNext) {
      val line = lines.next()
      if (line.trim.nonEmpty) {
        val cells = line.split(",", -1).map(_.trim)
        if (pushedIdx.forall { case (i, v) => i < cells.length && cells(i) == v }) {
          val values = new Array[Any](required.length)
          var i = 0
          while (i < required.length) {
            val raw = if (fieldIdx(i) >= 0 && fieldIdx(i) < cells.length) cells(fieldIdx(i)) else ""
            values(i) = required.fields(i).dataType match {
              case StringType => UTF8String.fromString(raw)
              case TimestampType => parseTs(raw)
              case _: DecimalType => tryDecimal(raw)
              case IntegerType =>
                try Integer.valueOf(raw.trim.toInt) catch { case _: Exception => null }
              case other => throw new IllegalStateException(s"unhandled type $other")
            }
            i += 1
          }
          current = InternalRow.fromSeq(values.toIndexedSeq)
        }
      }
    }
    current != null
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

// ───────────────────────── write side ─────────────────────────

/** V2 BatchWrite with the REAL two-phase commit protocol: each task writes
  * its lines to a hidden `.tmp` file and reports it in its commit message;
  * only the driver's job-level `commit()` renames the temporaries into
  * place (rename = the atomic publish, the same move the manifest-commit
  * layout ops use), and `abort()` deletes them — so a failed/speculated
  * task can never leave a half-written file visible to readers. Cells
  * serialize back to the published log format (compact timestamp, plain
  * decimals, empty string for null) so the written files are themselves
  * valid reader/oracle input — the round trip is hash-verified. */
class SolarLogWriteBuilder(path: String, schema: StructType)
  extends org.apache.spark.sql.connector.write.WriteBuilder {
  import org.apache.spark.sql.connector.write.{BatchWrite, Write}
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new SolarLogBatchWrite(path, schema)
  }
}

case class SolarLogCommitMessage(tmpFile: String, finalFile: String)
  extends org.apache.spark.sql.connector.write.WriterCommitMessage

class SolarLogBatchWrite(path: String, schema: StructType)
  extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write.{DataWriterFactory, PhysicalWriteInfo, WriterCommitMessage}

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    SolarLogWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach { case SolarLogCommitMessage(tmp, fin) =>
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
        java.nio.file.Paths.get(fin),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case SolarLogCommitMessage(tmp, _) =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmp))
      case _ =>
    }
}

case class SolarLogWriterFactory(path: String, schema: StructType)
  extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new SolarLogDataWriter(path, schema, partitionId, taskId)
}

class SolarLogDataWriter(path: String, schema: StructType,
                         partitionId: Int, taskId: Long)
  extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val dir = java.nio.file.Paths.get(path)
  java.nio.file.Files.createDirectories(dir)
  private val finalFile = dir.resolve(f"part-$partitionId%05d.csv")
  private val tmpFile = dir.resolve(f".part-$partitionId%05d-$taskId.csv.tmp")
  private val out = java.nio.file.Files.newBufferedWriter(tmpFile)
  out.write(schema.fieldNames.map(SolarLogTable.headerOf).mkString(","))
  out.newLine()

  private val tsFmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")

  private def cell(row: InternalRow, i: Int): String = {
    if (row.isNullAt(i)) ""
    else schema.fields(i).dataType match {
      case StringType => row.getUTF8String(i).toString
      case TimestampType =>
        java.time.LocalDateTime.ofEpochSecond(row.getLong(i) / 1000000L,
          ((row.getLong(i) % 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC).format(tsFmt)
      case d: DecimalType => row.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.toPlainString
      case IntegerType => row.getInt(i).toString
      case other => throw new IllegalStateException(s"unhandled type $other")
    }
  }

  override def write(row: InternalRow): Unit = {
    out.write(schema.indices.map(cell(row, _)).mkString(","))
    out.newLine()
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    SolarLogCommitMessage(tmpFile.toString, finalFile.toString)
  }

  override def abort(): Unit = {
    out.close()
    java.nio.file.Files.deleteIfExists(tmpFile)
  }

  override def close(): Unit = ()
}
