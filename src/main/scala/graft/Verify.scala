package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Adversarial-sweep hook (driver never sets it): semicolon-separated
    // k=v runtime SQL confs, e.g. disabling the vectorized parquet reader
    // to shake out float/ordering dependence on the read path.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    new java.io.File(outDir).mkdirs()
    // Local-iteration escape hatch (driver never sets it): run a subset.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = only match {
      case Some(pats) => SparkEntry.queries.filter { case (k, _) => pats.exists(k.contains) }
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Each dump is written before the next query runs, so this invocation's
      // caches/temp artifacts can go — keeps the 90-query loop's footprint
      // flat instead of cumulative.
      graft.ops.Housekeeping.releaseAll()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Staged-intermediate oracles carry Stage.token until the sfDir is
    // known; resolve it here so the dumped oracle_sql.json — the only oracle
    // artifact the driver reads — holds the concrete sf-scoped paths this
    // run's queries actually wrote to.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(graft.ops.Stage.resolve(v, sfDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
