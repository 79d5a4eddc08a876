package graft

import graft.ops.SourceSinkOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}

/** The claims behind `source_schema_evolution`:
  *
  *  1. Evolution is METADATA-ONLY — reading the union through the widened
  *     schema must not touch (let alone rewrite) the pre-evolution files.
  *     Asserted byte-for-byte: gen1's file set, sizes, and content hashes are
  *     identical before and after the evolved read.
  *  2. The widening is load-bearing: gen2 amounts exceed Int.MaxValue, and
  *     gen1's INT32 amounts surface correctly through the BIGINT read.
  *  3. The added column back-fills null for pre-evolution rows, exactly.
  *  4. Predicate pushdown still reaches the parquet scan under the
  *     user-declared evolved schema (evolution must not cost the pruning).
  *  5. `mergeSchema=true` covers the added-column-only case (the part of
  *     evolution Spark's footer merge CAN express — the op's scaladoc
  *     documents why the widening needs the declared schema instead).
  */
class EvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def parquetFiles(dir: String): Seq[Path] = {
    val walk = Files.walk(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.filter(_.toString.endsWith(".parquet")).toList.sortBy(_.toString)
    } finally walk.close()
  }

  private def fingerprint(files: Seq[Path]): Seq[(String, Long, Int)] =
    files.map(p => (p.toString, Files.size(p),
      java.util.Arrays.hashCode(Files.readAllBytes(p))))

  test("evolved read is metadata-only, widens INT32, back-fills the added column") {
    val root = Files.createTempDirectory("evolution_spec").toString
    try {
      SourceSinkOps.writeEvolutionGenerations(spark, TestSpark.sf0001, root)
      val gen1Before = fingerprint(parquetFiles(s"$root/gen1"))

      val evolved = spark.read
        .schema("event_id BIGINT, user_id BIGINT, amount BIGINT, source STRING")
        .parquet(s"$root/gen1", s"$root/gen2")
      val rows = evolved.collect()

      // 1. metadata-only: pre-evolution files byte-identical after the read
      assert(fingerprint(parquetFiles(s"$root/gen1")) == gen1Before,
        "evolved read modified pre-evolution files")

      // 2./3. widening + back-fill, row-exact
      val (gen1Rows, gen2Rows) = rows.partition(_.getLong(0) % 2 == 0)
      assert(gen1Rows.nonEmpty && gen2Rows.nonEmpty)
      assert(gen1Rows.forall(_.isNullAt(3)), "gen1 rows must back-fill source = null")
      assert(gen2Rows.forall(!_.isNullAt(3)), "gen2 rows carry a real source")
      assert(gen1Rows.forall(r => r.getLong(2) == r.getLong(0) % 1000),
        "gen1 INT32 amounts must survive the BIGINT read unchanged")
      assert(gen2Rows.forall(_.getLong(2) > Int.MaxValue.toLong),
        "gen2 amounts must exceed INT32 range (the widening must be real)")

      // 4. pushdown under the declared evolved schema
      val plan = evolved.where(col("event_id") === 42L)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("event_id"), plan)

      // 5. mergeSchema covers the added-column-only case: rewrite gen1's
      // shape at gen2's width, merge the footers
      spark.read.parquet(s"$root/gen1")
        .select(col("event_id"), col("user_id"), col("amount").cast("bigint").as("amount"))
        .write.parquet(s"$root/gen1w")
      val merged = spark.read.option("mergeSchema", "true")
        .parquet(s"$root/gen1w", s"$root/gen2")
      assert(merged.schema.fieldNames.toSet ==
        Set("event_id", "user_id", "amount", "source"))
      assert(merged.where(col("event_id") % 2 === 0 && col("source").isNull).count() ==
        gen1Rows.length)
    } finally {
      graft.ops.Housekeeping.deleteRecursively(Paths.get(root))
    }
  }
}
