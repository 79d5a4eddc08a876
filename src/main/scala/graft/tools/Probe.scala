package graft.tools

import org.apache.spark.sql.functions._

/** Scratch stage-by-stage profiler used while tuning operators; not part of
  * the library surface. Run: sbt "runMain graft.tools.Probe". */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"TIMER $label ${(System.nanoTime() - t0) / 1e9}"); r
    }
    val docs = graft.tables.Tables.documents(spark, d).select("doc_id", "text")
    time("warmup")(docs.count())

    // current formulation
    val words = split(col("text"), " ")
    val cur = docs.withColumn("words", words).where(size(col("words")) >= 3)
      .withColumn("shingles", array_distinct(transform(sequence(lit(0), size(col("words")) - 3), i =>
        concat_ws(" ", element_at(col("words"), i + 1), element_at(col("words"), i + 2),
          element_at(col("words"), i + 3)))))
      .select(col("doc_id"), explode(col("shingles")).as("s"))
    time("current")(cur.count())
    time("current 2nd")(cur.count())
    println("PLAN-CURRENT")
    println(cur.queryExecution.optimizedPlan.toString.take(3000))

    // typed flatMap formulation
    val typed = docs.as[(Long, String)].flatMap { case (id, text) =>
      val w = text.split(' ')
      if (w.length < 3) Iterator.empty
      else w.iterator.sliding(3).withPartial(false)
        .map(_.mkString(" ")).toSet.iterator.map((s: String) => (id, s))
    }.toDF("doc_id", "s")
    time("typed flatMap")(typed.count())
    time("typed flatMap 2nd")(typed.count())

    // posexplode + window formulation
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val winform = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("s", concat_ws(" ", col("tok"), lead("tok", 1).over(w2), lead("tok", 2).over(w2)))
      .where(lead("tok", 2).over(w2).isNotNull)
      .select("doc_id", "s").distinct()
    time("window")(winform.count())
    time("window 2nd")(winform.count())
    spark.stop()
  }
}
