package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LlmOps

/** Contract for `stream_ann_ivf_autorefresh` — the drift check folded into
  * the streaming append CAS (round 16; the round-15 verdict's #4):
  *
  *   1. BELOW-FLOOR STREAM ≡ APPEND — with the refresh floor conf'd sky
  *      high the retrain can never fire: every batch must LOG an explicit
  *      no-op with its measured ppm, and the final staged ranking must
  *      equal `stream_ann_ivf_append`'s (pure frozen-centroid appends).
  *   2. ABOVE-FLOOR STREAM ≡ RETRAIN — at the default 10 % floor the first
  *      (1/15) delivery stays below and logs a no-op, the second (share
  *      20 %) fires the mid-stream retrain+swap, and the final staged
  *      ranking must equal the OFFLINE `sim_search_ann_ivf_retrain` key's
  *      row-exactly: training is bit-deterministic over a row set, so the
  *      mid-stream swap and the offline swap are the same index.
  *
  * Test order matters and is deliberate: the sky-high case runs FIRST so
  * the op's staged candidates end the suite in their default-conf state
  * (the artifact the driver's oracle re-ranks).
  */
class StreamIvfAutorefreshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  private def logOf(b: Int): (String, Long) = {
    val rec = LlmOps.streamRefreshLog.get(s"$d|b$b")
    assert(rec != null, s"batch $b must log its drift decision")
    val Array(branch, ppm) = rec.split(":")
    (branch, ppm.toLong)
  }

  test("below the floor every batch is an explicit no-op and the stream " +
    "equals the pure append index") {
    spark.conf.set("graft.ivf.refresh.ppm", "900000")
    try {
      val streamed = LlmOps.streamAnnIvfAutorefresh.fn(spark, d)
        .collect().map(_.toSeq).toSeq
      (0 to 1).foreach { b =>
        val (branch, ppm) = logOf(b)
        assert(branch == "noop" && ppm < 900000L,
          s"batch $b must log a below-floor no-op: $branch:$ppm")
      }
      val append = LlmOps.streamAnnIvfAppend.fn(spark, d)
        .collect().map(_.toSeq).toSeq
      assert(streamed.nonEmpty && streamed == append,
        "a never-fires stream must equal the frozen-centroid append index")
    } finally spark.conf.unset("graft.ivf.refresh.ppm")
  }

  test("at the default floor the second delivery fires the mid-stream " +
    "retrain+swap and the stream equals the offline retrain") {
    val streamed = LlmOps.streamAnnIvfAutorefresh.fn(spark, d)
      .collect().map(_.toSeq).toSeq
    val (b0branch, b0ppm) = logOf(0)
    assert(b0branch == "noop" && b0ppm < 100000L,
      s"the 1/15 first delivery must stay below the default floor: $b0branch:$b0ppm")
    val (b1branch, b1ppm) = logOf(1)
    assert(b1branch == "retrain" && b1ppm >= 100000L,
      s"the second delivery must cross the floor and fire: $b1branch:$b1ppm")
    val offline = LlmOps.simSearchAnnIvfRetrain.fn(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty && streamed == offline,
      "the mid-stream swap must equal the offline retrain row-exactly")
  }
}
