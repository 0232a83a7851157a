package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Deterministic re-check of the scaling harness's worst ops (round 8;
  * SCALING.md holds the measured three-point wall-clock curves). Wall
  * time is load-sensitive, so the standing gate asserts on SHUFFLE-READ
  * RECORD totals instead — a pure function of plan and data: for each
  * op, records at sf0.01 must stay within ~linear growth of records at
  * sf0.001 (12× the 10× data step, plus a fixed allowance for
  * config-sized subtrees: literal grids, broadcast totals, bucket
  * boundary rows). An op whose shuffle volume grows quadratically —
  * a self-join that stopped being banded, a window that stopped being
  * partitioned — blows through 12× long before the bench notices.
  *
  * Ops chosen = the scaling run's top tier that reads no cross-suite
  * session cache (the dedup persisted seams warm in whatever order
  * suites run, so their marginal records are not suite-deterministic;
  * their core — shingleSets — is measured directly instead).
  */
class ScalingSpec extends SparkSpec {

  private def totalShuffleRecords(body: => Unit): Long = {
    val total = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) total.addAndGet(m.shuffleReadMetrics.recordsRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      org.apache.spark.graft.TestBridge.drainListenerBus(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    total.get()
  }

  private val Slack = 50000L // config-sized subtrees (grids, boundaries)

  private def assertLinearGrowth(name: String)(run: String => Unit): Unit = {
    val r1 = totalShuffleRecords(run(sf("sf0.001")))
    val r2 = totalShuffleRecords(run(sf("sf0.01")))
    info(s"$name: shuffle records ${r1} @sf0.001 -> ${r2} @sf0.01")
    assert(r2 <= 12L * r1 + Slack,
      s"$name: shuffle records grew superlinearly ($r1 -> $r2 for 10x data)")
  }

  test("shingleSets (the shingle fill core) shuffles linearly") {
    assertLinearGrowth("shingleSets") { d =>
      graft.dedup.Dedup.shingleSets(
        Tables.documents(spark, d), "doc_id", "text").count()
    }
  }

  test("layout-bucketed-join shuffles linearly") {
    assertLinearGrowth("layout-bucketed-join") { d =>
      SparkEntry.queries("layout-bucketed-join")(spark, d).count()
    }
  }

  test("topk-largest-group shuffles linearly") {
    assertLinearGrowth("topk-largest-group") { d =>
      SparkEntry.queries("topk-largest-group")(spark, d).count()
    }
  }

  test("text-contamination shuffles linearly") {
    assertLinearGrowth("text-contamination") { d =>
      SparkEntry.queries("text-contamination")(spark, d).count()
    }
  }

  test("agg-dup-txid shuffles linearly") {
    assertLinearGrowth("agg-dup-txid") { d =>
      SparkEntry.queries("agg-dup-txid")(spark, d).count()
    }
  }

  test("mm-feature-extract stays row-local until the bucket explode") {
    // the round-8 kernel fix: the per-character explode is gone, so the
    // only shuffled rows are (doc, bucket) pairs — ≤ 16 per document
    val docs001 = Tables.documents(spark, sf("sf0.001")).count()
    val r = totalShuffleRecords(
      SparkEntry.queries("mm-feature-extract")(spark, sf("sf0.001")).count())
    info(s"mm-feature-extract: $r shuffle records for $docs001 docs")
    assert(r <= 16L * docs001 + Slack,
      s"mm-feature-extract shuffles $r records for $docs001 docs — " +
        "the per-byte explode is back?")
  }
}
