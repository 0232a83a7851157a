package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial-skew property tests (round-7 hardening item 4; round-8:
  * deterministic metrics): the cheapest offline proxy for the 100×
  * claim. Each skew-safe spelling is run over a UNIFORM fixture and an
  * ADVERSARIAL one of identical size — one shingle in 50% of documents,
  * one user with 30% of events, one order with 30% of lineitems — and
  * must (a) stay correct and (b) keep its per-task shuffle-read record
  * maximum bounded by `hot-key mass + 2× the uniform run's maximum`.
  *
  * Why records, not wall time (the round-7 spelling): on the shared box
  * a contention burst spanning all passes could fail a wall-clock gate
  * nondeterministically (ADVICE r7). Per-task shuffle-read record
  * counts are a pure function of the plan and the data — deterministic
  * under any load — and they are the thing skew actually is: a spelling
  * that funnels work shows up as one task reading far more than the
  * single hot key's own mass (a global window funnels ALL rows; a
  * df-pruned / map-side-combined spelling never exceeds hot-mass plus a
  * fair share). Wall times are still measured and printed for eyeballs,
  * but nothing asserts on them.
  */
class SkewPropertySpec extends SparkSpec {

  /** Max shuffle-read records over all tasks spawned by `body`. */
  private def maxShuffleRecords(body: => Unit): Long = {
    val maxRec = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics.recordsRead
          maxRec.getAndUpdate(cur => math.max(cur, r))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      org.apache.spark.graft.TestBridge.drainListenerBus(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    maxRec.get()
  }

  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  /** The skew invariant: no task in the adversarial run reads more than
    * the hot key's own unavoidable mass plus twice the uniform run's
    * per-task maximum (fair share + partial-aggregation rows). A
    * funneling spelling (global window, un-combined groupBy) reads the
    * WHOLE input in one task and blows through this by the corpus/hot
    * ratio.
    */
  private def assertSkewBounded(
      name: String, uniMax: Long, advMax: Long, hotMass: Long): Unit =
    assert(advMax <= hotMass + 2L * uniMax,
      s"$name: adversarial max task shuffle-read $advMax records vs " +
        s"uniform $uniMax + hot-key mass $hotMass — a task is reading " +
        "more than the hot key plus a fair share (funneling spelling?)")

  // ---- documents: one shingle family in 50% of docs --------------------

  private val NDocs = 6000

  private def docs(adversarial: Boolean): DataFrame = {
    val viral = when(col("doc_id") % 2 === 0 && lit(adversarial),
      lit("hot hot hot hot ")).otherwise(lit(""))
    spark.range(0, NDocs).toDF("doc_id")
      .withColumn("text", concat(viral, concat_ws(" ",
        (0 until 12).map(i => concat(lit("w"),
          ((col("doc_id") * 7 + i * 131) % 50000).cast("string"))): _*)))
  }

  test("Dedup.shingleSets(skewSafe=true): viral shingle pruned, equivalent to the window spelling, skew-bounded") {
    val uni = docs(adversarial = false)
    val adv = docs(adversarial = true)
    graft.dedup.Dedup.shingleSets(uni, "doc_id", "text").count() // warm

    val uniMax = maxShuffleRecords(
      graft.dedup.Dedup.shingleSets(uni, "doc_id", "text").count())
    var tAdv = 0.0
    val advMax = maxShuffleRecords {
      tAdv = timed(graft.dedup.Dedup.shingleSets(adv, "doc_id", "text").count())
    }
    info(f"shingleSets: uniform max task $uniMax rec, adversarial $advMax rec ($tAdv%.2fs)")

    val out = graft.dedup.Dedup.shingleSets(adv, "doc_id", "text", maxDf = 20)
    // df bound holds on the OUTPUT: no surviving shingle exceeds maxDf
    val maxDf = out.groupBy("s").agg(count(lit(1)).as("df"))
      .agg(max("df")).head().getLong(0)
    assert(maxDf <= 20, s"df prune leaked a hot shingle (max df $maxDf)")
    // the skew-safe anti-join spelling and the fixture-scale window
    // spelling agree row-for-row on the adversarial fixture
    val win = graft.dedup.Dedup.shingleSets(adv, "doc_id", "text", skewSafe = false)
    assert(out.exceptAll(win).isEmpty && win.exceptAll(out).isEmpty,
      "skewSafe=true diverges from the window spelling")
    // hot mass: the viral shingle family appears in NDocs/2 documents
    assertSkewBounded("shingleSets", uniMax, advMax, hotMass = NDocs / 2)
  }

  // ---- events: one user with 30% of all events -------------------------

  private val NEvents = 200000

  private def events(adversarial: Boolean): DataFrame = {
    val uid = if (adversarial)
      when(col("id") % 10 < 3, lit(0L)).otherwise(col("id") % 2000)
    else col("id") % 2000
    spark.range(0, NEvents).toDF("id")
      .select(uid.as("user_id"),
        timestamp_micros(lit(1700000000000000L) + col("id") * 1000000L +
          (col("id") % 97) * 777777L).as("tsc"),
        (col("id") % 500).as("cents"))
  }

  test("Streams.sessionize: hot user stays correct and skew-bounded") {
    val uni = events(adversarial = false)
    val adv = events(adversarial = true)
    graft.streaming.Streams.sessionize(uni).count() // warm

    val uniMax = maxShuffleRecords(graft.streaming.Streams.sessionize(uni).count())
    var tAdv = 0.0
    val advMax = maxShuffleRecords {
      tAdv = timed(graft.streaming.Streams.sessionize(adv).count())
    }
    info(f"sessionize: uniform max task $uniMax rec, adversarial $advMax rec ($tAdv%.2fs)")

    val out = graft.streaming.Streams.sessionize(adv)
    val sums = out.agg(sum("n_events").as("n"), sum("value_cents").as("v")).head()
    assert(sums.getLong(0) == NEvents, "sessionize dropped or duplicated events")
    assert(sums.getLong(1) == adv.agg(sum("cents")).head().getLong(0))
    // sessions never overlap per user (hot user included)
    import org.apache.spark.sql.expressions.Window
    val overlaps = out
      .withColumn("prev_end",
        lag("end_us", 1).over(Window.partitionBy("user_id").orderBy("start_us")))
      .filter(col("prev_end").isNotNull && col("start_us") <= col("prev_end"))
      .count()
    assert(overlaps == 0, s"$overlaps overlapping sessions")
    // hot mass: user 0 owns 30% of events; session_window partially
    // merges sessions map-side, so the reduce task for user 0 should
    // see far fewer than 0.3·NEvents records — the bound just has to
    // hold even if no map-side merge fires
    assertSkewBounded("sessionize", uniMax, advMax, hotMass = NEvents * 3 / 10)
  }

  // ---- orders/lineitem: one order with 30% of lineitems ----------------

  private val NOrders = 20000
  private val NItems = 200000

  private def fanoutDir(adversarial: Boolean): String = {
    val dir = Files.createTempDirectory(
      s"graft-skew-${if (adversarial) "adv" else "uni"}-").toAbsolutePath.toString
    spark.range(0, NOrders).select(col("id").as("o_orderkey"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val key = if (adversarial)
      when(col("id") % 10 < 3, lit(0L)).otherwise(col("id") % NOrders)
    else col("id") % NOrders
    spark.range(0, NItems).select(key.as("l_orderkey"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("join-fanout-profile: hot order key stays correct and skew-bounded") {
    val uniDir = fanoutDir(adversarial = false)
    val advDir = fanoutDir(adversarial = true)
    val op = graft.ops.JoinOps.joinFanoutProfile
    op.build(spark, uniDir).collect() // warm

    val uniMax = maxShuffleRecords(op.build(spark, uniDir).collect())
    var tAdv = 0.0
    val advMax = maxShuffleRecords {
      tAdv = timed(op.build(spark, advDir).collect())
    }
    info(f"join-fanout-profile: uniform max task $uniMax rec, adversarial $advMax rec ($tAdv%.2fs)")

    val rows = op.build(spark, advDir).collect()
    val items = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    val orders = rows.map(_.getLong(1)).sum
    assert(items == NItems, s"histogram mass $items != $NItems lineitems")
    assert(orders == NOrders, s"order mass $orders != $NOrders orders")
    // the hot key surfaces as one order at the 30% depth
    val hotDepth = NItems * 3 / 10
    assert(rows.exists(r => r.getLong(0) == hotDepth && r.getLong(1) == 1L),
      s"missing the depth-$hotDepth hot order")
    // hot mass: order 0 owns 30% of lineitems; the count groupBy
    // partial-aggregates map-side so the true per-task read is tiny
    assertSkewBounded("join-fanout-profile", uniMax, advMax,
      hotMass = NItems * 3 / 10)
  }
}
