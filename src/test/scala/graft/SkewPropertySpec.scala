package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial-skew property tests (round-7 hardening item 4): the
  * cheapest offline proxy for the 100× claim. Each skew-safe spelling is
  * run over a UNIFORM fixture and an ADVERSARIAL one of identical size —
  * one shingle in 50% of documents, one user with 30% of events, one
  * order with 30% of lineitems — and must (a) stay correct and (b) stay
  * within 2× of its uniform-fixture wall time (minimum of 3 passes, plus
  * an absolute slack for scheduler jitter on the shared box). A
  * spelling that funnels the hot key through one task shows up here as a
  * multiple, not a few hundred milliseconds.
  */
class SkewPropertySpec extends SparkSpec {

  // absolute slack absorbs shared-box contention bursts (the external
  // tenant): at this fixture scale op times are ~0.5-3s, so 2s of slack
  // still rejects a genuine hot-key funnel (>= 10x) while keeping the
  // gate deterministic under load
  private val SlackSec = 2.0

  private def bestOf3(body: => Unit): Double = {
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  private def assertWithin2x(name: String, uniform: Double, adversarial: Double): Unit =
    assert(adversarial <= 2.0 * uniform + SlackSec,
      f"$name: adversarial $adversarial%.2fs vs uniform $uniform%.2fs exceeds 2x+slack")

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

  test("Dedup.shingleSets(skewSafe=true): viral shingle pruned, equivalent to the window spelling, within 2x") {
    val uni = docs(adversarial = false)
    val adv = docs(adversarial = true)
    graft.dedup.Dedup.shingleSets(uni, "doc_id", "text").count() // warm

    val tUni = bestOf3(graft.dedup.Dedup.shingleSets(uni, "doc_id", "text").count())
    val tAdv = bestOf3(graft.dedup.Dedup.shingleSets(adv, "doc_id", "text").count())

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
    assertWithin2x("shingleSets", tUni, tAdv)
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

  test("Streams.sessionize: hot user stays correct and within 2x") {
    val uni = events(adversarial = false)
    val adv = events(adversarial = true)
    graft.streaming.Streams.sessionize(uni).count() // warm

    val tUni = bestOf3(graft.streaming.Streams.sessionize(uni).count())
    val tAdv = bestOf3(graft.streaming.Streams.sessionize(adv).count())

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
    assertWithin2x("sessionize", tUni, tAdv)
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

  test("join-fanout-profile: hot order key stays correct and within 2x") {
    val uniDir = fanoutDir(adversarial = false)
    val advDir = fanoutDir(adversarial = true)
    val op = graft.ops.JoinOps.joinFanoutProfile
    op.build(spark, uniDir).collect() // warm

    val tUni = bestOf3(op.build(spark, uniDir).collect())
    val tAdv = bestOf3(op.build(spark, advDir).collect())

    val rows = op.build(spark, advDir).collect()
    val items = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    val orders = rows.map(_.getLong(1)).sum
    assert(items == NItems, s"histogram mass $items != $NItems lineitems")
    assert(orders == NOrders, s"order mass $orders != $NOrders orders")
    // the hot key surfaces as one order at the 30% depth
    val hotDepth = NItems * 3 / 10
    assert(rows.exists(r => r.getLong(0) == hotDepth && r.getLong(1) == 1L),
      s"missing the depth-$hotDepth hot order")
    assertWithin2x("join-fanout-profile", tUni, tAdv)
  }
}
