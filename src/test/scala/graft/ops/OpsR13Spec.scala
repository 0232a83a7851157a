package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariant tests for the round-6 planner/robustness ops
  * (agg-rollup-metrics, agg-key-skew, agg-mad-outliers,
  * join-interval-overlap) over sf0.001. The driver gate owns value
  * exactness against DuckDB; these recompute the semantics independently
  * on collected rows.
  */
class OpsR13Spec extends SparkSpec {

  private def interpQuantile(sorted: Seq[Long], q: Double): Double = {
    val pos = q * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  test("agg-rollup-metrics: subtotal rows are exact sums of their leaves") {
    val out = AggOps.aggRollupMetrics.build(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val leaves = out.filter(r => r._1 != "ALL" && r._2 != "ALL")
    val flagTotals = out.filter(r => r._1 != "ALL" && r._2 == "ALL")
    val grand = out.filter(r => r._1 == "ALL" && r._2 == "ALL")
    assert(grand.length == 1 && out.count(r => r._1 == "ALL" && r._2 != "ALL") == 0)
    flagTotals.foreach { case (f, _, n, q, c) =>
      val mine = leaves.filter(_._1 == f)
      assert((mine.map(_._3).sum, mine.map(_._4).sum, mine.map(_._5).sum) === ((n, q, c)), f)
    }
    assert(grand.head._3 == leaves.map(_._3).sum)
    assert(grand.head._3 == graft.Tables.lineitem(spark, sf()).count())
  }

  test("agg-key-skew: stats match a scalar recompute from raw counts") {
    val byKey = graft.Tables.events(spark, sf()).groupBy("user_id").count()
      .collect().map(_.getLong(1)).sorted.toSeq
    val row = AggOps.aggKeySkew.build(spark, sf()).collect()
      .find(_.getString(0) == "events.user_id").get
    assert(row.getLong(1) == byKey.length && row.getLong(2) == byKey.sum)
    val maxC = byKey.max
    assert(row.getLong(3) == maxC)
    assert(row.getDouble(4) ==
      math.round(interpQuantile(byKey, 0.5) * 1e6) / 1e6)
    assert(row.getDouble(5) ==
      math.round(interpQuantile(byKey, 0.99) * 1e6) / 1e6)
    assert(row.getLong(6) == maxC * 1000000L / byKey.sum)
    assert(row.getLong(7) == (maxC * 32 + byKey.sum - 1) / byKey.sum)
    // mild synthetic skew: a single-digit salt always suffices here
    assert(row.getLong(7) >= 1L && row.getLong(7) < 10L)
  }

  test("agg-mad-outliers: brute recompute per event_type") {
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
      s(lo) + (pos - lo) * (s(hi) - s(lo))
    }
    val vals = graft.Tables.events(spark, sf()).select("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    val out = AggOps.aggMadOutliers.build(spark, sf()).collect()
    assert(out.map(_.getString(0)).toSet === vals.keySet)
    out.foreach { r =>
      val xs = vals(r.getString(0)).map(_._2).toSeq
      val m = med(xs)
      val mad = med(xs.map(v => math.abs(v - m)))
      assert(r.getLong(1) == xs.length)
      assert(r.getDouble(2) == math.round(m * 1e6) / 1e6)
      assert(r.getDouble(3) == math.round(mad * 1e6) / 1e6)
      assert(r.getLong(4) == xs.count(v => math.abs(v - m) > 3 * mad))
      // MAD gate is meaningful on this heavy-tailed data: some but few
      assert(r.getLong(4) > 0 && r.getLong(4) < xs.length / 4)
    }
  }

  test("join-interval-overlap: bucketed join equals the brute inequality join") {
    val W = 25200000000000L; val L = 14400000000000L
    val ev = graft.Tables.events(spark, sf()).select("user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = ev.groupBy { case (u, t) => (u, t / 86400000000000L) }
      .map { case ((u, day), es) => (u, day, es.map(_._2).min, es.map(_._2).max) }
    val t0 = ev.map(_._2).min; val t1 = ev.map(_._2).max
    val brute = (for {
      (u, day, s, e) <- a.toSeq
      w <- 0L to ((t1 - t0) / W)
      ws = t0 + w * W; we = ws + L
      if s <= we && ws <= e
    } yield (u, day, w, (math.min(e, we) - math.max(s, ws)) / 1000L)).toSet
    val out = JoinOps.joinIntervalOverlap.build(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == out.toSet.size, "bucketed join emitted a duplicate pair")
    assert(out.toSet === brute)
  }
}
