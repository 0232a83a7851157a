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

  test("join-star-revenue: matches a brute in-memory star join") {
    def asL(r: org.apache.spark.sql.Row, i: Int): Long =
      r.get(i).asInstanceOf[Number].longValue()
    val nat = graft.Tables.nation(spark, sf()).collect()
      .map(r => asL(r, 0) -> (r.getString(1), asL(r, 2))).toMap
    val reg = graft.Tables.region(spark, sf()).collect()
      .map(r => asL(r, 0) -> r.getString(1)).toMap
    val cust = graft.Tables.customer(spark, sf()).collect()
      .map(r => asL(r, 0) -> asL(r, 2)).toMap
    val ord = graft.Tables.orders(spark, sf()).collect()
      .map(r => asL(r, 0) -> asL(r, 1)).toMap
    val brute = graft.Tables.lineitem(spark, sf())
      .select("l_orderkey", "l_extendedprice", "l_discount").collect()
      .map { r =>
        val (nName, rk) = nat(cust(ord(r.getLong(0))))
        ((reg(rk), nName),
          math.round(r.getDouble(1) * (1 - r.getDouble(2)) * 100))
      }
      .groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val out = JoinOps.joinStarRevenue.build(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out === brute)
  }

  test("win-cusum-changepoint: argmax matches a scalar CUSUM recompute") {
    val days = graft.Tables.events(spark, sf()).select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000000L))
      .groupBy(_._1).view.mapValues(_.groupBy(_._2).view.mapValues(_.length.toLong).toMap)
    val out = WindowOps.winCusumChangepoint.build(spark, sf()).collect()
    assert(out.map(_.getString(0)).toSet === days.keySet.toSet)
    out.foreach { r =>
      val byDay = days(r.getString(0)).toSeq.sortBy(_._1)
      val total = byDay.map(_._2).sum
      val nd = byDay.length.toLong
      var cum = 0L
      val scores = byDay.zipWithIndex.map { case ((day, n), i) =>
        cum += n
        (day, math.abs(nd * cum - (i + 1) * total))
      }
      val best = scores.maxBy(s => (s._2, -s._1))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
        ((best._1, best._2, nd, total)))
    }
  }

  test("agg-gini-cents: bucketed prefix-sum rank equals the sorted-rank Gini") {
    val xs = graft.Tables.events(spark, sf())
      .filter(col("event_type") === "purchase")
      .select("user_id", "value").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(identity) // (user asc) then stable sort by value below
      .sortBy(_._2)
    val n = xs.length.toLong
    val tot = xs.map(_._2).sum
    val num = xs.zipWithIndex.map { case ((_, x), i) => (2L * (i + 1) - n - 1) * x }.sum
    val r = AggOps.aggGiniCents.build(spark, sf()).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((n, tot, num)))
    assert(r.getDouble(3) == math.round(num * 1e6 / (n * tot)) / 1e6)
    assert(r.getDouble(3) > 0 && r.getDouble(3) < 1)
  }

  test("agg-exp-decay: shift decay matches a scalar recompute and is monotone") {
    val ev = graft.Tables.events(spark, sf()).select("event_type", "value", "ts")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val t1 = ev.map(_._3).max
    val brute = ev.groupBy(_._1).view.mapValues { g =>
      val v6 = g.map { case (_, v, ts) =>
        val age = math.min((t1 - ts) / 86400000000000L, 62L)
        (math.round(v * 1e6), math.round(v * 1e6) >> age)
      }
      (g.length.toLong, v6.map(_._2).sum, v6.map(_._1).sum)
    }.toMap
    val out = AggOps.aggExpDecay.build(spark, sf()).collect()
    assert(out.map(_.getString(0)).toSet === brute.keySet)
    out.foreach { r =>
      val (bn, bd, braw) = brute(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((bn, bd, braw)))
      assert(bd <= braw, "decay can only shrink mass")
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
