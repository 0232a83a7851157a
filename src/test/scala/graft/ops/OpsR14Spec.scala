package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariant tests for the round-6 batch-4 ops (join-merge-upsert,
  * text-k-anonymity, text-novelty-curve, stream-topk) over sf0.001 —
  * independent scalar recomputes; stream-topk's live path is parity-tested
  * in StreamsSpec.
  */
class OpsR14Spec extends SparkSpec {

  test("join-merge-upsert: statuses and merged state match a scalar MERGE") {
    val ev = graft.Tables.events(spark, sf()).select("user_id", "value", "ts")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val split = ev.map(_._3 / 86400000000000L).min + 15
    def state(rows: Seq[(Long, Double, Long)]) =
      rows.groupBy(_._1).view.mapValues { g =>
        (g.length.toLong, g.map(e => math.round(e._2 * 100)).sum,
          g.map(_._3 / 1000).max)
      }.toMap
    val base = state(ev.toSeq.filter(_._3 / 86400000000000L < split))
    val delta = state(ev.toSeq.filter(_._3 / 86400000000000L >= split))
    val out = JoinOps.joinMergeUpsert.build(spark, sf()).collect()
    assert(out.map(_.getLong(0)).toSet === (base.keySet ++ delta.keySet))
    out.foreach { r =>
      val u = r.getLong(0)
      val expSt = (base.contains(u), delta.contains(u)) match {
        case (false, _) => "inserted"
        case (_, false) => "unchanged"
        case _          => "updated"
      }
      assert(r.getString(1) == expSt, s"user $u")
      val b = base.getOrElse(u, (0L, 0L, 0L)); val dl = delta.getOrElse(u, (0L, 0L, 0L))
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) ===
        ((b._1 + dl._1, b._2 + dl._2, math.max(b._3, dl._3))), s"user $u")
    }
  }

  test("text-k-anonymity: per-lang risk counts match a brute group count") {
    val docs = graft.Tables.documents(spark, sf())
      .select("lang", "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2) / 500))
    val groups = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val out = CurationOps.textKAnonymity.build(spark, sf()).collect()
    assert(out.map(_.getString(0)).toSet === docs.map(_._1).toSet)
    out.foreach { r =>
      val lang = r.getString(0)
      val gs = groups.filter(_._1._1 == lang)
      assert(r.getLong(1) == gs.size)
      assert(r.getLong(2) == gs.count(_._2 < 5))
      assert(r.getLong(3) == gs.values.filter(_ < 5).sum)
      assert(r.getLong(4) == gs.values.sum)
    }
  }

  test("text-novelty-curve: first-occurrence attribution on raw gram strings") {
    val docs = graft.Tables.documents(spark, sf()).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.split(" ", -1).length >= 3)
    val perDoc = docs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      id -> ws.sliding(3).map(_.mkString(" ")).toSet
    }
    val firstDoc = perDoc.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val rows = perDoc.map { case (id, ss) =>
      (id / 50, 1L, ss.count(s => firstDoc(s) == id).toLong, ss.size.toLong)
    }
    val brute = rows.groupBy(_._1).view.mapValues { g =>
      val novel = g.map(_._3).sum; val total = g.map(_._4).sum
      (g.map(_._2).sum, novel, total,
        math.round(novel.toDouble * 1000000 / total.toDouble) / 1e6)
    }.toMap
    val out = TextOps.textNoveltyCurve.build(spark, sf()).collect()
    assert(out.map(_.getLong(0)).toSet === brute.keySet)
    out.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)) ===
        brute(r.getLong(0)), s"bucket ${r.getLong(0)}")
    }
    // the curve's reason to exist: the first bucket is the most novel
    val sorted = out.sortBy(_.getLong(0))
    assert(sorted.head.getDouble(4) >= sorted.last.getDouble(4))
  }

  test("pipeline-data-card: the four grains are mutually consistent") {
    val out = PipelineOps.pipelineDataCard.build(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val leaves = out.filter { case ((l, s), _) => l != "ALL" && s != "ALL" }
    val grand = out(("ALL", "ALL"))
    assert(grand._1 == leaves.values.map(_._1).sum)
    assert(grand._2 == leaves.values.map(_._2).sum)
    assert(grand._3 == leaves.values.map(_._3).min)
    assert(grand._4 == leaves.values.map(_._4).max)
    out.filter { case ((l, s), _) => l != "ALL" && s == "ALL" }.foreach {
      case ((l, _), (n, tc, mn, mx)) =>
        val mine = leaves.filter(_._1._1 == l).values
        assert(n == mine.map(_._1).sum && tc == mine.map(_._2).sum)
        assert(mn == mine.map(_._3).min && mx == mine.map(_._4).max)
    }
    assert(grand._1 == graft.Tables.documents(spark, sf()).count())
  }

  test("win-rolling-median: matches a sliding-window scalar recompute") {
    val byType = graft.Tables.events(spark, sf()).select("event_type", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1) / 86400000000000L))
      .groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.length.toLong).toSeq.sortBy(_._1))
    def med(xs: Seq[Long]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
      s(lo) + (pos - lo) * (s(hi) - s(lo))
    }
    val out = WindowOps.winRollingMedian.build(spark, sf()).collect()
    out.foreach { r =>
      val days = byType(r.getString(0))
      val i = days.indexWhere(_._1 == r.getLong(1))
      val frame = days.slice(math.max(0, i - 3), math.min(days.length, i + 4)).map(_._2)
      assert(r.getLong(2) == days(i)._2)
      assert(r.getDouble(3) == math.round(med(frame) * 1e6) / 1e6,
        s"${r.getString(0)} day ${r.getLong(1)}")
    }
  }

  test("win-attribution: matches a scalar last-touch recompute") {
    val ev = graft.Tables.events(spark, sf())
      .select("event_id", "user_id", "event_type", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    val byUser = ev.groupBy(_._2)
    val credited = ev.filter(_._3 == "purchase").map { case (pid, u, _, pts, v) =>
      val touches = byUser(u).filter(e => e._3 != "purchase" && e._4 <= pts)
      val ch = if (touches.isEmpty) "direct"
        else touches.maxBy(e => (e._4, e._1))._3
      (ch, math.round(v * 100))
    }
    val brute = credited.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val out = WindowOps.winAttribution.build(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === brute)
  }

  test("agg-hll-merge: daily-sketch merge equals the direct week-grain sketch") {
    val ev = graft.Tables.events(spark, sf())
      .select(expr("ts div 86400000000000 div 7").as("week"),
        col("event_type"), col("user_id"))
    val direct = graft.sketch.Hll.estimate(
      graft.sketch.Hll.sketch(ev, Seq("week", "event_type"), col("user_id")),
      Seq("week", "event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val merged = AggOps.aggHllMerge.build(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(merged === direct, "max-merge associativity broke")
    // m=64 has ~13% standard error — allow 3σ at fixture cardinalities
    val truth = graft.Tables.events(spark, sf())
      .groupBy(expr("ts div 86400000000000 div 7").as("week"), col("event_type"))
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    merged.foreach { case (k, est) =>
      assert(math.abs(est - truth(k)).toDouble / truth(k) < 0.40, s"$k: $est vs ${truth(k)}")
    }
  }

  test("agg-funnel-latency: hop latencies match a scalar funnel walk") {
    val ev = graft.Tables.events(spark, sf())
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2) / 1000))
    val byUser = ev.groupBy(_._1)
    def interp(xs: Seq[Long], q: Double): Double = {
      val s = xs.sorted
      val pos = q * (s.length - 1)
      val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
      s(lo) + (pos - lo) * (s(hi) - s(lo))
    }
    val hops = byUser.values.toSeq.flatMap { g =>
      val t1 = g.filter(_._2 == "signup").map(_._3).minOption
      val t2 = t1.flatMap(t => g.filter(e => e._2 == "click" && e._3 > t).map(_._3).minOption)
      val t3 = t2.flatMap(t => g.filter(e => e._2 == "purchase" && e._3 > t).map(_._3).minOption)
      Seq(t1.zip(t2).map { case (a, b) => ("signup_to_click", b - a) },
        t2.zip(t3).map { case (a, b) => ("click_to_purchase", b - a) }).flatten
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val out = AggOps.aggFunnelLatency.build(spark, sf()).collect()
    assert(out.map(_.getString(0)).toSet === hops.keySet)
    out.foreach { r =>
      val lats = hops(r.getString(0))
      assert(r.getLong(1) == lats.length)
      assert(r.getDouble(2) == math.round(interp(lats.toSeq, 0.5) * 1e6) / 1e6)
      assert(r.getDouble(3) == math.round(interp(lats.toSeq, 0.9) * 1e6) / 1e6)
      assert(r.getDouble(2) <= r.getDouble(3))
    }
  }

  test("agg-distinct-growth: the curve is monotone and ends at total users") {
    val ev = graft.Tables.events(spark, sf()).select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 3600000000000L))
    val firstHour = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val brute = firstHour.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = AggOps.aggDistinctGrowth.build(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.map(r => r._1 -> r._2).toMap === brute)
    out.foldLeft(0L) { case (acc, (_, nw, cum)) =>
      assert(cum == acc + nw); cum
    }
    assert(out.last._3 == firstHour.size)
  }

  test("pipeline-column-profile: counts match per-column scalar recomputes") {
    val rows = graft.Tables.events(spark, sf())
      .select("event_id", "user_id", "event_type", "value", "props").collect()
    val out = PipelineOps.pipelineColumnProfile.build(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val cols = Seq("event_id", "user_id", "event_type", "value", "props")
    cols.zipWithIndex.foreach { case (c, i) =>
      val vals = rows.map(_.get(i))
      val exp = (vals.count(_ == null).toLong,
        vals.filter(_ != null).distinct.length.toLong, rows.length.toLong)
      assert(out(c) === exp, c)
    }
  }

  test("win-seasonality: matrix matches scalar bucketing and shares sum to 1") {
    val ev = graft.Tables.events(spark, sf()).select("ts").collect().map(_.getLong(0))
    val brute = ev.map(t => ((t / 86400000000000L + 4) % 7, t / 3600000000000L % 24))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val out = WindowOps.winSeasonality.build(spark, sf()).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap === brute)
    val total = ev.length.toDouble
    out.foreach { r =>
      assert(r.getDouble(3) == math.round(r.getLong(2) * 1e6 / total) / 1e6)
      assert(r.getLong(0) >= 0 && r.getLong(0) < 7 && r.getLong(1) >= 0 && r.getLong(1) < 24)
    }
    val shareSum = out.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-3)
  }

  test("agg-ab-test: Welch t matches a scalar recompute") {
    val ev = graft.Tables.events(spark, sf()).select("event_type", "value")
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    def moments(t: String) = {
      val xs = ev.filter(_._1 == t).map(_._2)
      (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
    }
    val (na, sa, qa) = moments("click"); val (nb, sb, qb) = moments("view")
    val ma = sa.toDouble / na; val mb = sb.toDouble / nb
    val va = (na * qa - sa * sa).toDouble / (na * (na - 1L)).toDouble / na
    val vb = (nb * qb - sb * sb).toDouble / (nb * (nb - 1L)).toDouble / nb
    val t = (ma - mb) / math.sqrt(va + vb)
    val r = AggOps.aggAbTest.build(spark, sf()).collect().head
    assert((r.getLong(2), r.getLong(3)) === ((na, nb)))
    assert(r.getDouble(4) == math.round(ma * 1e6) / 1e6)
    assert(r.getDouble(5) == math.round(mb * 1e6) / 1e6)
    assert(r.getDouble(6) == math.round(t * 1e6) / 1e6)
  }

  test("sim-nprobe-sweep: recall and cost are monotone in nprobe") {
    val out = SimOps.simNprobeSweep.build(spark, sf()).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1, 2, 4))
    assert(out.forall(_._2 == out.head._2), "query count is config-independent")
    out.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 >= a._3, "candidate cost must grow with nprobe")
      assert(b._4 >= a._4, "recall must not drop with more probes")
    }
    out.foreach(r => assert(r._4 >= 0.0 && r._4 <= 1.0))
    // probing more than half the lists must find most of the true top-k
    assert(out.last._4 > 0.5, s"recall@4-of-8-lists ${out.last._4}")
  }

  test("agg-markov-stationary: matches a scalar integer power iteration") {
    val ev = graft.Tables.events(spark, sf())
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val tr = ev.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._3, e._4)).map(_._2)
      s.zip(s.drop(1))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTot = tr.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val p6 = tr.map { case ((a, b), n) => (a, b) -> n * 1000000L / fromTot(a) }
    val states = fromTot.keySet.toSeq.sorted
    var v = states.map(_ -> 1000000L / states.size).toMap
    for (_ <- 1 to 5) {
      v = states.map { j =>
        j -> states.map(i => v(i) * p6.getOrElse((i, j), 0L)).sum / 1000000L
      }.toMap
    }
    val out = WindowOps.aggMarkovStationary.build(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === v.filter(_._2 != 0L) || out === v,
      s"got $out want $v")
    // floor leakage stays within a few ppm of full mass
    val mass = out.values.sum
    assert(mass <= 1000000L && mass > 990000L, s"mass $mass")
  }

  test("stream-topk: every emitted row is in its window-group's true top-3") {
    val counts = graft.Tables.events(spark, sf())
      .select(expr("ts div 3600000000000 * 3600000000").as("w"),
        col("event_type"), col("user_id")).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.length.toLong).toMap).toMap
    val out = StreamOps.streamTopk.build(spark, sf()).collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
    out.groupBy(_._1).foreach { case (key, rows) =>
      val expTop = counts(key).toSeq.map { case (u, n) => (n, u) }
        .sortBy { case (n, u) => (-n, u) }.take(3)
        .map { case (n, u) => (u, n) }.toSet
      assert(rows.map(_._2).toSet === expTop, s"group $key")
    }
  }
}
