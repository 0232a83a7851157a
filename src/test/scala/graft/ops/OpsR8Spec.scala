package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariant tests for join-asof and win-sessionize over sf0.001. The
  * driver gate owns value-exactness; these pin the temporal semantics
  * with independent recomputation on collected rows.
  */
class OpsR8Spec extends SparkSpec {

  private def events() = graft.Tables.events(spark, sf())
    .select(col("event_id"), col("user_id"), col("event_type"),
      expr("ts div 1000").as("ts_us"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

  test("join-asof: every purchase row matches a scala scan of the user's click history") {
    val ev = events()
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._2)
    val out = JoinOps.joinAsof.build(spark, sf()).collect()
    val purchases = ev.filter(_._3 == "purchase")
    assert(out.length === purchases.length, "one row per purchase, matched or not")
    out.foreach { r =>
      val (pid, uid, pts) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val best = clicksByUser.getOrElse(uid, Array.empty)
        .filter(_._4 <= pts)
        .sortBy(c => (c._4, c._1)) // latest ts, then max id — the tie rule
        .lastOption
      best match {
        case None =>
          assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5),
            s"purchase $pid should be unmatched")
        case Some((cid, _, _, cts)) =>
          assert(r.getLong(3) === cid, s"purchase $pid click id")
          assert(r.getLong(4) === cts)
          assert(r.getLong(5) === pts - cts, "gap arithmetic")
          assert(r.getLong(5) >= 0, "click never after the purchase")
      }
    }
  }

  test("text-heavy-hitters: one-sided CMS error over the true top-20") {
    val r = TextOps.textHeavyHitters.build(spark, sf()).collect()
    assert(r.length === 20)
    val trues = r.map(_.getLong(1))
    assert(trues.zip(trues.tail).forall { case (a, b) => a >= b }, "true-count descending")
    r.foreach { row =>
      assert(row.getLong(2) >= row.getLong(1), "CMS never undercounts")
      assert(row.getLong(3) === row.getLong(2) - row.getLong(1))
      assert(row.getLong(3) >= 0)
    }
    // the reported tokens are the exact top-20 by a straight recount
    val exact = graft.Tables.documents(spark, sf())
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w")).limit(20)
      .collect().map(r2 => (r2.getString(0), r2.getLong(1)))
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq === exact.toSeq)
  }

  test("agg-retention: week-0 equals the cohort size; later weeks never exceed it") {
    val rows = graft.ops.AggOps.aggRetention.build(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, off, n) => assert(off >= 0 && n >= 1) }
    val cohortSizes = graft.Tables.events(spark, sf())
      .filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(expr("(ts div 1000) div 604800000000")).as("cw"))
      .groupBy("cw").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val week0 = rows.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    assert(week0 === cohortSizes,
      "every signup user is active in their own signup week")
    rows.foreach { case (cw, _, n) => assert(n <= cohortSizes(cw)) }
  }

  test("agg-funnel matches a per-user scala scan of ordered stage times") {
    val ev = events()
    val byUser = ev.groupBy(_._2)
    var (n1, n2, n3) = (0L, 0L, 0L)
    byUser.foreach { case (_, es) =>
      val t1 = es.filter(_._3 == "signup").map(_._4).sorted.headOption
      val t2 = t1.flatMap(t => es.filter(e => e._3 == "click" && e._4 > t)
        .map(_._4).sorted.headOption)
      val t3 = t2.flatMap(t => es.filter(e => e._3 == "purchase" && e._4 > t)
        .map(_._4).sorted.headOption)
      if (t1.isDefined) n1 += 1
      if (t2.isDefined) n2 += 1
      if (t3.isDefined) n3 += 1
    }
    val r = graft.ops.AggOps.aggFunnel.build(spark, sf()).collect()
      .map(x => x.getLong(0) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r(1L)._1 === n1 && r(2L)._1 === n2 && r(3L)._1 === n3)
    assert(n1 >= n2 && n2 >= n3, "funnel shrinks monotonically")
    assert(r(1L)._2 === 1000000L)
    assert(r(2L)._2 === math.round(n2 * 1e6 / n1))
  }

  test("agg-active-users: DAU <= WAU, stickiness in (0,1], scala recount agrees") {
    val rows = graft.ops.AggOps.aggActiveUsers.build(spark, sf()).collect()
    assert(rows.nonEmpty)
    val ev = events()
    val dayUsers = ev.groupBy(e => e._4 / 86400000000L)
      .map { case (d, es) => d -> es.map(_._2).distinct.length.toLong }
    val weekUsers = ev.groupBy(e => e._4 / 604800000000L)
      .map { case (w, es) => w -> es.map(_._2).distinct.length.toLong }
    assert(rows.length === dayUsers.size)
    rows.foreach { r =>
      val (day, dau, wau, st) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(dau === dayUsers(day))
      assert(wau === weekUsers(day * 86400000000L / 604800000000L))
      assert(dau <= wau, "a day's actives are within its week's")
      assert(st > 0.0 && st <= 1.0)
      assert(st === math.round(dau * 1e6 / wau) / 1e6)
    }
  }

  test("win-sessionize: sessions partition each user's events at >=30min gaps") {
    val gapUs = 30L * 60 * 1000000
    val byUser = events().groupBy(_._2).map { case (u, es) =>
      u -> es.map(_._4).sorted
    }
    val out = WindowOps.winSessionize.build(spark, sf()).collect()
      .groupBy(_.getLong(0))
    assert(out.keySet === byUser.keySet)
    byUser.foreach { case (u, ts) =>
      val sessions = out(u).map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      // sessions tile the user's events: counts add up, bounds are events
      assert(sessions.map(_._3).sum === ts.length.toLong, s"user $u event count")
      sessions.foreach { case (s0, e0, _) =>
        assert(s0 <= e0 && ts.contains(s0) && ts.contains(e0))
      }
      // adjacent sessions are separated by >= the gap; events inside a
      // session never straddle a >= gap silence
      sessions.toSeq.sliding(2).foreach {
        case Seq((_, e1, _), (s2, _, _)) => assert(s2 - e1 >= gapUs,
          s"user $u sessions split at a shorter silence")
        case _ => ()
      }
      val bounds = sessions.flatMap(s => Seq(s._1, s._2)).toSet
      ts.toSeq.sliding(2).foreach {
        case Seq(a, b) if b - a >= gapUs =>
          assert(bounds.contains(a) && bounds.contains(b),
            s"user $u gap $a->$b must be a session boundary")
        case _ => ()
      }
    }
  }
}
