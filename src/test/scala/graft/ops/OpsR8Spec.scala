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
