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
        (g.length.toLong, g.map(e => math.round(e._2 * 100)).sum, g.map(_._3).max)
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
