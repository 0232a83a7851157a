package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariant tests for the round-8 op batch over the sf0.001 fixtures.
  * The driver gate owns value-exactness vs DuckDB; these pin semantics
  * independently — including a from-scratch Scala BPE trainer and a
  * from-scratch point-in-time resolver for the bucket-pruned SCD2 join.
  */
class OpsR17Spec extends SparkSpec {

  test("text-bpe-train equals a from-scratch greedy BPE trainer") {
    // reference implementation: word-frequency vocab, 3 rounds of
    // (count adjacent pairs weighted by freq, adopt max by (cnt desc,
    // pair asc), greedy left-to-right non-overlapping merge)
    val vocab = graft.Tables.documents(spark, sf())
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    var seqs: Map[Vector[String], Long] = vocab.toSeq
      .groupBy { case (w, _) => w.map(_.toString).toVector }
      .map { case (syms, ws) => syms -> ws.map(_._2).sum }
    val expected = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    for (round <- 1 to 3) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- seqs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x + " " + y) }
        expected += ((round.toLong, s"$a $b", cnt))
        def merge(syms: Vector[String]): Vector[String] = {
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toVector
        }
        seqs = seqs.toSeq.groupBy { case (syms, _) => merge(syms) }
          .map { case (m, xs) => m -> xs.map(_._2).sum }
      }
    }
    val got = TextOps.textBpeTrain.build(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq,
      s"BPE merges diverge: got ${got.toSeq}, expected ${expected.toSeq}")
  }

  test("text-classifier-score: deciles partition the corpus; n_pos matches a from-scratch scorer") {
    val wts = Array(3L, -2L, 1L, 0L, 2L, -1L, -3L, 2L, 1L, -2L, 0L, 1L,
      -1L, 2L, -2L, 3L)
    def dim(w: String): Int = {
      val md5 = MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md5.substring(0, 4), 16) % 16).toInt
    }
    val docs = graft.Tables.documents(spark, sf())
      .select("text").collect().map(_.getString(0))
    val expPos = docs.count(t => t.split(" ", -1).map(w => wts(dim(w))).sum - 1 > 0)
    val rows = TextOps.textClassifierScore.build(spark, sf()).collect()
    assert(rows.map(_.getLong(1)).sum == docs.length,
      "decile buckets must partition every document")
    assert(rows.map(_.getLong(2)).sum == expPos,
      "n_pos diverges from the from-scratch scorer")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_pos <= n_docs per bucket")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L,
        "mean fast-sigmoid score stays in [0, 1e6]")
    }
  }

  test("text-mix-schedule: endpoints equal the natural/temperature mixes, ramp is monotone") {
    val sched = TextOps.textMixSchedule.build(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = sched.groupBy(_._2)
    // endpoints agree with text-mix-temperature's published mixes
    val mt = TextOps.textMixTemperature.build(spark, sf()).collect()
      .map(r => r.getString(0) ->
        (math.round(r.getDouble(2) * 1000000),
          math.round(r.getDouble(3) * 1000000))).toMap
    bySource.foreach { case (src, rows) =>
      val byStep = rows.sortBy(_._1).map(_._3)
      assert(byStep.length == 9, s"$src: 9 steps")
      assert(byStep.head == mt(src)._1, s"$src: step 0 is the natural mix")
      assert(byStep.last == mt(src)._2, s"$src: step 8 is the temperature mix")
      // linear ramp between integer endpoints is monotone
      val inc = byStep.last >= byStep.head
      byStep.zip(byStep.tail).foreach { case (a, b) =>
        assert(if (inc) b >= a else b <= a, s"$src: ramp not monotone")
      }
    }
    // each step's weights still form (approximately) a distribution:
    // truncating div loses < 1 micro-unit per source
    sched.groupBy(_._1).foreach { case (step, rows) =>
      val tot = rows.map(_._3).sum
      assert(math.abs(tot - 1000000L) <= rows.length + 1,
        s"step $step: weights sum $tot off by more than rounding")
    }
  }

  test("join-pit-scd2 equals a from-scratch point-in-time resolver") {
    def millis(v: Any): Long = v match {
      case t: java.sql.Timestamp => t.getTime
      case l: java.time.LocalDateTime =>
        l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case other => sys.error(s"unexpected timestamp value $other")
    }
    val orders = graft.Tables.orders(spark, sf())
      .select("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), millis(r.get(3))))
    // SCD2 runs per customer: order by (date, orderkey), new run on each
    // priority change, valid_from = first date of the run
    case class Run(run: Long, prio: String, validFrom: Long)
    val runsByCust = orders.groupBy(_._2).map { case (cust, os) =>
      val sorted = os.sortBy(o => (o._4, o._1))
      val runs = scala.collection.mutable.ArrayBuffer[Run]()
      var runId = 0L
      sorted.foreach { o =>
        if (runs.isEmpty) { runs += Run(0L, o._3, o._4) }
        else if (runs.last.prio != o._3) {
          runId += 1; runs += Run(runId, o._3, o._4)
        }
      }
      cust -> runs.toVector
    }
    val ordByKey = orders.map(o => o._1 -> (o._2, o._3)).toMap
    val drift = scala.collection.mutable.Map[String, (Long, Long)]()
    // the synthetic lineitem repeats (orderkey, linenumber) with distinct
    // shipdates; the op's pit groupBy collapses to that grain, so the
    // argmax effectively runs as-of the pair's LATEST shipdate
    graft.Tables.lineitem(spark, sf())
      .select("l_orderkey", "l_linenumber", "l_shipdate").collect()
      .groupBy(r => (r.getLong(0), r.getInt(1)))
      .foreach { case ((okey, _), rs) =>
        val (cust, orderPrio) = ordByKey(okey)
        val ship = rs.map(r => millis(r.get(2))).max
        val cands = runsByCust(cust).filter(_.validFrom <= ship)
        if (cands.nonEmpty) {
          val pit = cands.maxBy(c => (c.validFrom, c.run)).prio
          val (n, dr) = drift.getOrElse(pit, (0L, 0L))
          drift(pit) = (n + 1, dr + (if (pit != orderPrio) 1 else 0))
        }
      }
    val rows = WindowOps.joinPitScd2.build(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows == drift.toMap,
      s"PIT drift diverges: got $rows expected $drift")
  }
}
