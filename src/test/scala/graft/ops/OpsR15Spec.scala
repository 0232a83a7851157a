package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Session-4 ops vs from-scratch Scala oracles at sf0.001 — independent of
  * the DuckDB gate (these recompute the answers from first principles on
  * collected fixture rows).
  */
class OpsR15Spec extends SparkSpec {

  private def events(): Array[(Long, Long, String, Long)] =
    Tables.events(spark, sf())
      .select(expr("ts div 1000").as("us"), col("event_id"),
        col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

  test("agg-ohlc equals the sort-by-(ts, event_id) recompute") {
    val ev = events()
    val byCell = ev.groupBy(e => (e._1 / 3600000000L, e._3))
    val expected = byCell.map { case ((h, t), es) =>
      val sorted = es.sortBy(e => (e._1, e._2))
      (h, t) -> (sorted.head._4, es.map(_._4).max, es.map(_._4).min,
        sorted.last._4, es.length.toLong)
    }
    val got = AggOps.aggOhlc.build(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got == expected)
  }

  test("win-ewma equals the per-term shift recompute") {
    val ev = events()
    val obs = ev.groupBy(e => (e._1 / 3600000000L, e._3))
      .map { case (k, es) => k -> es.map(_._4).sum }
    val mx = obs.keys.map(_._1).max
    val expected = obs.toSeq
      .flatMap { case ((h, t), v) =>
        (0 to 20).map(l => (h + l, t) -> (v >> l))
      }
      .filter(_._1._1 <= mx)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val got = WindowOps.winEwma.build(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("win-forward-fill carries the last observation and flags it") {
    val ev = events()
    val obs = ev.groupBy(e => (e._1 / 3600000000L, e._3))
      .map { case (k, es) => k -> es.map(_._4).sum }
    val hours = obs.keys.map(_._1)
    val types = obs.keys.map(_._2).toSet
    val (mn, mx) = (hours.min, hours.max)
    val rows = WindowOps.winForwardFill.build(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
      .toMap
    assert(rows.size == (mx - mn + 1) * types.size)
    types.foreach { t =>
      var carried: Option[Long] = None
      (mn to mx).foreach { h =>
        val o = obs.get((h, t))
        if (o.isDefined) carried = o
        val (filled, observed) = rows((h, t))
        assert(filled == carried, s"cell ($h,$t)")
        assert(observed == o.isDefined, s"cell ($h,$t)")
      }
    }
  }

  test("poisson bootstrap replicates: unit-mean weights, deterministic, spread") {
    val nPurchases = events().count(_._3 == "purchase")
    val rows = AggOps.aggPoissonBootstrap.build(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 32)
    // E[n_eff] = n; sd = sqrt(n) per replicate — 5 sigma band
    val band = 5 * math.sqrt(nPurchases.toDouble)
    rows.foreach { case (_, nEff, _) =>
      assert(math.abs(nEff - nPurchases) <= band, s"n_eff $nEff vs $nPurchases")
    }
    // resampling must actually vary (no degenerate all-equal replicates)
    assert(rows.map(_._3).distinct.length > 1)
    // determinism: a rebuild is bit-identical
    val again = AggOps.aggPoissonBootstrap.build(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("text-l-diversity equals the distinct-lang recompute") {
    val docs = Tables.documents(spark, sf())
      .select(col("source"), col("lang"), expr("n_chars div 500").as("b"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = docs.groupBy(d => (d._1, d._3)).toSeq
      .map { case ((src, b), ds) =>
        (src, ds.map(_._2).distinct.length.toLong, ds.length.toLong)
      }
      .groupBy(_._1).map { case (src, gs) =>
        src -> (gs.length.toLong, gs.map(_._2).min,
          gs.count(_._2 < 3).toLong, gs.filter(_._2 < 3).map(_._3).sum)
      }
    val got = CurationOps.textLDiversity.build(spark, sf()).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expected)
  }

  test("dedup-savings-by-source is consistent with the cluster table") {
    val savings = DedupOps.dedupSavingsBySource.build(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val clusters = DedupOps.persistedDocClusters(spark, sf())
    val nDocs = clusters.count()
    val nReps = clusters.filter(col("id") === col("cluster")).count()
    assert(savings.map(_._2).sum == nDocs)
    assert(savings.map(_._3).sum == nDocs - nReps)
  }
}
