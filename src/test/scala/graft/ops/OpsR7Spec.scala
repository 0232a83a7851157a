package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariant tests for the round-5 second batch (text-winnowing,
  * text-collocations, dedup-weights) over the sf0.001 fixtures. The
  * driver gate owns value-exactness vs DuckDB; these pin the semantics
  * independently — including a from-scratch Scala winnowing oracle.
  */
class OpsR7Spec extends SparkSpec {

  /** The portable gram hash the op uses since round 7: fold
    * (h·31 + char) mod (2³¹−1) over the space-joined gram's UTF-16 code
    * units (the same family as TextAnalysis.polyHash).
    */
  private def polyHash(s: String): Long = {
    var h = 0L; var i = 0
    while (i < s.length) { h = (h * 31 + s.charAt(i).toLong) % 2147483647L; i += 1 }
    h
  }

  /** Reference winnowing (k=4-token grams, w=4 windows, first-window per
    * distinct fp) written against the paper, not the op's plan.
    */
  private def winnow(toks: IndexedSeq[String]): Map[Long, Long] = {
    if (toks.size < 4) return Map.empty
    val gs = toks.sliding(4).map(g => polyHash(g.mkString(" "))).toVector
    val nw = math.max(1, gs.size - 3)
    (1 to nw).map(j => (gs.slice(j - 1, j + 3).min, j.toLong))
      .groupBy(_._1).map { case (fp, xs) => fp -> xs.map(_._2).min }
  }

  test("text-winnowing matches a from-scratch scala implementation on every doc") {
    val expected = graft.Tables.documents(spark, sf())
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> winnow(r.getString(1).split(" ").toIndexedSeq))
      .toMap
    val got = TextOps.textWinnowing.build(spark, sf()).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => r.getLong(2) -> r.getLong(1)).toMap
      }
    val expNonEmpty = expected.filter(_._2.nonEmpty)
    assert(got.keySet === expNonEmpty.keySet)
    expNonEmpty.foreach { case (id, exp) =>
      assert(got(id) === exp, s"doc $id fingerprint set diverges")
    }
  }

  test("text-winnowing guarantees a fingerprint selection for every window") {
    // density property: each window's min gram hash appears in the output
    // with a first-selection position no later than that window
    val sample = TextOps.textWinnowing.build(spark, sf()).collect()
      .groupBy(_.getLong(0))
    sample.foreach { case (_, rows) =>
      rows.foreach { r =>
        assert(r.getLong(1) >= 1)
        assert(r.getLong(2) >= 0L && r.getLong(2) < 2147483647L)
      }
    }
    assert(sample.nonEmpty)
  }

  test("text-collocations: thresholds, ordering, and recounted pair frequencies") {
    val r = TextOps.textCollocations.build(spark, sf()).collect()
    assert(r.nonEmpty && r.length <= 20)
    val lifts = r.map(_.getDouble(3))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b }, "lift descending")
    r.foreach(row => assert(row.getLong(2) >= 5, "min-count threshold"))
    // recount the top pair straight off the corpus
    val (w1, w2, cxy) = (r.head.getString(0), r.head.getString(1), r.head.getLong(2))
    val toks = graft.Tables.documents(spark, sf())
      .select(split(col("text"), " ").as("ws"))
    val recount = toks
      .select(explode(expr("transform(sequence(1, size(ws) - 1), i -> struct(element_at(ws, i) as a, element_at(ws, i + 1) as b))")).as("p"))
      .filter(col("p.a") === w1 && col("p.b") === w2)
      .count()
    assert(recount === cxy, s"recounted $w1 $w2")
    // lift must exceed 1 for a genuine collocation at the top
    assert(r.head.getDouble(3) > 1.0)
  }

  test("text-bigram-logprob: one score per multi-token doc, coherent with token counts") {
    val r = TextOps.textBigramLogprob.build(spark, sf()).collect()
    val nTok = graft.Tables.documents(spark, sf())
      .select(col("doc_id"), size(split(col("text"), " ")).as("n")).collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r.length === nTok.count(_._2 >= 2))
    r.foreach { row =>
      assert(row.getLong(1) === nTok(row.getLong(0)) - 1L, "n_bigrams = n_tokens - 1")
      assert(row.getDouble(2) < 0.0, "log-probs are negative")
      assert(row.getDouble(3) > 1.0, "perplexity proxy above 1")
    }
    // the bigram model separates docs more than the unigram model ranks
    // alone would: scores exist and vary
    assert(r.map(_.getDouble(2)).distinct.length > 1)
  }

  test("text-tfidf-topk matches a from-scratch scala tf-idf on every doc") {
    val docs = graft.Tables.documents(spark, sf())
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val n = docs.length.toLong
    val dfMap = docs.flatMap { case (_, ws) => ws.distinct }
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val expected = docs.map { case (id, ws) =>
      val scored = ws.groupBy(identity).toSeq.map { case (w, xs) =>
        (w, math.round(xs.length * (n.toDouble / dfMap(w)) * 1e6))
      }
      id -> scored.sortBy { case (w, s0) => (-s0, w) }.take(5)
        .zipWithIndex.map { case ((w, s0), i) => (w, s0, i + 1L) }
    }.toMap
    val got = TextOps.textTfidfTopk.build(spark, sf()).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(4)).map(r =>
          (r.getString(1), math.round(r.getDouble(3) * 1e6), r.getLong(4))).toSeq
      }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, exp) =>
      assert(got(id) === exp, s"doc $id top terms diverge")
    }
  }

  test("text-source-drift: TVD bounds hold and a scala recompute agrees") {
    val rows = TextOps.textSourceDrift.build(spark, sf()).collect()
    assert(rows.nonEmpty)
    val toks = graft.Tables.documents(spark, sf())
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ").map(w => (r.getString(0), w)))
    val n = toks.length.toDouble
    val cw = toks.groupBy(_._2).map { case (w, xs) => w -> xs.length }
    val bySrc = toks.groupBy(_._1)
    rows.foreach { row =>
      val (src, nTok, tvd) = (row.getString(0), row.getLong(1), row.getDouble(2))
      assert(tvd >= 0.0 && tvd <= 1.0, "TVD is a [0,1] metric")
      val mine = bySrc(src).map(_._2)
      assert(mine.length.toLong === nTok)
      val cSw = mine.groupBy(identity).map { case (w, xs) => w -> xs.length }
      val sum = cw.map { case (w, c) =>
        math.round(math.abs(
          cSw.getOrElse(w, 0).toLong / mine.length.toDouble - c / n) * 1e12)
      }.sum
      val expected = math.round(sum / 2000000.0) / 1e6
      assert(math.abs(tvd - expected) < 1e-9, s"source $src: $tvd vs $expected")
    }
  }

  test("text-cdc-chunks: chunks tile every document exactly") {
    val nTok = graft.Tables.documents(spark, sf())
      .select(col("doc_id"), size(split(col("text"), " ")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val byDoc = TextOps.textCdcChunks.build(spark, sf()).collect()
      .groupBy(_.getLong(0))
    assert(byDoc.keySet === nTok.keySet, "every doc is chunked")
    byDoc.foreach { case (doc, rows) =>
      val cs = rows.sortBy(_.getLong(1)).map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6)))
      assert(cs.head._2 === 1L, s"doc $doc starts at token 1")
      assert(cs.last._3 === nTok(doc), s"doc $doc ends at its last token")
      cs.toSeq.sliding(2).foreach {
        case Seq((_, _, e1, _, _), (_, s2, _, _, _)) =>
          assert(s2 === e1 + 1, s"doc $doc chunks are contiguous")
        case _ => ()
      }
      cs.foreach { case (_, s0, e0, n0, dups) =>
        assert(n0 === e0 - s0 + 1)
        assert(dups >= 1L)
      }
    }
  }

  test("sim-label-stats matches a from-scratch scala inertia computation") {
    val vecs = graft.Tables.embeddings(spark, sf())
      .select(col("label"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    val byLabel = vecs.groupBy(_._1)
    val r = SimOps.simLabelStats.build(spark, sf()).collect()
    assert(r.map(_.getLong(1)).sum === vecs.length.toLong, "labels partition the corpus")
    r.foreach { row =>
      val (label, n, got) = (row.getInt(0), row.getLong(1), row.getDouble(2))
      val vs = byLabel(label).map(_._2)
      assert(vs.length.toLong === n)
      val dims = vs.head.length
      val cent = (0 until dims).map { j =>
        vs.map(v => math.round(v(j) * 1e6)).sum / 1e6 / vs.length
      }
      val meanD2 = vs.map(v =>
        (0 until dims).map(j => math.round((v(j) - cent(j)) * (v(j) - cent(j)) * 1e12)).sum
      ).sum.toDouble / vs.length / 1e12
      assert(math.abs(got - meanD2) < 2e-6, s"label $label: $got vs $meanD2")
      assert(got > 0.0)
    }
  }

  test("dedup-weights: weights neutralize duplication in expectation") {
    val r = DedupOps.dedupWeights.build(spark, sf()).collect()
    val nDocs = graft.Tables.documents(spark, sf()).count()
    assert(r.length.toLong === nDocs, "every doc keeps a row")
    r.foreach { row =>
      val (n, w) = (row.getLong(1), row.getDouble(2))
      assert(n >= 1 && w > 0.0 && w <= 1.0)
      if (n === 1L) assert(w === 1.0)
      // group contribution n * w ≈ 1 within micro-unit rounding
      assert(math.abs(n * w - 1.0) <= n * 1e-6)
    }
  }
}
