package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariant tests for the round-4 search/quality ops (text-bm25-topk,
  * text-repetition, sim-rrf-hybrid, mm-phash-dedup) over the sf0.001
  * fixtures. Value-exactness vs DuckDB is the driver gate's job; these pin
  * the structural properties that must hold at any scale.
  */
class OpsR5Spec extends SparkSpec {

  test("text-bm25-topk: ≤10 rows, descending positive scores, hits contain a query term") {
    val r = TextOps.textBm25Topk.build(spark, sf()).collect()
    assert(r.nonEmpty && r.length <= 10)
    val scores = r.map(_.getDouble(2)).toSeq
    assert(scores === scores.sorted.reverse, "ordered by bm25 desc")
    assert(scores.forall(_ > 0), "non-negative idf keeps every match positive")
    val hitIds = r.map(_.getLong(0)).toSet
    val docs = graft.Tables.documents(spark, sf())
      .filter(col("doc_id").isin(hitIds.toSeq: _*))
      .select("doc_id", "text").collect()
      .map(row => row.getLong(0) -> row.getString(1)).toMap
    hitIds.foreach { id =>
      val ws = docs(id).split(" ").toSet
      assert(Seq("dup", "vector", "spark").exists(ws.contains),
        s"doc $id scored without containing a query term")
    }
  }

  test("text-bm25-topk: a rare-term doc outranks common-term-only docs") {
    // 'dup' has df≈25/500 vs 'vector'/'spark' df≈380 — idf dominates, so
    // every doc containing 'dup' must outscore every doc matching only
    // common terms (same ballpark tf/dl on this fixture).
    val r = TextOps.textBm25Topk.build(spark, sf()).collect()
    val docs = graft.Tables.documents(spark, sf()).select("doc_id", "text").collect()
      .map(row => row.getLong(0) -> row.getString(1).split(" ").toSet).toMap
    val top = r.head.getLong(0)
    assert(docs(top).contains("dup"), "top hit carries the rare term")
  }

  test("text-repetition: one row per doc, fraction bounds, top ≤ dup coupling") {
    val r = TextOps.textRepetition.build(spark, sf()).collect()
    val nDocs = graft.Tables.documents(spark, sf()).count()
    assert(r.length.toLong === nDocs)
    r.foreach { row =>
      val (n2, dup2, top2, dup3) =
        (row.getLong(1), row.getDouble(2), row.getDouble(3), row.getDouble(4))
      assert(n2 >= 1)
      Seq(dup2, top2, dup3).foreach(f => assert(f >= 0.0 && f <= 1.0))
      // the most frequent 2-gram is itself a repeat iff its count > 1
      // (fractions are 6-dp rounded — recover the integer count first)
      if (math.round(top2 * n2) > 1) assert(dup2 >= top2 - 1e-6,
        "repeated top gram counts toward the duplicate fraction")
      else assert(dup2 === 0.0, "all grams unique → zero duplicate fraction")
    }
  }

  test("sim-rrf-hybrid: 5 per query, rrf matches the rank arithmetic, descending") {
    val r = SimOps.simRrfHybrid.build(spark, sf()).collect()
    val byQ = r.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 10L).toSet)
    byQ.foreach { case (_, rows) =>
      assert(rows.length === 5)
      val rrfs = rows.map(_.getDouble(4)).toSeq
      assert(rrfs === rrfs.sorted.reverse, "fused list ordered by rrf desc")
    }
    r.foreach { row =>
      val (rv, rl, rrf) = (row.getInt(2), row.getInt(3), row.getDouble(4))
      assert(rv >= 0 && rv <= 20 && rl >= 0 && rl <= 20)
      assert(rv > 0 || rl > 0, "fused docs come from at least one list")
      def c(rank: Int): Long = if (rank == 0) 0L else math.round(1000000.0 / (60 + rank))
      assert(math.abs(rrf - (c(rv) + c(rl)) / 1000000.0) < 1e-9,
        "rrf is exactly the micro-unit rank sum")
    }
  }

  test("mm-phash-dedup: canonical pair order, hamming within threshold, identical text → distance 0") {
    val r = MultimodalOps.mmPhashDedup.build(spark, sf()).collect()
    r.foreach { row =>
      assert(row.getLong(0) < row.getLong(1), "d1 < d2 canonical order")
      val h = row.getInt(2)
      assert(h >= 0 && h <= 10)
    }
    assert(r.map(row => (row.getLong(0), row.getLong(1))).distinct.length === r.length)
    // exact-duplicate texts must collide at hamming 0 and be band-mates
    val dupPair = graft.Tables.documents(spark, sf())
      .groupBy("text").agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(sort_array(col("ids"))).collect()
      .map(_.getSeq[Long](0)).headOption
    dupPair.foreach { ids =>
      val found = r.exists(row =>
        row.getLong(0) == ids(0) && row.getLong(1) == ids(1) && row.getInt(2) == 0)
      assert(found, s"exact dup pair ${ids.take(2)} not reported at hamming 0")
    }
  }

  test("pipeline-preprocess: one decision per doc, keep = no flag, rules consistent") {
    val r = PipelineOps.pipelinePreprocess.build(spark, sf()).collect()
    val nDocs = graft.Tables.documents(spark, sf()).count()
    assert(r.length.toLong === nDocs)
    r.foreach { row =>
      val flags = (1 to 5).map(row.getBoolean)
      assert(row.getBoolean(6) === !flags.exists(identity), "keep == no flag set")
      if (row.getLong(0) < 50) assert(!row.getBoolean(5),
        "the benchmark slice is never contamination-flagged")
    }
    assert(r.exists(_.getBoolean(6)), "pipeline keeps something")
    assert(r.exists(row => (1 to 5).exists(row.getBoolean)), "pipeline drops something")
    // the exact-dup rule must flag exactly the non-min members of
    // duplicate-text groups
    val exactDrops = r.filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    val expected = graft.Tables.documents(spark, sf())
      .groupBy("text").agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")) >= 2).collect()
      .flatMap(_.getSeq[Long](1).sorted.tail).toSet
    assert(exactDrops === expected)
  }

  test("phash fingerprint fits in 48 bits and is length-robust") {
    val fps = graft.Tables.documents(spark, sf())
      .select(graft.multimodal.Multimodal.phash(col("text")).as("fp"))
      .collect().map(_.getLong(0))
    assert(fps.forall(fp => fp >= 0L && fp < (1L << 48)))
    assert(fps.distinct.length > 1, "fingerprint actually discriminates")
  }
}
