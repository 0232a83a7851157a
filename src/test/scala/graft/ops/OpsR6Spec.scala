package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariant tests for the round-5 extension ops (dedup-substring-spans,
  * sim-range-search, text-mix-weights, text-length-histogram) over the
  * sf0.001 fixtures. Value-exactness vs DuckDB is the driver gate's job;
  * these pin the structural properties that must hold at any scale.
  */
class OpsR6Spec extends SparkSpec {

  test("dedup-substring-spans: well-formed, disjoint, gap-separated spans per doc") {
    val r = DedupOps.dedupSubstringSpans.build(spark, sf()).collect()
    assert(r.nonEmpty, "the fixture has exact dups, so shared passages exist")
    r.foreach { row =>
      val (s0, e0, ns) = (row.getLong(1), row.getLong(2), row.getLong(3))
      assert(s0 >= 1, "positions are 1-based")
      assert(e0 - s0 + 1 >= 8, "a span covers at least one 8-gram")
      assert(ns >= 1 && ns <= e0 - 7 - s0 + 1, "shingle count bounded by start slots")
    }
    r.groupBy(_.getLong(0)).foreach { case (doc, rows) =>
      val spans = rows.map(x => (x.getLong(1), x.getLong(2))).sortBy(_._1).toSeq
      spans.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) =>
          // merged islands: consecutive spans are separated by a real gap
          // (next start strictly beyond previous end + 1 shingle width)
          assert(s2 > e1 + 1, s"doc $doc spans touch: end=$e1 next=$s2")
        case _ => ()
      }
    }
  }

  test("dedup-substring-spans: an exact-dup doc is one full-document span") {
    // only sf0.1 carries exact-dup documents of >=8 tokens (the smaller
    // fixtures' dups are short docs below one shingle width)
    val dir = sf("sf0.1")
    val dup = graft.Tables.documents(spark, dir)
      .groupBy("text").agg(min("doc_id").as("id"),
        count(lit(1)).as("n"), max(size(split(col("text"), " "))).as("ntok"))
      .filter(col("n") >= 2 && col("ntok") >= 8)
      .select("id", "ntok").collect()
    assert(dup.nonEmpty, "fixture has exact dups of >=8 tokens")
    val spans = DedupOps.dedupSubstringSpans.build(spark, dir).collect()
      .groupBy(_.getLong(0))
    dup.foreach { d0 =>
      val (id, ntok) = (d0.getLong(0), d0.getInt(1).toLong)
      val s = spans.getOrElse(id, Array.empty)
      assert(s.length == 1, s"exact-dup doc $id should be one span")
      assert(s.head.getLong(1) == 1L && s.head.getLong(2) == ntok,
        s"doc $id span should cover 1..$ntok")
    }
  }

  test("sim-range-search: thresholded, queries only, superset of thresholded top-k hits") {
    val range = SimOps.simRangeSearch.build(spark, sf()).collect()
    range.foreach { row =>
      assert(row.getLong(0) < 10 && row.getLong(1) >= 10)
      assert(row.getDouble(2) >= 0.30)
    }
    val rangeSet = range.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rangeSet.size == range.length, "no duplicate (q, n) pairs")
    val topkOver = SimOps.simTopkCosine.build(spark, sf()).collect()
      .filter(_.getDouble(2) >= 0.30)
    topkOver.foreach { t =>
      assert(rangeSet.contains((t.getLong(0), t.getLong(1))),
        s"top-k hit ${t.getLong(0)}->${t.getLong(1)} missing from range results")
    }
  }

  test("text-mix-weights: downsample-only weights that level sources to the target") {
    val r = TextOps.textMixWeights.build(spark, sf()).collect()
    val total = r.map(_.getLong(1)).sum
    val target = total.toDouble / r.length
    r.foreach { row =>
      val (n, w, keep) = (row.getLong(1), row.getDouble(2), row.getLong(3))
      assert(w > 0.0 && w <= 1.0)
      assert(keep <= n, "never keeps more than exists")
      if (n <= target) assert(w == 1.0, "under-target sources are untouched")
      else assert(math.abs(keep - target) <= n * 1e-6 + 1,
        s"over-target source keeps ~target: keep=$keep target=$target")
    }
  }

  test("text-length-histogram: partitions the corpus into consistent log2 buckets") {
    val r = TextOps.textLengthHistogram.build(spark, sf()).collect()
    val nDocs = graft.Tables.documents(spark, sf()).count()
    assert(r.map(_.getLong(1)).sum === nDocs, "buckets partition the corpus")
    r.foreach { row =>
      val (b, mn, mx, sm) =
        (row.getLong(0), row.getLong(2), row.getLong(3), row.getLong(4))
      assert(mn >= (1L << (b - 1)) && mx < (1L << b),
        s"bucket $b bounds violated: [$mn, $mx]")
      assert(sm >= mn * row.getLong(1) && sm <= mx * row.getLong(1))
    }
    val buckets = r.map(_.getLong(0)).toSeq
    assert(buckets == buckets.sorted && buckets.distinct == buckets)
  }
}
