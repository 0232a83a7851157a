package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariant tests for the round-4 ops (sim-ann-recall, sim-embed-stats,
  * text-pii-scrub, text-token-histogram, text-corpus-stats) over the
  * sf0.001 fixtures. Value-exactness vs DuckDB is the driver gate's job;
  * these pin the structural properties that must hold at any scale.
  */
class OpsR4Spec extends SparkSpec {

  test("sim-ann-recall reports both methods for every query, recall in [0,1]") {
    val r = SimOps.simAnnRecall.build(spark, sf()).collect()
    val methods = r.map(_.getString(0)).toSet
    assert(methods === Set("lsh", "ivf"))
    val perMethod = r.groupBy(_.getString(0)).map { case (m, rows) => m -> rows.length }
    assert(perMethod.values.toSet.size === 1, "same query set under both methods")
    r.foreach { row =>
      val (hits, recall) = (row.getLong(2), row.getDouble(3))
      assert(recall >= 0.0 && recall <= 1.0)
      assert(hits >= 0 && hits <= 3)
      assert(math.abs(recall - hits / 3.0) < 1e-6, "recall = hits/k when k_eff = 3")
    }
  }

  test("sim-embed-stats: norm bounds element range, dims constant") {
    val r = SimOps.simEmbedStats.build(spark, sf()).collect()
    assert(r.nonEmpty)
    assert(r.map(_.getInt(1)).toSet.size === 1, "one embedding width per table")
    r.foreach { row =>
      val (l2, mn, mx) = (row.getDouble(2), row.getDouble(3), row.getDouble(4))
      assert(l2 >= math.max(math.abs(mn), math.abs(mx)) - 1e-6,
        "L2 norm dominates any single element")
      assert(mn <= mx)
    }
  }

  test("text-pii-scrub finds each planted PII kind and redacts it") {
    val r = SimOpsFixtures.textOp("text-pii-scrub", spark, sf()).collect()
    assert(r.length > 0)
    r.foreach { row =>
      assert(row.getLong(1) >= 1, "planted email found")
      assert(row.getLong(2) >= 1, "planted phone found")
      assert(row.getLong(3) >= 1, "planted ip found")
    }
  }

  test("text-token-histogram: cnt >= df, ordered by cnt desc") {
    val r = SimOpsFixtures.textOp("text-token-histogram", spark, sf()).collect()
    assert(r.nonEmpty && r.length <= 100)
    r.foreach(row => assert(row.getLong(1) >= row.getLong(2), "cnt >= df"))
    val cnts = r.map(_.getLong(1)).toSeq
    assert(cnts === cnts.sorted.reverse, "descending by cnt")
  }

  test("dedup-cluster-rep: representative is a member, clusters are dup-only") {
    val reps = DedupOps.dedupClusterRep.build(spark, sf()).collect()
    assert(reps.nonEmpty, "fixture contains near-dup clusters")
    reps.foreach { r =>
      val (cluster, keepId, n) = (r.getLong(0), r.getLong(1), r.getLong(3))
      assert(n >= 2, "dup clusters only")
      assert(keepId >= cluster, "cluster label is the min member id")
    }
    assert(reps.map(_.getLong(0)).distinct.length === reps.length, "one rep per cluster")
  }

  test("text-unigram-logprob: mean_logp negative, ppl consistent") {
    val r = SimOpsFixtures.textOp("text-unigram-logprob", spark, sf()).collect()
    assert(r.length === 500)
    r.foreach { row =>
      val (lp, ppl) = (row.getDouble(2), row.getDouble(3))
      assert(lp < 0.0, "log-prob of a non-certain token is negative")
      assert(math.abs(ppl - math.rint(math.exp(-lp) * 1e4) / 1e4) < 1e-9,
        "ppl_proxy = exp(-mean_logp) rounded")
    }
  }

  test("sim-pq-ann: 3 hits per query, deterministic, ranked within query") {
    val r1 = SimOps.simPqAnn.build(spark, sf()).collect()
    val r2 = SimOps.simPqAnn.build(spark, sf()).collect()
    assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq, "reproducible")
    val byQ = r1.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 10L).toSet)
    byQ.values.foreach { rows =>
      assert(rows.length === 3)
      val sims = rows.map(_.getDouble(2)).toSeq
      assert(sims === sims.sorted.reverse, "descending approx_sim per query")
    }
  }

  test("text-corpus-stats: shares sum to 1 over the whole corpus") {
    val r = SimOpsFixtures.textOp("text-corpus-stats", spark, sf()).collect()
    val shareSum = r.map(_.getDouble(5)).sum
    assert(math.abs(shareSum - 1.0) < 0.001, s"shares sum to ~1, got $shareSum")
    assert(r.map(_.getLong(2)).sum === 500L, "doc counts partition the corpus")
  }
}

/** Lookup helper so the spec reads op ids, mirroring the driver path. */
object SimOpsFixtures {
  def textOp(id: String, spark: org.apache.spark.sql.SparkSession, dir: String) =
    TextOps.ops.find(_.id == id).get.build(spark, dir)
}
