package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The memoized-centroid contract (VERDICT r11 item 6) and the degenerate
  * single-vector corpus (ADVICE r11).
  *
  * The (session, dir, k) WeakHashMap cache behind `ops.SimOps.fittedCentroids`
  * feeds six board ops; its failure modes are silent — a re-fit on a hit
  * would just be slow, but a shared entry across DIRS would assign stale
  * centroids to every downstream op after a fixture rewrite. Both halves
  * are pinned here: a cache hit performs ZERO Spark jobs (statusTracker
  * job-group count), and two dirs never share an entry (distinct fixtures
  * must yield distinct centroids, each fit running real jobs).
  */
class CentroidCacheSpec extends SparkSpec {
  import spark.implicits._

  /** Runs `body` inside a fresh job group; returns the number of Spark
    * jobs it submitted (collect() is blocking, so by return time every
    * submitted job is registered with the status tracker).
    */
  private def jobsDuring(body: => Unit): Int = {
    val group = s"centroid-cache-probe-${System.nanoTime()}"
    spark.sparkContext.setJobGroup(group, "cache probe", false)
    try body finally spark.sparkContext.clearJobGroup()
    spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
  }

  private def writeEmbeddings(dir: String, vecs: Seq[(Long, Array[Float])]): Unit =
    vecs.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag-").toString

  // two separable 4-dim fixtures with DIFFERENT cluster directions, so a
  // cross-dir cache hit is detectable by value, not just by job count
  private def fixtureA = (0L to 7L).map { i =>
    val v = Array.fill(4)(0.0f); v((i % 2).toInt) = 1.0f + i / 100f; (i, v)
  }
  private def fixtureB = (0L to 7L).map { i =>
    val v = Array.fill(4)(0.0f); v((i % 2).toInt + 2) = 1.0f + i / 100f; (i, v)
  }

  test("second fittedCentroids call with the same (dir, k) runs zero Spark jobs") {
    val dir = freshDir("cc-a")
    writeEmbeddings(dir, fixtureA)
    val first = jobsDuring { graft.ops.SimOps.fittedCentroids(spark, dir, 2) }
    assert(first > 0, "first fit must execute real Spark jobs")
    val second = jobsDuring { graft.ops.SimOps.fittedCentroids(spark, dir, 2) }
    assert(second === 0, s"cache hit ran $second Spark job(s)")
  }

  test("a different k on the same dir is a distinct entry (fits again)") {
    val dir = freshDir("cc-k")
    writeEmbeddings(dir, fixtureA)
    graft.ops.SimOps.fittedCentroids(spark, dir, 2)
    val other = jobsDuring { graft.ops.SimOps.fittedCentroids(spark, dir, 4) }
    assert(other > 0, "k=4 must not ride the k=2 entry")
  }

  test("two dirs never share an entry — stale-centroid hazard") {
    val dirA = freshDir("cc-dirs-a")
    val dirB = freshDir("cc-dirs-b")
    writeEmbeddings(dirA, fixtureA)
    writeEmbeddings(dirB, fixtureB)
    val ca = graft.ops.SimOps.fittedCentroids(spark, dirA, 2)
    val jobsB = jobsDuring {
      val cb = graft.ops.SimOps.fittedCentroids(spark, dirB, 2)
      assert(ca.map(_._2) !== cb.map(_._2),
        "dirB returned dirA's centroids — cross-dir cache collision")
    }
    assert(jobsB > 0, "dirB's fit must execute, not hit dirA's entry")
  }

  test("single-vector corpus: fit degrades to one centroid instead of throwing") {
    // KMeans init = the k lowest vec_ids; a 1-row corpus collapses that to
    // ONE centroid and the assignment argmax must fold to the bare struct
    // (Spark's greatest requires >= 2 args — ADVICE r11)
    val one = Seq((42L, Array(0.6f, 0.8f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val cents = KMeans.fit(one, k = 4, iters = 2).collect()
    assert(cents.length === 1)
    assert(cents.head.getLong(0) === 0L)
  }

  test("sim-kmeans-elbow returns its 3-row curve on a single-embedding corpus") {
    val dir = freshDir("cc-one")
    writeEmbeddings(dir, Seq((7L, Array(0.6f, 0.8f, 0.0f, 0.0f))))
    val rows = graft.ops.SimOps.simKmeansElbow.build(spark, dir)
      .orderBy("k").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 4L, 8L))
    // one vector sits exactly on its own centroid: zero inertia at every k,
    // and every drop is NULL (prev > 0 never holds)
    assert(rows.forall(_.getLong(1) === 1L), "n_vecs")
    assert(rows.forall(_.getDouble(2) === 0.0), "mean_dist2")
    assert(rows.forall(_.isNullAt(3)), "drop_micro")
  }

  test("ivfTopK and assignToCentroids survive a one-centroid table") {
    val corpus = fixtureA.toDF("vec_id", "embedding")
    val centroids = Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val assigned = Similarity.assignToCentroids(corpus, centroids).collect()
    assert(assigned.length === fixtureA.size)
    assert(assigned.forall(_.getLong(1) === 0L))
    val hits = Similarity.ivfTopK(
      corpus.filter($"vec_id" === 0L), corpus, centroids, k = 3, nprobe = 2)
      .collect()
    assert(hits.length === 3)
  }
}
