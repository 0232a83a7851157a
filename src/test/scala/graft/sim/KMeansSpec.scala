package graft.sim

import graft.SparkSpec

/** KMeans contract: separable data converges to per-cluster means, and the
  * result is bit-identical under repartitioning (integer-scaled sums).
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around orthogonal directions; parity split so the
  // deterministic init (two lowest ids) seeds one centroid in each
  private def data = (0L to 9L).map { i =>
    val eps = (i / 2).toFloat / 100f
    if (i % 2 == 0) (i, Array(1.0f + eps, 0.0f)) else (i, Array(0.0f, 1.0f + eps))
  }

  test("separable clusters converge to their element means") {
    val got = KMeans.fit(data.toDF("vec_id", "embedding"), k = 2, iters = 3)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(got.length === 2)
    val Seq(c0, c1) = got.map(_._2).toSeq
    // cluster means: dim0 ≈ mean(1.00..1.04) = 1.02 for evens, 0 for odds
    assert(math.abs(c0.head - 1.02) < 1e-6, c0)
    assert(c0(1) === 0.0)
    assert(c1.head === 0.0)
    assert(math.abs(c1(1) - 1.02) < 1e-6, c1)
  }

  test("fit is deterministic under repartitioning") {
    val df = data.toDF("vec_id", "embedding")
    def run(parts: Int) = KMeans.fit(df.repartition(parts), k = 2, iters = 3)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toList)).toSeq
    assert(run(1) === run(7))
  }

  test("fitted centroids drive ivfTopK end to end with full recall on separable data") {
    // 3 tight direction clusters; queries drawn from each cluster must
    // find their brute-force neighbors through the trained inverted lists
    val rnd = new scala.util.Random(11)
    val corpus = (0L to 89L).map { i =>
      val axis = (i % 3).toInt
      val v = Array.fill(4)(rnd.nextFloat() * 0.05f)
      v(axis) = 1.0f + rnd.nextFloat() * 0.05f
      (i, v)
    }
    val df = corpus.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 3)   // one per cluster (ids 0,1,2)
    val rest = df.filter($"vec_id" >= 3)
    val cents = KMeans.fit(df, k = 3, iters = 3)
    val ivf = Similarity.ivfTopK(queries, rest, cents, k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(queries, rest, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf === brute) // separable clusters → nprobe=1 already exact
  }

  test("int8 quantization: zero vectors yield zero codes and scale 0") {
    import org.apache.spark.sql.functions._
    val df = Seq((0L, Array(0.0f, 0.0f, 0.0f)), (1L, Array(1.27f, -1.27f, 0.635f)))
      .toDF("vec_id", "embedding")
    val (codes, scale) = Similarity.quantizeInt8(col("embedding"))
    val got = df.select(col("vec_id"), codes.as("c"), scale.as("s"))
      .orderBy("vec_id").collect()
    assert(got(0).getSeq[Long](1) === Seq(0L, 0L, 0L))
    assert(got(0).getDouble(2) === 0.0)
    // 0.635f widens to 0.63499999…, so the code lands at 63, not 64 —
    // float32 inputs quantize on their true widened values
    assert(got(1).getSeq[Long](1) === Seq(127L, -127L, 63L))
    assert(math.abs(got(1).getDouble(2) - 0.01) < 1e-9)
  }

  test("a cluster that loses every member keeps its previous centroid") {
    // three identical vectors: init takes ids 0 and 1 (identical), every
    // point ties to centroid 0 — centroid 1 must survive untouched
    val df = (0L to 2L).map(i => (i, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = KMeans.fit(df, k = 2, iters = 2)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    assert(got.length === 2)
    assert(got(0) === got(1)) // both stay at the (identical) init vector
  }
}
