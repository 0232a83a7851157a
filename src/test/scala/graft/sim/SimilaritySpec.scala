package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.0f, 1.0f, 0.0f), 0),
    (10L, Array(0.9f, 0.1f, 0.0f), 0),   // close to q0
    (11L, Array(0.0f, 0.95f, 0.05f), 0), // close to q1
    (12L, Array(-1.0f, 0.0f, 0.0f), 0)   // anti-correlated with q0
  ).toDF("vec_id", "embedding", "label")

  test("brute-force top-k ranks by cosine with deterministic ties") {
    val top = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") < 10), vecs.filter(col("vec_id") >= 10), k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top(0L) === 10L)
    assert(top(1L) === 11L)
  }

  test("cosine is exact on orthogonal/identical vectors") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"),
        Similarity.cosine(col("a"), col("a")).as("self"))
    val r = df.head()
    assert(r.getDouble(0) === 0.0)
    assert(r.getDouble(1) === 1.0)
  }

  test("lsh bucket is stable and integer-exact") {
    val b = vecs.select(col("vec_id"), Similarity.lshBucket(col("embedding")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // deterministic: recomputing yields identical buckets
    val b2 = vecs.select(col("vec_id"), Similarity.lshBucket(col("embedding")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b === b2)
    assert(b.values.forall(v => v >= 0 && v < 256), "8-bit buckets")
  }

  test("ann finds the bucket-mate neighbor when buckets align") {
    val ann = Similarity.annTopK(
      vecs.filter(col("vec_id") < 10), vecs.filter(col("vec_id") >= 10), k = 3)
      .collect()
    // every returned neighbor must share the query's bucket → sims are exact
    ann.foreach(r => assert(r.getDouble(2) <= 1.0 && r.getDouble(2) >= -1.0))
  }

  test("ivfPqTopK with nprobe = nlist degenerates to pqTopK exactly") {
    // 8-dim vectors, m=4 subspaces of 2; two IVF lists; probing BOTH lists
    // makes the candidate set the whole corpus, so the composed search must
    // return precisely the flat PQ result — codes, tables, ranks and all.
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val e = Seq(
      (0L, v(1, 0, 0, 0, 0, 0, 0, 0)),
      (1L, v(0, 0, 0, 0, 0, 0, 1, 0)),
      (10L, v(0.9, 0.1, 0, 0, 0, 0, 0, 0)),
      (11L, v(0.7, 0.3, 0.1, 0, 0, 0, 0, 0)),
      (12L, v(0, 0, 0, 0, 0.2, 0, 0.9, 0.1)),
      (20L, v(0, 0, 0, 0, 0, 0, 1, 0.2)),
      (21L, v(0.1, 0, 0, 0, 0.3, 0, 0.8, 0))
    ).toDF("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 10)
    val c = e.filter(col("vec_id") >= 10)
    val cents = e.filter(col("vec_id").isin(10L, 20L))
    val flat = Similarity.pqTopK(q, c, cents, k = 3, m = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val composed = Similarity.ivfPqTopK(q, c, cents, cents, k = 3, nprobe = 2, m = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(composed === flat)
  }

  test("ivfPqTopK with nprobe = 1 searches only the probed list") {
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val e = Seq(
      (0L, v(1, 0, 0, 0, 0, 0, 0, 0)),      // query: firmly in list 10
      (10L, v(0.9, 0.1, 0, 0, 0, 0, 0, 0)),
      (11L, v(0.8, 0.2, 0, 0, 0, 0, 0, 0)),
      (20L, v(0, 0, 0, 0, 0, 0, 1, 0.2)),   // other list
      (21L, v(0, 0, 0, 0.1, 0, 0, 0.9, 0))
    ).toDF("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 10)
    val c = e.filter(col("vec_id") >= 10)
    val cents = e.filter(col("vec_id").isin(10L, 20L))
    val got = Similarity.ivfPqTopK(q, c, cents, cents, k = 4, nprobe = 1, m = 4)
      .collect().map(_.getLong(1)).toSet
    // 20/21 live in the unprobed list and must be absent even with k = 4
    assert(got === Set(10L, 11L))
  }
}
