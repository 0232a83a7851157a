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
}
