package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means (Lloyd) over an embedding column —
  * the trainer for [[Similarity.ivfTopK]]'s centroid table, so the IVF
  * path is self-contained instead of assuming centroids from elsewhere.
  *
  * Determinism is load-bearing (inverted lists must be reproducible):
  *  - init is the k lowest `vec_id`s' vectors — no RNG;
  *  - assignment is the same `greatest` over per-centroid (rounded cosine,
  *    -cid) structs as ivfTopK — a pure projection over centroid literals,
  *    ZERO shuffle of the corpus;
  *  - centroid update sums integer-scaled elements (`round(v·10⁴)` longs):
  *    long addition is order-independent, so the new centroids cannot
  *    drift with partitioning, executor count or AQE decisions — a plain
  *    double sum would.
  *
  * Per round: one corpus-sized shuffle (the (cid, dim) groupBy, map-side
  * combined down to k·dims rows per task) and one k·dims-row collect —
  * config-sized, same scale as ivfTopK's own centroid collect. At 100 TB
  * fit on a sample (`corpus.sample`) like every practical k-means; the
  * assignment projection then scales to the full corpus for free.
  *
  * (The reference has no vector ops; this backs the scale-extension
  * similarity operators, SURVEY.md §7 phase 8.)
  */
object KMeans {

  /** `iters` Lloyd rounds from the deterministic init. Returns a centroid
    * table (vec_id = 0..k-1, embedding array<double>) shaped for
    * [[Similarity.ivfTopK]]. Clusters that lose every member keep their
    * previous centroid.
    */
  def fit(corpus: DataFrame, k: Int, iters: Int = 3): DataFrame = {
    require(k >= 2, "k-means needs k >= 2")
    val spark = corpus.sparkSession
    import spark.implicits._
    val e = corpus.select(col("vec_id"), col("embedding").cast("array<double>"))
    var centroids: IndexedSeq[Seq[Double]] = e.orderBy("vec_id").limit(k)
      .select("embedding").collect().map(_.getSeq[Double](0)).toIndexedSeq
    for (_ <- 1 to iters) {
      val structs = centroids.zipWithIndex.map { case (cv, ci) =>
        struct(Similarity.cosine(col("embedding"), typedLit(cv)).as("s"),
          lit(-ci.toLong).as("nc"))
      }
      val updated = e
        .withColumn("_b", Similarity.bestStruct(structs))
        .select((-col("_b.nc")).as("cid"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cid", "dim")
        .agg(sum(round(col("v") * 10000).cast("long")).as("sv"),
          count(lit(1)).as("n"))
        .select(col("cid"), col("dim"),
          round(col("sv") / col("n") / 10000.0, 6).as("v"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          cid.toInt -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i)))
    }
    centroids.zipWithIndex
      .map { case (cv, i) => (i.toLong, cv) }
      .toDF("vec_id", "embedding")
  }
}
