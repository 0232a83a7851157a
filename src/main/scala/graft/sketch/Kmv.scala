package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values sketch (Beyer et al. 2007) — the overlap companion to
  * [[Hll]]: where HLL answers "how many distinct", KMV's k smallest
  * hashes also answer "how much do two sets OVERLAP" (union cardinality
  * from the k-th minimum, Jaccard from sketch-row agreement), still
  * mergeable (union of sketches → re-take k minima) and still k integers
  * per group at any cardinality.
  *
  * Sketch build: distinct (group, hash) → k smallest per group through
  * the house salted two-phase [[graft.functions.TopK]] (a hot group's
  * candidate rows never funnel one window task). Pairwise estimation
  * joins k-row sketches — config-sized work no matter the corpus.
  *
  * Estimator parity: hashes are the md5-derived 60-bit integers of
  * [[Hll.hash60]]; the union estimate (k−1)·2⁶⁰/v_k and the rescaled
  * intersection are each ONE double division/multiplication on
  * integer-exact inputs with identical expression trees both sides —
  * no float ever aggregates. When a pair's union sketch holds fewer
  * than k values the sketches ARE the full sets and the op switches to
  * the exact regime (same CASE both sides, integer comparison).
  */
object Kmv {

  val K = 64
  /** 2^60 — the hash-space size of [[Hll.hash60]]. */
  val HashSpace = 1152921504606846976L

  /** One row per (group, h): the k smallest distinct key hashes. */
  def sketch(df: DataFrame, groupCol: String, keyCol: Column): DataFrame =
    graft.functions.TopK.topkPerGroup(
      df.select(col(groupCol), Hll.hash60(keyCol).as("h")).distinct(),
      Seq(groupCol), Seq(col("h").asc), K)

  /** Pairwise overlap estimates between every two groups (et_a < et_b):
    * est_union, est_inter, and micro-snapped est_jac. `pairs` must hold
    * (et_a, et_b); `sk` is [[sketch]] output with `groupCol` renamed out.
    */
  def pairOverlap(sk: DataFrame, groupCol: String): DataFrame = {
    val types = sk.select(col(groupCol)).distinct()
    val pairs = types.select(col(groupCol).as("et_a"))
      .crossJoin(types.select(col(groupCol).as("et_b")))
      .filter(col("et_a") < col("et_b"))
    // Sketch rows replicate per pair they belong to: #pairs × k rows.
    val u = broadcast(pairs)
      .join(sk, col(groupCol) === col("et_a") || col(groupCol) === col("et_b"))
      .groupBy("et_a", "et_b", "h")
      .agg(max(when(col(groupCol) === col("et_a"), 1).otherwise(0)).as("in_a"),
        max(when(col(groupCol) === col("et_b"), 1).otherwise(0)).as("in_b"))
    // Union sketch: k smallest of the combined hash set. The window is
    // bounded by 2k rows per pair — never data-sized.
    val w = Window.partitionBy("et_a", "et_b").orderBy("h")
    val ranked = u
      .withColumn("rn", row_number().over(w))
      .withColumn("n_u", count(lit(1)).over(Window.partitionBy("et_a", "et_b")))
    val agg = ranked.groupBy("et_a", "et_b")
      .agg(max("n_u").as("n_u"),
        max(when(col("rn") <= K, col("h"))).as("kth"),
        sum(when(col("rn") <= K && col("in_a") === 1 && col("in_b") === 1, 1L)
          .otherwise(0L)).as("c_both"))
    val sketchUnion =
      round(lit((K - 1).toDouble) * lit(HashSpace.toDouble) / col("kth")).cast("long")
    val estUnion = when(col("n_u") < K, col("n_u")).otherwise(sketchUnion)
    agg
      .withColumn("est_union", estUnion)
      .select(col("et_a"), col("et_b"), col("est_union"),
        // c_both·est_union can exceed 2^63 — multiply in DOUBLE (both
        // engines make the same IEEE long→double conversion).
        when(col("n_u") < K, col("c_both"))
          .otherwise(round(col("c_both").cast("double") *
            col("est_union").cast("double") / lit(K.toDouble))
            .cast("long")).as("est_inter"),
        (round(col("c_both") * lit(1000000.0) /
          when(col("n_u") < K, col("n_u")).otherwise(lit(K))).cast("long") /
          lit(1000000.0)).as("est_jac"))
  }
}
