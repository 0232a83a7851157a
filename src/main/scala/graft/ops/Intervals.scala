package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over height sets — the Spark shape of the reference's
  * `RangeBag` (reference: src/archiver/range_bag.rs:7-95). The reference
  * compacts interval sets with an O(n²) fixpoint loop
  * (range_bag.rs:53-86); here it is a one-pass gaps-and-islands window.
  *
  * Scale design: a single global `Window.orderBy(key)` would funnel 100 TB
  * through one partition, so islands run in two phases — (1) local islands
  * inside `bucketSize` buckets, computed in parallel with a window
  * partitioned by bucket; (2) a merge pass over the bucket-level islands,
  * whose input is |islands|, not |keys|. For pathologically gappy data
  * (every other key missing) phase 2 input is still O(n/2); apply the same
  * two-phase step recursively until the island count fits one partition —
  * `islands` recurses when the estimate is above `mergeLimit`.
  */
object Intervals {

  /** Collapse a column of distinct non-negative longs into maximal
    * contiguous [s, e] intervals. Output columns: s, e.
    *
    * `mergeLimit` bounds what the final single-partition merge window may
    * see: while the local pass leaves more islands than that, another
    * bucketed (parallel) merge level runs with a coarser bucket — so even
    * an adversarial key set (every other key missing → n/2 islands) never
    * funnels raw-data-sized input through one task. Each level reduces the
    * row count to the island count within its buckets; levels are O(log)
    * and in practice 1.
    */
  def islands(df: DataFrame, key: String, bucketSize: Long = 1000L,
      mergeLimit: Long = 1000000L): DataFrame = {
    val keys = df.select(col(key).as("_k"))
    // Cheap gate: the island count can never exceed (keyRange/2)+1, and the
    // key range comes from a column-pruned min/max scan — far cheaper than
    // materializing + counting the windowed island set. When the worst case
    // already fits the final merge window, run the whole thing as ONE job
    // (no cache, no count actions).
    val bounds = keys.agg(min("_k").cast("long"), max("_k").cast("long")).head()
    if (bounds.isNullAt(0)) return mergeIslands(localIslands(keys, "_k", bucketSize))
    val worstCase = (bounds.getLong(1) - bounds.getLong(0)) / 2 + 1
    if (worstCase <= mergeLimit)
      return mergeIslands(localIslands(keys, "_k", bucketSize))
    // Adversarial path (key range > 2·mergeLimit): counted fixpoint over
    // LEVELS (log-many), not over rows like the reference's O(n²) RangeBag
    // loop (range_bag.rs:53-86). Stop when small enough OR when a level
    // stops reducing (the count has reached the true island count, which no
    // merge can shrink — then it IS the output size). The cache is worth it
    // here: each level and its count reuse the materialized islands.
    var iv = localIslands(keys, "_k", bucketSize).cache()
    var width = bucketSize
    var cnt = iv.count()
    var prev = Long.MaxValue
    while (cnt > mergeLimit && cnt < prev) {
      prev = cnt
      width *= 1000
      iv = bucketedMerge(iv, width)
      cnt = iv.count()
    }
    mergeIslands(iv)
  }

  /** One parallel merge level: islands whose START falls in the same
    * `width` bucket are merged with the in-bucket window; islands spanning
    * bucket edges are stitched by the next level / final pass.
    */
  private def bucketedMerge(iv: DataFrame, width: Long): DataFrame = {
    val w = Window.partitionBy("_b").orderBy("s", "e")
    iv.withColumn("_b", floor(col("s") / width).cast("long"))
      .withColumn("_pe", max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_brk", when(col("_pe").isNull || col("s") > col("_pe") + 1, 1).otherwise(0))
      .withColumn("_g", sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("_b", "_g")
      .agg(min("s").as("s"), max("e").as("e"))
      .select("s", "e")
  }

  /** Phase 1: islands within floor(key/bucketSize) buckets — fully parallel. */
  private def localIslands(df: DataFrame, key: String, bucketSize: Long): DataFrame = {
    val w = Window.partitionBy("_b").orderBy(key)
    df.withColumn("_b", floor(col(key) / bucketSize).cast("long"))
      .withColumn("_prev", lag(col(key), 1).over(w))
      .withColumn("_brk", when(col("_prev").isNull || col(key) - col("_prev") > 1, 1).otherwise(0))
      .withColumn("_g", sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("_b", "_g")
      .agg(min(key).as("s"), max(key).as("e"))
      .select("s", "e")
  }

  /** Phase 2: merge adjacent/overlapping islands. Input is already reduced
    * to interval rows; a running max over the global start-order finds
    * chain breaks (s > cummax(prev e) + 1).
    */
  private def mergeIslands(iv: DataFrame): DataFrame = {
    val w = Window.orderBy("s", "e")
    iv.withColumn("_pe", max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_brk", when(col("_pe").isNull || col("s") > col("_pe") + 1, 1).otherwise(0))
      .withColumn("_g", sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("_g")
      .agg(min("s").as("s"), max("e").as("e"))
      .select("s", "e")
  }

  /** `RangeBag::remove` — subtract [cutS, cutE] from every interval,
    * yielding 0/1/2 remainders per row (reference:
    * src/archiver/range.rs:197-213, range_bag.rs:34-49).
    */
  def subtract(iv: DataFrame, cutS: Long, cutE: Long): DataFrame = {
    val leftPart = iv
      .select(col("s"), least(col("e"), lit(cutS - 1)).as("e"))
      .filter(col("s") <= col("e"))
    val rightPart = iv
      .select(greatest(col("s"), lit(cutE + 1)).as("s"), col("e"))
      .filter(col("s") <= col("e"))
    leftPart.union(rightPart)
  }
}
