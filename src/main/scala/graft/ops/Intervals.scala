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
  * through one partition, so islands run in phases — (1) local islands
  * inside `bucketSize` buckets, computed in parallel with a window
  * partitioned by bucket; (2) a fixed lazy pyramid of coarser bucketed
  * merge levels, each operating on |islands| rows, not |keys|; (3) one
  * stitch window over the post-pyramid island set. No driver action runs
  * between phases — the whole thing composes into one job.
  */
object Intervals {

  /** Collapse a column of distinct non-negative longs into maximal
    * contiguous [s, e] intervals. Output columns: s, e.
    *
    * The whole pipeline is LAZY — one job at action time, zero driver
    * round-trips (no bounds probe, no count actions; a prior design gated
    * an adaptive loop on a min/max scan, which cost an extra job on every
    * call). Instead a fixed pyramid of `levels` bucketed merge passes runs
    * unconditionally after the local pass, each 1000× coarser: in the
    * common case the levels shuffle a few thousand already-reduced island
    * rows (sub-millisecond stages), and in the adversarial case (every
    * other key missing → n/2 islands) each level collapses whatever its
    * coarser buckets can. The final stitch window then sees the
    * post-pyramid island count — for anything but a pathologically
    * unmergeable key set that is report-sized, and for the pathological
    * set the island set IS the output, which any exact algorithm must
    * materialize. Each level costs one small shuffle stage (~0.2 s
    * measured at local[32]), so the default is ONE level: at bucketSize
    * 1000 it caps the stitch input at span/10^6 + the true island count —
    * for the blockchain height domain (span ≤ ~2^31) that is ≤ ~2000 rows
    * plus real islands. Pass more levels for wider key domains.
    */
  def islands(df: DataFrame, key: String, bucketSize: Long = 1000L,
      levels: Int = 1): DataFrame = {
    val keys = df.select(col(key).as("_k"))
    var iv = localIslands(keys, "_k", bucketSize)
    var width = bucketSize
    for (_ <- 1 to levels) {
      width *= 1000
      iv = bucketedMerge(iv, width)
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
