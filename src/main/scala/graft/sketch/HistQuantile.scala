package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared fixed-range histogram quantile sketch — the streaming-friendly
  * sibling of [[graft.ops.AggOps]]'s agg-quantile-sketch (whose bounds are
  * data-dependent min/max, a two-pass batch luxury): 64 equal-width
  * buckets over a FIXED integer-cent range, so the sketch needs no
  * pre-pass and merges by pure count addition — across partitions,
  * micro-batches, shards and days. Backs [[graft.ops.StreamOps]]'s
  * stream-quantile and the live windowed path
  * ([[graft.streaming.Streams.quantileSketchLive]]).
  *
  * Exactness discipline: bucket = clamp(0, 63, floor(cents/width)) —
  * the one division is IEEE-exact for |cents| < 2^53 and both engines
  * floor it identically; rank = ceil(0.9·n) via (9n+9) div 10 and the
  * estimate = bucket lower bound are pure integers — streamed and batch
  * sketches are bit-identical.
  */
object HistQuantile {

  val Buckets = 64
  /** 800-cent buckets cover [0, 512) dollars — the fixture's value range
    * with headroom; values past EITHER edge clip into the boundary bucket
    * (the standard fixed-range trade: edge estimates saturate, counts
    * stay exact). The lower clamp is what keeps the per-key state bound
    * true — without it a refund-style negative value would mint one
    * counter per distinct negative bucket.
    */
  val WidthCents = 800L

  def bucket(cents: Column): Column =
    greatest(lit(0L),
      least(lit(Buckets - 1L), floor(cents / WidthCents).cast("long")))

  /** The sketch: (keys..., bucket) → cnt. Mergeable by addition. */
  def sketch(ev: DataFrame, keys: Seq[String], cents: Column): DataFrame =
    ev.groupBy((keys.map(col) :+ bucket(cents).as("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Read-time fold: per key group, n and the p90 estimate (lower bound
    * of the bucket holding the rank-⌈0.9n⌉ value). The cumulative window
    * runs over ≤ 64 rows per group — bounded by configuration.
    */
  def estimate(sk: DataFrame, keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    // n and the cumulative ride the SAME ≤64-row-per-group window sort —
    // one lineage, no self-join (a join of two branches of one sketch
    // DataFrame trips conflicting-reference resolution, and the group is
    // bounded by configuration anyway).
    val grp = Window.partitionBy(keyCols: _*)
    val cum = sk
      .withColumn("cm", sum("cnt").over(grp.orderBy("bucket")))
      .withColumn("n", sum("cnt").over(grp))
    cum.filter(col("cm") >= expr("(9 * n + 9) div 10"))
      .groupBy((keyCols :+ col("n")): _*)
      .agg(min("bucket").as("bq"))
      .select((keyCols :+ col("n") :+
        (col("bq") * WidthCents).as("p90_est_cents")): _*)
  }
}
