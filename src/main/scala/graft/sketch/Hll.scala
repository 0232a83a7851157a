package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared HyperLogLog plumbing (Flajolet et al. 2007) for
  * [[graft.ops.AggOps]]'s agg-hll-distinct, [[graft.ops.StreamOps]]'s
  * stream-hll and the live windowed path
  * ([[graft.streaming.Streams.hllSketchLive]]). m = 64
  * buckets; the hash is md5-derived (cross-engine reproducible — the same
  * reason every house digest is md5), 60 bits: low 6 select the bucket,
  * the remaining 54 feed the leading-zero rank.
  *
  * The sketch IS the (group, bucket) → max(rho) table: max is
  * associative/commutative, so partials combine map-side, across
  * micro-batches, and across shards/days/clusters — the mergeability
  * that makes a sketch worth carrying at 100 TB. Estimation is a
  * 64-rows-per-group fold kept in exact integer space until one final
  * division (see [[estimate]]).
  */
object Hll {

  /** 2^55 — the integer scale of the harmonic sum: Σ 2^(55−r) with
    * r ∈ 1..55 stays in BIGINT (≤ 64·2^55 < 2^62), absent buckets
    * contribute exactly 2^55, and no float ever aggregates.
    */
  val Scale = 36028797018963968L

  /** 60-bit hash of the key: first 15 hex chars of md5. */
  def hash60(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  def bucket(h: Column): Column = pmod(h, lit(64))

  /** Leading-zero rank of the 54-bit remainder (1-based; w = 0 → 55).
    * length(bin(w)) is the libm-free integer bit length.
    */
  def rho(h: Column): Column = {
    val w = shiftright(h, 6)
    when(w === 0, lit(55)).otherwise(lit(55) - length(bin(w)))
  }

  /** The mergeable sketch: one row per (group, bucket) with r = max rho. */
  def sketch(df: DataFrame, groupCols: Seq[String], keyCol: Column): DataFrame = {
    val h = hash60(keyCol)
    df.select(groupCols.map(col) :+ bucket(h).as("bucket") :+ rho(h).as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rho").as("r"))
  }

  /** Estimate per group from a sketch table: raw E = α·m²/Σ2^−r with
    * α = 0.709, linear-counting branch for E ≤ 2.5m with V > 0 empty
    * buckets. The branch's ln input domain is enumerable (V ∈ 1..64;
    * worst round-half margin 9.5e-5, asserted in OpsR11Spec), so the
    * oracle's libm and the JVM's can never round apart.
    */
  def estimate(sketchDf: DataFrame, groupCols: Seq[String]): DataFrame =
    sketchDf.groupBy(groupCols.map(col): _*)
      .agg((sum(expr("shiftleft(1L, cast(55 - r as int))")) +
        (lit(64) - count(lit(1))) * lit(Scale)).as("zsum"),
        (lit(64) - count(lit(1))).as("v"))
      .withColumn("e_raw",
        lit(0.709) * lit(4096.0) * lit(36028797018963968.0) / col("zsum"))
      .select(groupCols.map(col) :+
        when(col("e_raw") <= 160.0 && col("v") > 0,
          round(lit(64.0) * log(lit(64.0) / col("v"))).cast("long"))
          .otherwise(round(col("e_raw")).cast("long")).as("n_hll"): _*)
}
