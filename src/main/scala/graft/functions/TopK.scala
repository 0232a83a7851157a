package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-k rows per group that survives low-cardinality group keys
  * (reference semantics: `max_by_key` selection, src/command/verify.rs:385-387,
  * generalized to k rows).
  *
  * A single `row_number` window partitioned by the group key funnels every
  * row of a group through one task — with few groups (3 return flags, a
  * handful of similarity queries) that is a full-table funnel at 100 TB.
  * Instead: phase 1 takes top-k per (deterministic salt, key), spreading
  * the shuffle over `salts × keys` partitions; phase 2 takes the final
  * top-k per key over at most k·salts survivors. A row in the global top-k
  * is necessarily in the top-k of its own salt bucket, so the result is
  * exact. Phase 2's exchange does key on the group columns alone, but its
  * input is ≤ k·salts rows per group — bounded by configuration, not data
  * size.
  */
object TopK {

  /** `salts` bounds the phase-2 fan-in; 64 keeps every phase-2 task under
    * ~k·64 rows regardless of input size. The salt is a deterministic hash
    * of the full row, so reruns rank identically.
    */
  def topkPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      k: Int,
      salts: Int = 64): DataFrame = {
    val salt = pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts))
    // explicit width on phase 1's exchange: its shuffle BYTES are small
    // (row-pruned input), so AQE's size-based coalescing would fold the
    // salts×keys partitions into one or two and serialize the window
    // sort — the exact funnel the salt exists to prevent (scaling
    // harness: 17 s single-task sort of 6M rows at sf1). A user-sized
    // repartition is exempt from coalescing, and the window's
    // partitionBy matches it so no second exchange forms.
    val phase1 = df.withColumn("_salt", salt)
      .repartition(salts, (col("_salt") +: groupCols.map(col)): _*)
      .withColumn("_rn", row_number().over(
        Window.partitionBy((col("_salt") +: groupCols.map(col)): _*).orderBy(orderCols: _*)))
      .filter(col("_rn") <= k)
      .drop("_salt", "_rn")
    phase1
      .withColumn("_rn", row_number().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }
}
