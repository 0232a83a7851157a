package graft.functions

import org.apache.spark.sql.{Column, DataFrame}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Exact top-k rows per group that survives low-cardinality group keys
  * (reference semantics: `max_by_key` selection, src/command/verify.rs:385-387,
  * generalized to k rows).
  *
  * A single `row_number` window partitioned by the group key funnels every
  * row of a group through one task — with few groups (3 return flags, a
  * handful of similarity queries) that is a full-table funnel at 100 TB.
  *
  * Round-8 primary path: ONE [[BoundedTopStructs]] aggregation. The
  * typed partial aggregate keeps ≤ k rows per (group, map partition)
  * BEFORE the exchange, so shuffle volume is bounded by configuration
  * (k · partitions · groups), not data size — strictly better than the
  * salted two-phase windows this replaces (those spread the sort over
  * salts×keys partitions, but every input row still crossed the wire).
  * Descending order keys are negated into the sort struct (numeric
  * only, which covers every consumer on the board); ascending keys of
  * any type pass through. If some order key can't be normalized
  * (non-numeric descending), the old salted two-phase window spelling
  * is the fallback — still exact, still funnel-free.
  *
  * Tie-break semantics (aggregate path): the full original row is packed
  * into the sort struct after the caller's order keys, so when order keys
  * TIE the payload columns break the tie in column order (deterministic),
  * where the window spelling resolved ties arbitrarily. Consequently every
  * payload column must be orderable — an unorderable payload (map-typed
  * column) routes to the salted-window fallback, which never orders the
  * payload and handles it exactly; [[BoundedTopStructs]] itself also
  * rejects unorderable structs at analysis time as defense in depth
  * (ADVICE r8).
  */
object TopK {

  /** `salts` sizes the fallback path's phase-1 exchange only; the
    * aggregate path needs no salt (the partial aggregate bounds every
    * task's output at k rows per group).
    */
  def topkPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      k: Int,
      salts: Int = 64): DataFrame = {
    val normalized: Seq[Option[Seq[Column]]] = orderCols.map { c =>
      Bridge.sortOrder(c) match {
        case None => Some(Seq(c)) // a bare column sorts ascending
        case Some((child, true, true)) =>
          Some(Seq(child)) // NULLS FIRST = natural struct null order
        case Some((child, false, true)) =>
          // desc NULLS LAST, order-reversed into ascending struct fields.
          // The prefix field sends NaN first (sort treats NaN as the
          // LARGEST value, so desc ranks it first) and nulls last
          // (negate(null)/~null alone would sort them FIRST). Integral
          // types reverse via bitwise NOT — ~x is strictly decreasing
          // with NO overflow, where negate(Long.MinValue) silently
          // wraps to itself and would rank the minimum as top-1
          // (round-8 self-review findings).
          df.select(child).schema.head.dataType match {
            case FloatType | DoubleType =>
              Some(Seq(
                when(isnull(child), 2).when(isnan(child), 0).otherwise(1),
                negate(child)))
            case ByteType | ShortType | IntegerType | LongType =>
              Some(Seq(isnull(child).cast("int"), bitwise_not(child)))
            case _: NumericType => // decimal: negate is exact
              Some(Seq(isnull(child).cast("int"), negate(child)))
            case _ => None // non-numeric descending
          }
        case _ => None // non-default null order
      }
    }
    // the aggregate path packs the whole row into the sort struct, so
    // every payload column must be orderable too (map types aren't) —
    // otherwise fall back to the windows, which never order the payload
    val payloadOrderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(df.schema)
    if (payloadOrderable && normalized.forall(_.isDefined))
      topkViaAggregate(df, groupCols, normalized.flatten.flatten, k)
    else
      topkViaSaltedWindows(df, groupCols, orderCols, k, salts)
  }

  private def topkViaAggregate(
      df: DataFrame,
      groupCols: Seq[String],
      sortExprs: Seq[Column],
      k: Int): DataFrame = {
    // sort keys first (natural ascending struct order = the rank), the
    // full original row as payload after them (never consulted unless
    // the caller's order keys tie — house rule says they totalize)
    val sortFields = sortExprs.zipWithIndex.map { case (e, i) =>
      e.as(s"_s$i")
    }
    val payloadFields = df.columns.map(n => col(n).as(s"_p_$n")).toSeq
    val packed = struct(sortFields ++ payloadFields: _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(BoundedTopStructs(packed, k).as("_top"))
      .select(explode(col("_top")).as("_r"))
      .select(df.columns.map(n => col(s"_r._p_$n").as(n)).toIndexedSeq: _*)
  }

  /** The pre-round-8 salted two-phase spelling (fallback for order keys
    * the aggregate can't normalize): phase 1 takes top-k per
    * (deterministic salt, key) over an explicitly sized exchange (a
    * user repartition is exempt from AQE's size-based coalescing, which
    * would otherwise serialize the window sort); phase 2 takes the
    * final top-k over ≤ k·salts rows per key. A row in the global top-k
    * is necessarily in the top-k of its salt bucket, so this is exact.
    */
  private def topkViaSaltedWindows(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      k: Int,
      salts: Int): DataFrame = {
    // xxhash64 rejects map-typed inputs (same reason the aggregate path
    // rejects them: map hashcodes aren't canonical) — salt over the
    // hashable columns only; the salt just spreads rows, any
    // deterministic subset works
    def hashable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case ArrayType(et, _) => hashable(et)
      case _ => true
    }
    val saltCols = df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    val salt =
      if (saltCols.isEmpty) lit(0L)
      else pmod(xxhash64(saltCols: _*), lit(salts))
    // Phase-1 exchange width scales with the cluster: `salts` bounds the
    // per-key spread, but hard-capping the partition COUNT at 64 would run
    // the full-table window at most 64-wide on a 1000-executor cluster
    // (ADVICE r8) — size it to the larger of salts and the cluster's
    // default parallelism.
    val phase1Parts = math.max(salts, df.sparkSession.sparkContext.defaultParallelism)
    val phase1 = df.withColumn("_salt", salt)
      .repartition(phase1Parts, (col("_salt") +: groupCols.map(col)): _*)
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
