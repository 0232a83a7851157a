package graft.functions

import org.apache.spark.sql.{Column, DataFrame}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.NumericType

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
        case Some((child, false, true))
            if df.select(child).schema.head.dataType.isInstanceOf[NumericType] =>
          // desc NULLS LAST: an is-null prefix field sends nulls after
          // every value (negate(null) alone would sort them FIRST —
          // the window spelling's NULLS LAST would disagree)
          Some(Seq(isnull(child).cast("int"), negate(child)))
        case _ => None // non-numeric descending / non-default null order
      }
    }
    if (normalized.forall(_.isDefined))
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
    val salt = pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts))
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
