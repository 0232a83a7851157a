package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks, Deequ/Great-Expectations-shaped but
  * evaluated the Spark-first way: EVERY row-level check in a suite folds
  * into ONE conditional-aggregation pass over the table (map-side
  * combined), and the per-check report rows explode out of that single
  * aggregate row — never one scan per check, and never a union of N
  * selects over one aggregated subtree (the re-execution trap the
  * project invariants ban). A suite of 50 checks over a 100 TB table
  * costs exactly one table pass.
  *
  * Uniqueness is expressed as an aggregate-level check (violations =
  * rows − distinct keys) and rides the same pass via count_distinct.
  * Cross-table referential checks need their own (anti-join-shaped)
  * pass by nature; [[referential]] builds that row separately and the
  * caller unions the REPORTS (tiny), not the scans.
  */
object Dq {

  /** A row-level expectation: `violation` marks a failing row. */
  final case class Check(name: String, violation: Column)

  /** Evaluate row-level checks plus optional uniqueness keys in one
    * pass. Output: check, n_checked, n_violations, pass.
    */
  def suite(df: DataFrame, checks: Seq[Check],
      uniqueKeys: Seq[String] = Nil): DataFrame = {
    val aggs =
      checks.zipWithIndex.map { case (c, i) =>
        sum(when(c.violation, 1L).otherwise(0L)).as(s"_v$i")
      } ++
        uniqueKeys.zipWithIndex.map { case (k, i) =>
          (count(lit(1)) - count_distinct(col(k))).as(s"_u$i")
        } :+ count(lit(1)).as("_n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val reportCols =
      checks.zipWithIndex.map { case (c, i) =>
        struct(lit(c.name).as("check_name"), col(s"_v$i").as("n_violations"))
      } ++
        uniqueKeys.zipWithIndex.map { case (k, i) =>
          struct(lit(s"unique:$k").as("check_name"), col(s"_u$i").as("n_violations"))
        }
    one.select(col("_n"), explode(array(reportCols: _*)).as("r"))
      .select(col("r.check_name").as("check_name"), col("_n").as("n_checked"),
        col("r.n_violations").as("n_violations"),
        (col("r.n_violations") === 0L).as("pass"))
  }

  /** Referential-integrity report row: child keys with no parent.
    * Anti-join-shaped — one key-grained pass per relationship.
    */
  def referential(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey)),
        col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    child.agg(count(lit(1)).as("n_checked"))
      .crossJoin(broadcast(orphans))
      .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }
}
