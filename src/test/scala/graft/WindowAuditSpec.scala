package graft

import org.apache.spark.sql.catalyst.plans.logical._

/** Board-wide unpartitioned-window audit (round-7 hardening item).
  *
  * An unpartitioned window (`Window.orderBy` with no `partitionBy`)
  * funnels its whole input through ONE task, so the project invariant is:
  * every such window may only ever read a REDUCED input — rows that have
  * already passed through an aggregation, a limit, or a distinct on every
  * path from the window down to a source. Day-grain rollups, interval
  * islands, capped top-k heads and one-row folds qualify; a raw table
  * never does (the round-6 `agg-mtbf` defect was exactly this).
  *
  * Rather than pinning each site one by one, this walks the OPTIMIZED
  * logical plan of every op on the board and asserts the invariant
  * structurally, so any future op that sneaks in a global window over an
  * unreduced table fails here by construction.
  */
class WindowAuditSpec extends SparkSpec {

  /** True iff every root-to-leaf path below `p` crosses a reduction
    * barrier (Aggregate / Limit / Distinct / Deduplicate) or bottoms out
    * in a LocalRelation (plan-time literal data — config-sized by
    * construction, e.g. the Prometheus bucket-boundary list). A Join
    * requires BOTH sides reduced — one unreduced branch is enough to
    * unbound the window input.
    */
  private def reduced(p: LogicalPlan): Boolean = p match {
    case _: Aggregate     => true
    case _: GlobalLimit   => true
    case _: LocalLimit    => true
    case _: Distinct      => true
    case _: Deduplicate   => true
    case _: LocalRelation => true
    case _: LeafNode      => false
    case o                => o.children.nonEmpty && o.children.forall(reduced)
  }

  test("every unpartitioned window on the board reads a reduced input") {
    val offenders = scala.collection.mutable.LinkedHashSet[String]()
    SparkEntry.queries.foreach { case (name, build) =>
      val df = build(spark, sf())
      df.queryExecution.optimizedPlan.foreach {
        case w: Window if w.partitionSpec.isEmpty && !reduced(w.child) =>
          offenders += name
        case _ => ()
      }
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows over non-reduced inputs in: ${offenders.mkString(", ")}")
  }
}
