package graft

import org.apache.spark.sql.execution.SimpleMode

/** Mechanical guard for the PLANS.md audit: the plans that must push down,
  * prune, and broadcast keep doing so. Catches silent plan regressions
  * (e.g. a refactor that breaks filter pushdown) without eyeballing
  * explain output.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(op: String): String =
    SparkEntry.queries(op)(spark, sf())
      .queryExecution.explainString(SimpleMode)

  test("filter-height-range pushes the range to the parquet scan") {
    val p = plan("filter-height-range")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderkey), GreaterThanOrEqual(o_orderkey,100)"), p)
  }

  test("project-height scans exactly one column") {
    val p = plan("project-height")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint>"), p)
  }

  test("semi-join-fork broadcasts the canonical side") {
    val p = plan("semi-join-fork")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_max"), p) // map-side combine before the exchange
  }

  test("tail-n keeps the head scalar in-plan via broadcast") {
    val p = plan("tail-n")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q1_agg partial-aggregates before the exchange") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), p)
    assert(p.contains("Exchange hashpartitioning(l_returnflag"), p)
  }

  test("delete-files semi-join broadcasts the chunk list") {
    val p = plan("delete-files")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }
}
