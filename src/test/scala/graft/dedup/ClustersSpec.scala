package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def components(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(nodes.toDF("id"), edges.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("singletons, pairs and a star collapse to min labels") {
    val got = components(
      0L to 9L,
      Seq((1L, 2L), (5L, 6L), (5L, 7L), (5L, 8L)))
    assert(got === Map(
      0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L, 9L -> 9L))
  }

  test("a long chain converges past one propagation round") {
    // 0-1-2-…-15 as a path: the min label needs ~log rounds to travel —
    // exercises the fixpoint loop, not just a single join
    val n = 16L
    val got = components(0L until n, (0L until n - 1).map(i => (i, i + 1)))
    assert(got.values.toSet === Set(0L))
    assert(got.size === n)
  }

  test("edges referencing every node both ways stay symmetric") {
    // direction of the pair must not matter
    val a = components(0L to 3L, Seq((3L, 2L), (1L, 0L)))
    val b = components(0L to 3L, Seq((2L, 3L), (0L, 1L)))
    assert(a === b)
    assert(a === Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
  }
}
