package graft.dedup

import graft.SparkSpec

/** Closed-form checks of the triangle census / degree distribution on
  * graphs whose answers are computable by hand — the DuckDB oracle at
  * fixture SF only sees a near-empty pair graph, so the algorithm (degree
  * orientation, tie-breaks, wedge closing) is pinned here.
  */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]) =
    Graphs.triangleCensus(edges.toDF("d1", "d2")).head()

  test("5-clique: C(5,3) triangles, 30 wedges, clustering 1 (all-tied degrees)") {
    val clique = for {
      a <- 1L to 5L; b <- (a + 1) to 5L
    } yield (a, b)
    val r = census(clique)
    assert(r.getLong(0) == 5) // nodes
    assert(r.getLong(1) == 10) // edges
    assert(r.getLong(2) == 30) // wedges: 5 * C(4,2)
    assert(r.getLong(3) == 10) // triangles: C(5,3)
    assert(r.getDouble(4) == 1.0)
  }

  test("path graph closes nothing") {
    val r = census(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(r.getLong(2) == 2) // two wedges at the interior nodes
    assert(r.getLong(3) == 0)
    assert(r.getDouble(4) == 0.0)
  }

  test("triangle plus pendant edge: the isolated component doesn't leak in") {
    val r = census(Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
    assert(r.getLong(0) == 5 && r.getLong(1) == 4)
    assert(r.getLong(2) == 3 && r.getLong(3) == 1)
    assert(r.getDouble(4) == 1.0)
  }

  test("star hub generates no wedge storm but its closures still count") {
    // hub 1 connected to 2..6, plus one rim edge (2,3): exactly 1 triangle.
    // Orientation points every spoke INTO the hub (degree 5 vs ≤2), so the
    // hub's C(5,2)=10 wedges never materialize as join rows — but the
    // census still counts them in n_wedges (clustering's denominator).
    val star = (2L to 6L).map(i => (1L, i)) :+ (2L, 3L)
    val r = census(star)
    assert(r.getLong(3) == 1)
    // wedges: hub C(5,2)=10, nodes 2 and 3 have degree 2 → 1 each = 12
    assert(r.getLong(2) == 12)
    assert(r.getDouble(4) == 0.25) // 3*1/12
  }

  test("degree distribution over the star") {
    val star = (2L to 6L).map(i => (1L, i))
    val rows = Graphs.degreeDistribution(star.toDF("d1", "d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows == Map(1L -> 5L, 5L -> 1L))
  }
}
