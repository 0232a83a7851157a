package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the physical-layout planning tier (layout-zorder,
  * index-zonemap) over sf0.001. The driver gate owns value-exactness; these
  * recompute the Morton interleave independently and assert the CLAIM the
  * ops exist to make: Z-order zones cover far smaller key rectangles than a
  * single-dimension sort, so secondary-column zone maps actually prune.
  */
class LayoutOpsSpec extends SparkSpec {

  private def morton(p: Long, s: Long): Long = {
    def spread(v0: Long): Long = {
      var v = v0 & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      (v | (v << 1)) & 0x55555555L
    }
    spread(p) | (spread(s) << 1)
  }

  test("layout-zorder: zfile ids match a scalar Morton recompute") {
    val rows = graft.Tables.lineitem(spark, sf())
      .select(col("l_partkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expectedFiles = rows.map { case (p, s) => morton(p, s) / 4096 }.toSet
    val out = LayoutOps.layoutZorder.build(spark, sf()).collect()
    assert(out.map(_.getLong(0)).toSet === expectedFiles)
    // zone extents really bound their file's keys
    val byFile = rows.groupBy { case (p, s) => morton(p, s) / 4096 }
    out.foreach { r =>
      val (ps, ss) = byFile(r.getLong(0)).unzip
      assert(r.getLong(2) == ps.min && r.getLong(3) == ps.max)
      assert(r.getLong(4) == ss.min && r.getLong(5) == ss.max)
    }
  }

  test("layout-zorder: a secondary-dimension probe prunes files; a p-sort reads all") {
    // sf0.01: the smallest SF whose (p, s) ranges exceed the 4096-key file
    // tile — at sf0.001 s has 4 bits and every layout degenerates to a
    // p-sort. The payoff metric is the PROBE fraction (files whose s-zone
    // intersects a narrow s range), not zone area: with wildly different
    // dimension cardinalities the rectangle areas tie, but the s-probe
    // still prunes under Z and cannot prune under a p-sort.
    val out = LayoutOps.layoutZorder.build(spark, sf("sf0.01")).collect()
    val zFrac = out.count(r => r.getLong(4) <= 15).toDouble / out.length
    // Baseline: same table tiled into the same number of files after a
    // sort by p alone — each file's s-zone spans ~the whole s range.
    val rows = graft.Tables.lineitem(spark, sf("sf0.01"))
      .select(col("l_partkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val perFile = math.max(1, rows.length / out.length)
    val linFiles = rows.grouped(perFile).map(_.map(_._2)).toSeq
    val linFrac = linFiles.count(_.min <= 15).toDouble / linFiles.size
    assert(linFrac > 0.9, s"p-sort should read ~all files for an s-probe ($linFrac)")
    assert(zFrac < 0.7 * linFrac,
      s"z-order probe fraction $zFrac not meaningfully below p-sort's $linFrac")
  }

  test("index-zonemap: zones bound their rows and must_read is exact") {
    val orders = graft.Tables.orders(spark, sf())
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byFile = orders.groupBy(_._1 / 100)
    val out = LayoutOps.indexZonemap.build(spark, sf()).collect()
    assert(out.map(_.getLong(0)).toSet === byFile.keySet)
    out.foreach { r =>
      val cks = byFile(r.getLong(0)).map(_._2)
      assert(r.getLong(2) == cks.min && r.getLong(3) == cks.max)
      val expect = if (cks.max >= 100 && cks.min <= 200) 1 else 0
      assert(r.getInt(4) == expect)
    }
    // the motivating fact: under the natural (orderkey) layout, the
    // secondary-column probe prunes almost nothing
    val frac = out.count(_.getInt(4) == 1).toDouble / out.length
    assert(frac > 0.5, s"probe pruned unexpectedly well ($frac) — data drift?")
  }
}
