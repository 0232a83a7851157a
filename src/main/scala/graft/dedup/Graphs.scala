package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural diagnostics over a near-dup pair graph (edges (d1, d2) with
  * d1 < d2 canonical, one row per undirected edge) — the step between a
  * pair-producing dedup stage and the keep/drop policy: degree tails and
  * triangle closure decide whether pairs collapse into template families
  * (cluster-representative keeps) or form drift chains (pairwise review).
  *
  * No reference analogue (the reference archives blocks, not documents) —
  * part of the training-data-pipeline extension surface.
  */
object Graphs {

  /** Degree histogram: (degree, n_nodes), ordered. Two map-side-combined
    * groupBys over the pair table (pair-count-sized, never corpus-sized);
    * output is max-degree-sized.
    */
  def degreeDistribution(edges: DataFrame): DataFrame =
    edges
      .select(explode(array(col("d1"), col("d2"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
      .orderBy("degree")

  /** Triangle census: one row of (n_nodes, n_edges, n_wedges, n_triangles,
    * clustering) where clustering = 3T/W micro-snapped. The degree-ordered
    * node-iterator (Schank & Wagner 2005; Suri & Vassilvitskii's MR
    * formulation): every edge is oriented from its lower-(degree, id)
    * endpoint, wedges generate only at each edge's LOW endpoint, and a
    * semi-join against the canonical edge set closes them. Orientation
    * bounds per-node wedge fan-out by out-degree ≤ O(√m) — a boilerplate
    * hub with a million neighbors generates NO wedge storm because its
    * edges all point INTO it.
    *
    * Cross-engine exactness: counts are integers end-to-end (the wedge sum
    * uses integer DIV); the one closing division is micro-snapped.
    */
  def triangleCensus(edgesRaw: DataFrame): DataFrame = {
    val e = edgesRaw.select("d1", "d2")
    // deg persists (round 13): consumed by both orientation joins AND the
    // wedge census — three re-aggregations of the endpoint explode without
    // a cache (ReusedExchange shares only the shuffle, not the final agg).
    // Node-sized (two longs per row).
    val deg = e.select(explode(array(col("d1"), col("d2"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("dg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Orient d1→d2 when (dg1, d1) < (dg2, d2); d1 < d2 already, so the
    // tie-break on equal degrees keeps the id order.
    // er persists too: it is BOTH sides of the wedge self-join — without a
    // cache the two-join orientation subtree executes twice. Edge-sized.
    val er = e
      .join(deg.select(col("id").as("d1"), col("dg").as("g1")), Seq("d1"))
      .join(deg.select(col("id").as("d2"), col("dg").as("g2")), Seq("d2"))
      .select(
        when(col("g1") <= col("g2"), col("d1")).otherwise(col("d2")).as("u"),
        when(col("g1") <= col("g2"), col("d2")).otherwise(col("d1")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Wedges at the low endpoint; (v1 < v2) makes the pair canonical, so
    // the closing lookup is a semi-join straight against e's (d1, d2).
    val closed = er.select(col("u"), col("v").as("v1"))
      .join(er.select(col("u"), col("v").as("v2")), Seq("u"))
      .filter(col("v1") < col("v2"))
      .select(col("v1").as("d1"), col("v2").as("d2"))
      .join(e, Seq("d1", "d2"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val wedges = deg.agg(
      expr("sum(dg * (dg - 1)) DIV 2").as("n_wedges"),
      count(lit(1)).as("n_nodes"))
    val edgeCount = e.agg(count(lit(1)).as("n_edges"))
    wedges.crossJoin(edgeCount).crossJoin(closed)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles") * lit(1000000L) / col("n_wedges"))
            .cast("long") / lit(1000000.0))
          .otherwise(lit(0.0)).as("clustering"))
  }
}
