package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate cluster assignment: connected components over a pair
  * graph (the step after any pair-producing dedup — minhash, simhash,
  * embedding-cosine — that turns pairs into keep/drop decisions: one
  * canonical document per component).
  *
  * Min-label propagation: every node starts labeled with its own id; each
  * round takes the min of its own and its neighbors' labels. Converges in
  * O(component diameter) rounds — near-dup components are overwhelmingly
  * tiny and dense (a burst of copies of one document), so the loop is
  * 2–4 distributed joins in practice, each shuffling only the EDGE list
  * (pair-count-sized, far below corpus-sized). Convergence is detected by
  * the label-sum signature (labels only ever decrease), one cheap
  * aggregate per round instead of a change-count join.
  *
  * No reference analogue (the reference archives blocks, not documents) —
  * this is part of the training-data-pipeline extension surface.
  */
object Clusters {

  /** Component label per node: (id, cluster) where cluster = min node id
    * reachable through `edges` (d1, d2 undirected). Nodes absent from any
    * edge keep their own id (singleton clusters).
    */
  def connectedComponents(
      nodes: DataFrame, // (id)
      edges: DataFrame, // (d1, d2)
      maxIter: Int = 20): DataFrame = {
    // Both directions explode from ONE pass over the pair rows — a union
    // of two selects evaluates the (possibly expensive) pair subtree
    // twice on cache fill; with minhash upstream that doubled the whole
    // op (measured 13.3 s → 8.1 s at sf0.1 for dedup-cluster-rep).
    val bidir = edges
      .select(explode(array(
        struct(col("d1").as("src"), col("d2").as("dst")),
        struct(col("d2").as("src"), col("d1").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .cache()
    // localCheckpoint (not cache) each round: an iterative join's lineage
    // otherwise compounds and the optimizer re-plans the whole history
    // every round — the classic iterative-algorithm heap blowup
    var labels = nodes.select(col("id"), col("id").as("lbl")).localCheckpoint()
    var sig = labels.agg(sum("lbl")).head().getLong(0)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val nbrMin = bidir.join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min("lbl").as("nlbl"))
      labels = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      val newSig = labels.agg(sum("lbl")).head().getLong(0)
      converged = newSig == sig
      sig = newSig
      it += 1
    }
    bidir.unpersist()
    labels.select(col("id"), col("lbl").as("cluster"))
  }
}
