package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - Brute-force cosine top-k: broadcast the (small) query set against the
  *    corpus — one pass, no shuffle of the corpus, the right baseline and
  *    the right plan at 100 TB (queries are ≪ corpus).
  *  - LSH-bucketed ANN: 8 deterministic integer sign-projections → bucket
  *    id → candidates = bucket-mates only. The projection arithmetic is
  *    EXACT (scaled-integer dot products): float summation order can flip a
  *    sign bit near zero across engines/partitions, integers cannot.
  *
  * Dot products fold left-to-right via `aggregate` (deterministic order);
  * similarity values are rounded before any threshold/rank comparison.
  */
object Similarity {

  /** Left-fold double dot product — native codegen expression
    * (graft.functions.ArrayDot); identical accumulation order to the HOF
    * formulation but compiled to a Java loop.
    */
  def dot(a: Column, b: Column): Column = graft.functions.ArrayDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Rounded cosine similarity (6 dp — ULP-stable across engines). */
  // + 0.0 after the round: a cosine crosses zero, and round(-4e-8, 6) is
  // -0.0 in DuckDB but +0.0 through Spark's BigDecimal — the signed-zero
  // hash hazard (see text-dsir, PLANS.md round 6). IEEE -0.0 + 0.0 = +0.0
  // and every other value is unchanged; the oracles' CosineSql carries the
  // same normalization.
  // try_divide, not /: a ZERO-NORM side (an all-zero vector — e.g. an MRL
  // prefix truncation whose support lies past the cut, fuzz seed 707's
  // 2-hot chain vectors) throws under ANSI while DuckDB's / returns NULL
  // (the CLAUDE.md division-by-zero class). NULL sims then rank below
  // every real sim on both engines (NULLS LAST under DESC both sides),
  // ties broken by id. Single-evaluation + codegen, unlike a
  // when(den === 0) guard that would re-run both norm loops per row.
  def cosine(a: Column, b: Column): Column =
    round(try_divide(dot(a, b), norm(a) * norm(b)), 6) + lit(0.0)

  /** Brute-force top-k: queries broadcast-joined against the corpus —
    * scoring is one shuffle-free pass — then the salted two-phase top-k
    * ([[graft.functions.TopK]]). A plain window partitioned by `q_id`
    * would put EVERY corpus row scored for one query into a single task
    * (few queries × 100 TB corpus = the low-cardinality window funnel);
    * phase 1 ranks per (salt, q_id) in parallel, phase 2 ranks ≤ k·salts
    * rows per query. Exact, deterministic ties on (sim desc, n_id).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
      .select("q_id", "n_id", "sim")
    graft.functions.TopK.topkPerGroup(scored, Seq("q_id"),
      Seq(col("sim").desc, col("n_id").asc), k)
  }

  /** Scaled-integer embedding: round(v * 10000) per dimension — exact
    * arithmetic for sign decisions.
    */
  def intScaled(a: Column): Column =
    transform(a, x => round(x.cast("double") * 10000).cast("long"))

  /** 8-bit LSH bucket id from sign projections (exact integer dots).
    * Weight vectors are plan-time literal arrays; each projection is one
    * native ArrayDotLong — a codegen'd loop, not an interpreted HOF chain.
    * Dimension count is fixed per dataset (embeddings are 64-wide here;
    * `dims` parameterizes it).
    *
    * CONTRACT (whole LSH family — bucket, margins, and every consumer):
    * embedding elements must be NON-NULL. A NULL element makes
    * ArrayDotLong propagate NULL where DuckDB's list_sum SKIPS the NULL
    * product, so bucket ids (s > 0 vs NULL) and margin orderings (NULLS
    * LAST vs struct-null-first) would diverge cross-engine — silently,
    * per bucket. The invariant is asserted on the shipped fixtures
    * (OpsR19Spec "embedding elements are non-null"); a corpus with NULL
    * elements must be repaired (coalesce/drop) BEFORE the LSH tier, the
    * same boundary where sim-mahalanobis defends ragged/NULL vectors.
    */
  def lshBucket(emb: Column, planes: Int = 8, dims: Int = 64): Column = {
    val e = intScaled(emb)
    val bucketBits = (0 until planes).map { j =>
      val w = array((0 until dims).map(d => lit(((j * 131 + d * 31) % 17 - 8).toLong)): _*)
      val s = graft.functions.ArrayDotLong(e, w)
      when(s > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bucketBits.reduce(_ + _)
  }

  /** Per-plane signed projection values (array of `planes` longs) for the
    * same deterministic hyperplanes as [[lshBucket]] — the query-directed
    * probe-ordering signal of multi-probe LSH (Lv et al. 2007): the
    * smaller |margin_j|, the likelier the true neighbors sit across plane
    * j, so perturbations are probed in ascending |margin| order. Exact
    * integer dots (codegen ArrayDotLong), so the ordering can never
    * drift with partitioning.
    */
  def lshMargins(emb: Column, planes: Int = 8, dims: Int = 64): Column = {
    val e = intScaled(emb)
    array((0 until planes).map { j =>
      val w = array((0 until dims).map(d => lit(((j * 131 + d * 31) % 17 - 8).toLong)): _*)
      graft.functions.ArrayDotLong(e, w)
    }: _*)
  }

  /** ANN via LSH buckets: candidates share the query's bucket; exact cosine
    * + top-k inside the bucket. Trades recall for a corpus-partitionable
    * plan (bucket is a join key — co-located at scale).
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int, planes: Int = 8): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      lshBucket(col("embedding"), planes).as("bucket"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      lshBucket(col("embedding"), planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("q_id", "n_id", "sim")
  }

  /** IVF-style ANN: corpus vectors are assigned to their nearest centroid
    * (the inverted list), queries probe their `nprobe` nearest lists, and
    * exact cosine top-k runs over probed-list candidates only.
    *
    * Scale shape: the centroid table is config-sized (nlist ≤ a few
    * thousand), so it collects to the driver and the assignment becomes a
    * pure projection — `greatest` over per-centroid (sim, -cid) structs,
    * NO shuffle and no join touches the corpus. Candidates then join on
    * the list id with the (small) probe set broadcast. Centroid choice is
    * pluggable (k-means upstream); any DETERMINISTIC centroid set gives
    * reproducible lists.
    */
  /** Lexicographic max over candidate structs. Spark's `greatest`
    * requires >= 2 arguments, so a single-candidate model (a degenerate
    * 1-vector corpus collapses KMeans' init to one centroid) must fold
    * to the bare struct instead of throwing AnalysisException — every
    * struct-argmax assignment site routes through here (ADVICE r11).
    */
  private[graft] def bestStruct(structs: Seq[Column]): Column = {
    // Zero structs = zero-row centroid table / empty corpus upstream;
    // fail with a named cause instead of greatest()'s opaque
    // AnalysisException (ADVICE r12).
    require(structs.nonEmpty, "no centroids: empty centroid table")
    if (structs.size == 1) structs.head else greatest(structs: _*)
  }

  /** Centroid table → driver-side literals (config-sized by design). */
  private def collectCentroids(centroids: DataFrame): Array[(Long, Seq[Double])] =
    centroids
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)

  /** Per-centroid (sim, -cid) structs over the `embedding` column:
    * lexicographic max = highest rounded cosine, ties to the lowest
    * centroid id — THE assignment tiebreak, shared by [[ivfTopK]] and
    * [[assignToCentroids]] so the two can never silently diverge.
    */
  private def centroidStructs(cents: Array[(Long, Seq[Double])]): Seq[Column] =
    cents.toIndexedSeq.map { case (cid, cv) =>
      struct(cosine(col("embedding").cast("array<double>"), typedLit(cv)).as("s"),
        lit(-cid).as("nc"))
    }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int = 2): DataFrame = {
    val cents = collectCentroids(centroids)
    def centStructs: Seq[Column] = centroidStructs(cents)
    val assigned = corpus
      .withColumn("_b", bestStruct(centStructs))
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        (-col("_b.nc")).as("cid"))
    val probes = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        explode(slice(reverse(array_sort(array(centStructs: _*))), 1, nprobe)).as("_p"))
      .select(col("q_id"), col("q_emb"), (-col("_p.nc")).as("cid"))
    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("q_id", "n_id", "sim")
  }

  /** IVF nprobe tuning sweep: one shared assignment + one probe ranking
    * at max(nprobes), then every configuration's candidate set is a
    * FILTER on the probe rank — the sweep never re-runs the assignment
    * or re-scores a candidate (the dedup-threshold-sweep discipline:
    * multiply one table by a constant-size config explode, never
    * re-execute the subtree per config). Recall@k grades each
    * configuration against the exact brute-force top-k (a q×k-sized
    * broadcast side). Output per nprobe: query count, mean candidate
    * count (the cost axis) and recall@k (the quality axis) — the table
    * that picks nprobe for a 100-TB deployment.
    */
  def ivfNprobeSweep(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int, nprobes: Seq[Int]): DataFrame = {
    val cents = collectCentroids(centroids)
    def centStructs: Seq[Column] = centroidStructs(cents)
    val assigned = corpus
      .withColumn("_b", bestStruct(centStructs))
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        (-col("_b.nc")).as("cid"))
    val maxP = nprobes.max
    val probes = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        posexplode(slice(reverse(array_sort(array(centStructs: _*))), 1, maxP)))
      .select(col("q_id"), col("q_emb"), (col("pos") + 1).as("probe_rank"),
        (-col("col.nc")).as("cid"))
    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
      .select("q_id", "probe_rank", "n_id", "sim")
    val exact = bruteForceTopK(queries, corpus, k)
      .select(col("q_id"), col("n_id"), lit(1).as("ex"))
    val conf = scored
      .withColumn("np", explode(typedLit(nprobes)))
      .filter(col("probe_rank") <= col("np"))
    val w = Window.partitionBy("np", "q_id").orderBy(col("sim").desc, col("n_id"))
    conf.withColumn("rn", row_number().over(w))
      .join(broadcast(exact), Seq("q_id", "n_id"), "left")
      .groupBy("np", "q_id")
      .agg(count(lit(1)).as("cands"),
        sum(when(col("rn") <= k && col("ex").isNotNull, 1L).otherwise(0L)).as("hits"))
      .groupBy(col("np").as("nprobe"))
      .agg(count(lit(1)).as("n_queries"), sum("cands").as("sc"), sum("hits").as("sh"))
      .select(col("nprobe"), col("n_queries"),
        (round(col("sc").cast("double") * lit(1000000) /
          col("n_queries").cast("double")).cast("long") / lit(1e6)).as("avg_candidates"),
        (round(col("sh").cast("double") * lit(1000000) /
          (col("n_queries") * k).cast("double")).cast("long") / lit(1e6)).as("recall_at_k"))
      .orderBy("nprobe")
  }

  /** Nearest-centroid assignment only (the IVF build step without the
    * probe): (n_id, cid) per corpus vector under the same rounded-cosine
    * argmax / lowest-cid tiebreak as [[ivfTopK]]. Zero shuffle — the
    * centroids collect (config-sized by design) and score as a broadcast
    * projection.
    */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus
      .withColumn("_b", bestStruct(centroidStructs(collectCentroids(centroids))))
      .select(col("vec_id").as("n_id"), (-col("_b.nc")).as("cid"))

  /** Per-query probed list ids (the top-`nprobe` centroids by cosine,
    * ties to the lowest id) — the probe half of [[ivfTopK]] exposed for
    * consumers that bring their own candidate store (e.g. a list-
    * partitioned persisted index). Output: (q_id, q_emb, cid).
    */
  def probeLists(queries: DataFrame, centroids: DataFrame,
      nprobe: Int): DataFrame = {
    val centStructs = centroidStructs(collectCentroids(centroids))
    queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        explode(slice(reverse(array_sort(array(centStructs: _*))), 1, nprobe)).as("_p"))
      .select(col("q_id"), col("q_emb"), (-col("_p.nc")).as("cid"))
  }

  /** Product-quantization ANN (asymmetric distance computation): the
    * embedding is split into `m` equal-width subspaces; each corpus
    * subvector is ENCODED as the id of its nearest per-subspace centroid
    * (nearest by rounded dot, ties to the lowest id), and a query scores a
    * corpus vector as the sum of its per-subspace (query-subvector ·
    * centroid) table lookups — the classic PQ/ADC trade: store m small
    * codes instead of the vector, score with m table lookups instead of a
    * full dot product.
    *
    * Scale shape mirrors [[ivfTopK]]: the codebook is config-sized, so it
    * collects once and both the corpus ENCODING and the query DISTANCE
    * TABLES are pure projections over centroid literals — the corpus
    * never shuffles for either. Scoring is a broadcast of the (tiny)
    * query table set against the coded corpus, and the final top-k runs
    * the salted two-phase [[graft.functions.TopK]] so no task ever holds
    * one query's full scored corpus. Codebook choice is pluggable
    * (per-subspace k-means upstream); any deterministic vector set works
    * — here whole vectors whose subvector slices act as the per-subspace
    * centroids.
    */
  /** The PQ codebook compiled to column builders — shared by [[pqTopK]]
    * and [[ivfPqTopK]] so encode/table/lookup semantics (rounded subspace
    * dots, lowest-id tiebreak, element_at lookup order) can never diverge
    * between the flat and the IVF-composed search.
    */
  private final case class PqModel(cents: Array[(Long, Seq[Double])], m: Int) {
    private val dims = cents.head._2.length
    require(dims % m == 0, s"dims $dims not divisible into $m subspaces")
    private val sub = dims / m
    private def subvec(v: Seq[Double], s: Int): Seq[Double] = v.slice(s * sub, (s + 1) * sub)
    private def sliceCol(c: Column, s: Int): Column =
      slice(c.cast("array<double>"), s * sub + 1, sub)
    private def subDot(c: Column, s: Int, j: Int): Column =
      round(dot(sliceCol(c, s), typedLit(subvec(cents(j)._2, s))), 6)
    // code per subspace: lexicographic max of (dot, -j) structs — highest
    // rounded dot, ties to the lowest centroid id; a projection, no joins
    private def codeCol(c: Column, s: Int): Column = {
      val structs = cents.indices.map(j =>
        struct(subDot(c, s, j).as("d"), lit(-j.toLong).as("nj")))
      -bestStruct(structs).getField("nj")
    }
    /** `c0..c{m-1}` code columns for a corpus vector. */
    def codeCols(c: Column): Seq[Column] =
      (0 until m).map(s => codeCol(c, s).as(s"c$s"))
    /** `dt0..dt{m-1}` distance-table array columns for a query vector. */
    def dtCols(c: Column): Seq[Column] =
      (0 until m).map { s =>
        array(cents.indices.map(j => subDot(c, s, j)): _*).as(s"dt$s")
      }
    /** ADC score: sum of per-subspace table lookups (over codeCols/dtCols
      * names in scope). */
    def approx: Column = (0 until m)
      .map(s => element_at(col(s"dt$s"), col(s"c$s").cast("int") + 1))
      .reduce(_ + _)
  }

  private def collectCodebook(codebook: DataFrame): Array[(Long, Seq[Double])] =
    codebook
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)

  def pqTopK(queries: DataFrame, corpus: DataFrame, codebook: DataFrame,
      k: Int, m: Int = 4): DataFrame = {
    val pq = PqModel(collectCodebook(codebook), m)
    val coded = corpus.select(
      col("vec_id").as("n_id") +: pq.codeCols(col("embedding")): _*)
    val qdt = queries.select(
      col("vec_id").as("q_id") +: pq.dtCols(col("embedding")): _*)
    val scored = coded.crossJoin(broadcast(qdt))
      // + 0.0: approx_sim crosses zero (signed-zero normalization, see cosine)
      .select(col("q_id"), col("n_id"), (round(pq.approx, 6) + lit(0.0)).as("approx_sim"))
    graft.functions.TopK.topkPerGroup(scored, Seq("q_id"),
      Seq(col("approx_sim").desc, col("n_id").asc), k)
  }

  /** IVF-PQ composed search (the FAISS `IVFx,PQy` shape, minus residual
    * encoding — codes quantize the raw vectors, a documented
    * simplification): corpus vectors carry BOTH their IVF list id and
    * their PQ codes from ONE projection pass; a query probes its `nprobe`
    * nearest lists and ADC-scores only the probed lists' members. This is
    * the memory-bound ANN deployment shape at 100 TB: the index is
    * (cid + m codes) per vector, the scan per query touches
    * nprobe/nlist of the corpus, and nothing ever shuffles the corpus —
    * assignment and encoding are centroid-literal projections, and the
    * probe set (queries × nprobe, with their distance tables) broadcasts.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      codebook: DataFrame, k: Int, nprobe: Int = 2, m: Int = 4): DataFrame = {
    val cents = collectCentroids(centroids)
    def centStructs: Seq[Column] = centroidStructs(cents)
    val pq = PqModel(collectCodebook(codebook), m)
    val assigned = corpus
      .withColumn("_b", bestStruct(centStructs))
      .select(col("vec_id").as("n_id") +: (-col("_b.nc")).as("cid") +:
        pq.codeCols(col("embedding")): _*)
    val probes = queries
      .select(col("vec_id").as("q_id") +:
        slice(reverse(array_sort(array(centStructs: _*))), 1, nprobe).as("_ps") +:
        pq.dtCols(col("embedding")): _*)
      .withColumn("_p", explode(col("_ps")))
      .withColumn("cid", -col("_p.nc"))
      .drop("_ps", "_p")
    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .select(col("q_id"), col("n_id"), (round(pq.approx, 6) + lit(0.0)).as("approx_sim"))
    graft.functions.TopK.topkPerGroup(scored, Seq("q_id"),
      Seq(col("approx_sim").desc, col("n_id").asc), k)
  }

  /** Symmetric int8 scalar quantization for ANN storage: per-vector scale
    * `s = max(|v|)/127`, codes `round(v/s)` clipped to [-127, 127] — a 4×
    * memory cut for candidate filtering, with the scale kept alongside for
    * approximate reconstruction (`code · s`). Pure per-row projection —
    * zero shuffle, trivially scalable; decisions are integer-exact so
    * codes can never vary with partitioning. Zero vectors quantize to
    * all-zero codes with scale 0.
    */
  def int8Scale(emb: Column): Column =
    round(array_max(transform(emb.cast("array<double>"), x => abs(x))) / 127.0, 9)

  def int8Code(x: Column, scale: Column): Column =
    when(scale === 0.0, lit(0L)).otherwise(
      greatest(lit(-127L), least(lit(127L), round(x / scale).cast("long"))))

  /** Codes + scale as array-valued columns (see [[int8Scale]]/[[int8Code]]). */
  def quantizeInt8(emb: Column): (Column, Column) = {
    val scale = int8Scale(emb)
    val codes = transform(emb.cast("array<double>"), x => int8Code(x, scale))
    (codes, scale)
  }

  /** Recall@k of an ANN result against the exact top-k: per-query hit
    * count and recall fraction — the evaluation loop every ANN deployment
    * runs before trading exactness for speed.
    *
    * Scale shape: both inputs are top-k tables (≤ k rows per query — query-
    * set-sized, not corpus-sized), so every join/aggregate here is tiny no
    * matter the corpus; the expensive parts are the upstream searches.
    * Queries the ANN missed entirely still report (left join + zero fill),
    * and recall divides by the EFFECTIVE exact k (a query with < k true
    * neighbors is not penalized for the shortfall).
    */
  def annRecall(exact: DataFrame, ann: DataFrame): DataFrame = {
    // every input here is a top-k table (k·|queries| rows) — broadcast the
    // ANN side so grading never shuffles, whatever produced the candidates
    val hits = exact.select("q_id", "n_id")
      .join(broadcast(ann.select("q_id", "n_id")), Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
    exact.groupBy("q_id").agg(count(lit(1)).as("k_eff"))
      // both sides are query-set-sized; broadcasting the hit counts keeps
      // the evaluation join shuffle-free at any corpus scale
      .join(broadcast(hits), Seq("q_id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .select(col("q_id"), col("n_hits"),
        round(col("n_hits").cast("double") / col("k_eff"), 6).as("recall"))
  }

  /** Near-duplicate embedding pairs within a blocking key (label):
    * all-pairs inside blocks only, threshold on rounded cosine.
    */
  def nearDupPairs(emb: DataFrame, blockCol: String, threshold: Double): DataFrame = {
    val a = emb.select(col(blockCol).as("blk"), col("vec_id").as("d1"), col("embedding").as("e1"))
    val b = emb.select(col(blockCol).as("blk"), col("vec_id").as("d2"), col("embedding").as("e2"))
    a.join(b, Seq("blk"))
      .filter(col("d1") < col("d2"))
      .withColumn("sim", cosine(col("e1"), col("e2")))
      .filter(col("sim") >= threshold)
      .select("d1", "d2", "sim")
  }
}
