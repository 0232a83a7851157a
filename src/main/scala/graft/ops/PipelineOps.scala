package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{Op, Tables}
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** The composed training-data preprocessing pipeline: every per-document
  * filter family the engine implements, fused into ONE declarative plan
  * that emits a keep/drop decision table. This is the "run the whole
  * preprocess as a single job" surface a 100 TB pipeline actually deploys —
  * each rule is the same operator that exists standalone (exact dedup,
  * simhash near-dup, quality trio, Gopher repetition, benchmark
  * decontamination), so Catalyst shares the scan and schedules the five
  * rule subtrees as one job set instead of five passes over the corpus.
  */
object PipelineOps {

  /** Keep/drop decisions. Rules:
    *  - f_exact_dup:    non-representative member of an md5 exact-dup group
    *  - f_near_dup:     non-representative member of a shared simhash
    *                    fingerprint group
    *  - f_low_quality:  distinct-token ratio < 0.32 (rare-token-soup floor
    *                    sits near p5 of the corpus)
    *  - f_repetitive:   duplicate-2gram fraction > 0.16 (~p95)
    *  - f_contaminated: ≥ 5 distinct 5-gram shingles shared with the
    *                    benchmark slice (doc_id < 50; the slice itself is
    *                    never flagged)
    *  - keep = no flag set.
    *
    * Scale shapes are inherited from the standalone ops: digest/fingerprint
    * groupBys with map-side combine (AQE splits viral dup groups), per-doc
    * gram aggregation, broadcast benchmark shingle set. Nothing in the
    * composition adds a corpus-sized shuffle beyond what the rules
    * themselves need.
    */
  val pipelinePreprocess: Op = Op.sql(
    "pipeline-preprocess",
    """WITH base AS (SELECT doc_id, text, md5(text) AS th FROM documents),
      |eg AS (SELECT th, min(doc_id) AS keep_id, count(*) AS nc FROM base GROUP BY th),
      |exa AS (SELECT doc_id, (nc > 1 AND doc_id <> keep_id) AS f_exact_dup
      |        FROM base JOIN eg USING (th)),
      |words AS (
      |  SELECT DISTINCT doc_id AS id, unnest(list_distinct(string_split(text, ' '))) AS w
      |  FROM documents),
      |hashed AS (
      |  SELECT id, list_reduce(list_prepend(0::BIGINT,
      |           [ascii(substr(w, i, 1))::BIGINT FOR i IN generate_series(1, length(w))]),
      |           (a, b) -> (a * 31 + b) % 1000003) AS h
      |  FROM words),
      |votes AS (
      |  SELECT id, j, CAST(sum(CASE WHEN (h // (2 ** j)::BIGINT) % 2 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v
      |  FROM hashed, (SELECT unnest(generate_series(0, 19)) AS j) g
      |  GROUP BY id, j),
      |fp AS (
      |  SELECT id, CAST(sum(CASE WHEN v > 0 THEN (2 ** j)::BIGINT ELSE 0 END) AS BIGINT) AS simhash
      |  FROM votes GROUP BY id),
      |fg AS (SELECT simhash, min(id) AS keep_id, count(*) AS nc FROM fp GROUP BY simhash),
      |near AS (SELECT id AS doc_id, (nc > 1 AND id <> keep_id) AS f_near_dup
      |         FROM fp JOIN fg USING (simhash)),
      |q AS (SELECT doc_id,
      |        (round(len(list_distinct(string_split(text, ' '))) * 1.0
      |               / len(string_split(text, ' ')), 4) < 0.32) AS f_low_quality
      |      FROM documents),
      |ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g2 AS (SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS g
      |       FROM (SELECT doc_id, ws,
      |               unnest(generate_series(1, greatest(1, len(ws) - 1))) AS i FROM ws)),
      |c2 AS (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY doc_id, g),
      |rep AS (SELECT doc_id,
      |          (round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) * 1.0 / sum(cnt), 6)
      |           > 0.16) AS f_repetitive
      |        FROM c2 GROUP BY doc_id),
      |sh5 AS (SELECT DISTINCT doc_id AS id, array_to_string(ws[i:i+4], ' ') AS s
      |        FROM (SELECT doc_id, ws,
      |                unnest(generate_series(1, greatest(1, len(ws) - 4))) AS i FROM ws)),
      |bench AS (SELECT DISTINCT s FROM sh5 WHERE id < 50),
      |shared AS (SELECT id AS doc_id, count(*) AS n_shared
      |           FROM sh5 JOIN bench USING (s) WHERE id >= 50 GROUP BY id),
      |con AS (SELECT d.doc_id, coalesce(n_shared >= 5, false) AS f_contaminated
      |        FROM documents d LEFT JOIN shared USING (doc_id))
      |SELECT d.doc_id, f_exact_dup, f_near_dup, f_low_quality, f_repetitive,
      |       f_contaminated,
      |       NOT (f_exact_dup OR f_near_dup OR f_low_quality OR f_repetitive
      |            OR f_contaminated) AS keep
      |FROM documents d
      |JOIN exa USING (doc_id) JOIN near USING (doc_id) JOIN q USING (doc_id)
      |JOIN rep USING (doc_id) JOIN con USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin
  ) { (s, d) => flags(s, d).orderBy("doc_id") }

  /** The five per-document flags + keep verdict as one unordered DF — the
    * shared subtree behind pipeline-preprocess and pipeline-filter-funnel.
    */
  private[ops] def flags(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)

    val base = docs.select(col("doc_id"), md5(col("text")).as("th"))
    val eg = base.groupBy("th").agg(min("doc_id").as("keep_id"), count(lit(1)).as("nc"))
    val exa = base.join(eg, Seq("th"))
      .select(col("doc_id"),
        (col("nc") > 1 && col("doc_id") =!= col("keep_id")).as("f_exact_dup"))

    val fp = Dedup.simhashFingerprints(docs, "doc_id", "text")
    val fg = fp.groupBy("simhash").agg(min("id").as("keep_id"), count(lit(1)).as("nc"))
    val near = fp.join(fg, Seq("simhash"))
      .select(col("id").as("doc_id"),
        (col("nc") > 1 && col("id") =!= col("keep_id")).as("f_near_dup"))

    val q = docs.select(col("doc_id"),
      (round(TextAnalysis.distinctTokenCount(col("text")) * lit(1.0) /
        TextAnalysis.tokenCount(col("text")), 4) < 0.32).as("f_low_quality"))

    // Row-local gram counting (graft.functions.RepetitionStats kernel) —
    // every doc's 2-grams live in its own token array, so the repetition
    // flag needs ZERO shuffle (the explode→groupBy(doc_id, g) formulation
    // this replaces shuffled the whole gram stream twice).
    val rep = docs
      .select(col("doc_id"),
        graft.functions.RepetitionStats(TextAnalysis.tokens(col("text"))).as("r"))
      .select(col("doc_id"),
        (round(col("r.dup2") * lit(1.0) / col("r.n2"), 6) > 0.16).as("f_repetitive"))

    // Round 14: hashed 5-gram keys (TextAnalysis.shingleHashes) — the
    // broadcast bench set and the probe join carry 8-byte longs instead
    // of ~50-byte gram strings; same equality classes (oracle-bounded).
    def sh5(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id").as("id"),
      explode(array_distinct(TextAnalysis.shingleHashes(col("text"), 5))).as("s"))
    val bench = sh5(docs.filter(col("doc_id") < 50)).select("s").distinct()
    val shared = sh5(docs.filter(col("doc_id") >= 50))
      .join(broadcast(bench), Seq("s"))
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
    val con = docs.select("doc_id").join(shared, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("n_shared") >= 5, lit(false)).as("f_contaminated"))

    docs.select("doc_id")
      .join(exa, Seq("doc_id")).join(near, Seq("doc_id")).join(q, Seq("doc_id"))
      .join(rep, Seq("doc_id")).join(con, Seq("doc_id"))
      .withColumn("keep",
        !(col("f_exact_dup") || col("f_near_dup") || col("f_low_quality") ||
          col("f_repetitive") || col("f_contaminated")))
  }

  /** The filter-ladder funnel over [[pipelinePreprocess]]'s rule set: how
    * many documents survive each successive rule when applied in pipeline
    * order (exact dup → near dup → quality → repetition → contamination),
    * with the marginal drop count and rate per stage — the attribution
    * table that says WHICH rule is eating the corpus (a document failing
    * two rules charges only the first, as a sequential pipeline would).
    *
    * Scale shape: one pass over the shared flag subtree reduced to a
    * single aggregated row (map-side combine), from which the 5 stage
    * rows EXPLODE — never 5 re-executions of the flag computation (the
    * one-aggregated-DF rule). Drop rate snaps at micro grain against the
    * stage's own inflow.
    */
  val pipelineFilterFunnel: Op = Op.sql(
    "pipeline-filter-funnel",
    """WITH base AS (SELECT doc_id, text, md5(text) AS th FROM documents),
      |eg AS (SELECT th, min(doc_id) AS keep_id, count(*) AS nc FROM base GROUP BY th),
      |exa AS (SELECT doc_id, (nc > 1 AND doc_id <> keep_id) AS f_exact_dup
      |        FROM base JOIN eg USING (th)),
      |words AS (
      |  SELECT DISTINCT doc_id AS id, unnest(list_distinct(string_split(text, ' '))) AS w
      |  FROM documents),
      |hashed AS (
      |  SELECT id, list_reduce(list_prepend(0::BIGINT,
      |           [ascii(substr(w, i, 1))::BIGINT FOR i IN generate_series(1, length(w))]),
      |           (a, b) -> (a * 31 + b) % 1000003) AS h
      |  FROM words),
      |votes AS (
      |  SELECT id, j, CAST(sum(CASE WHEN (h // (2 ** j)::BIGINT) % 2 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v
      |  FROM hashed, (SELECT unnest(generate_series(0, 19)) AS j) g
      |  GROUP BY id, j),
      |fp AS (
      |  SELECT id, CAST(sum(CASE WHEN v > 0 THEN (2 ** j)::BIGINT ELSE 0 END) AS BIGINT) AS simhash
      |  FROM votes GROUP BY id),
      |fg AS (SELECT simhash, min(id) AS keep_id, count(*) AS nc FROM fp GROUP BY simhash),
      |near AS (SELECT id AS doc_id, (nc > 1 AND id <> keep_id) AS f_near_dup
      |         FROM fp JOIN fg USING (simhash)),
      |q AS (SELECT doc_id,
      |        (round(len(list_distinct(string_split(text, ' '))) * 1.0
      |               / len(string_split(text, ' ')), 4) < 0.32) AS f_low_quality
      |      FROM documents),
      |ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g2 AS (SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS g
      |       FROM (SELECT doc_id, ws,
      |               unnest(generate_series(1, greatest(1, len(ws) - 1))) AS i FROM ws)),
      |c2 AS (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY doc_id, g),
      |rep AS (SELECT doc_id,
      |          (round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) * 1.0 / sum(cnt), 6)
      |           > 0.16) AS f_repetitive
      |        FROM c2 GROUP BY doc_id),
      |sh5 AS (SELECT DISTINCT doc_id AS id, array_to_string(ws[i:i+4], ' ') AS s
      |        FROM (SELECT doc_id, ws,
      |                unnest(generate_series(1, greatest(1, len(ws) - 4))) AS i FROM ws)),
      |bench AS (SELECT DISTINCT s FROM sh5 WHERE id < 50),
      |shared AS (SELECT id AS doc_id, count(*) AS n_shared
      |           FROM sh5 JOIN bench USING (s) WHERE id >= 50 GROUP BY id),
      |con AS (SELECT d.doc_id, coalesce(n_shared >= 5, false) AS f_contaminated
      |        FROM documents d LEFT JOIN shared USING (doc_id)),
      |fl AS (SELECT d.doc_id, f_exact_dup, f_near_dup, f_low_quality,
      |              f_repetitive, f_contaminated
      |       FROM documents d
      |       JOIN exa USING (doc_id) JOIN near USING (doc_id) JOIN q USING (doc_id)
      |       JOIN rep USING (doc_id) JOIN con USING (doc_id)),
      |agg AS (SELECT count(*) AS n0,
      |          CAST(sum(CASE WHEN f_exact_dup THEN 1 ELSE 0 END) AS BIGINT) AS d1,
      |          CAST(sum(CASE WHEN NOT f_exact_dup AND f_near_dup
      |                        THEN 1 ELSE 0 END) AS BIGINT) AS d2,
      |          CAST(sum(CASE WHEN NOT f_exact_dup AND NOT f_near_dup
      |                         AND f_low_quality THEN 1 ELSE 0 END) AS BIGINT) AS d3,
      |          CAST(sum(CASE WHEN NOT f_exact_dup AND NOT f_near_dup
      |                         AND NOT f_low_quality AND f_repetitive
      |                        THEN 1 ELSE 0 END) AS BIGINT) AS d4,
      |          CAST(sum(CASE WHEN NOT f_exact_dup AND NOT f_near_dup
      |                         AND NOT f_low_quality AND NOT f_repetitive
      |                         AND f_contaminated THEN 1 ELSE 0 END) AS BIGINT) AS d5
      |        FROM fl)
      |SELECT stage, rule, n_in, n_dropped, n_in - n_dropped AS n_out,
      |       CAST(round(n_dropped * 1000000.0 / n_in) AS BIGINT) / 1000000.0
      |         AS drop_frac
      |FROM (
      |  SELECT CAST(1 AS BIGINT) AS stage, 'exact-dup' AS rule,
      |         n0 AS n_in, d1 AS n_dropped FROM agg
      |  UNION ALL SELECT 2, 'near-dup', n0 - d1, d2 FROM agg
      |  UNION ALL SELECT 3, 'low-quality', n0 - d1 - d2, d3 FROM agg
      |  UNION ALL SELECT 4, 'repetitive', n0 - d1 - d2 - d3, d4 FROM agg
      |  UNION ALL SELECT 5, 'contaminated', n0 - d1 - d2 - d3 - d4, d5 FROM agg)
      |ORDER BY stage""".stripMargin
  ) { (s, d) =>
    val f = flags(s, d)
    val clear = (cs: Seq[String]) => cs.map(c => !col(c)).reduce(_ && _)
    val agg = f.agg(
      count(lit(1)).as("n0"),
      sum(when(col("f_exact_dup"), 1L).otherwise(0L)).as("d1"),
      sum(when(clear(Seq("f_exact_dup")) && col("f_near_dup"), 1L)
        .otherwise(0L)).as("d2"),
      sum(when(clear(Seq("f_exact_dup", "f_near_dup")) && col("f_low_quality"), 1L)
        .otherwise(0L)).as("d3"),
      sum(when(clear(Seq("f_exact_dup", "f_near_dup", "f_low_quality")) &&
        col("f_repetitive"), 1L).otherwise(0L)).as("d4"),
      sum(when(clear(Seq("f_exact_dup", "f_near_dup", "f_low_quality",
        "f_repetitive")) && col("f_contaminated"), 1L).otherwise(0L)).as("d5"))
    val stages = Seq(
      (1L, "exact-dup", col("n0"), col("d1")),
      (2L, "near-dup", col("n0") - col("d1"), col("d2")),
      (3L, "low-quality", col("n0") - col("d1") - col("d2"), col("d3")),
      (4L, "repetitive", col("n0") - col("d1") - col("d2") - col("d3"), col("d4")),
      (5L, "contaminated",
        col("n0") - col("d1") - col("d2") - col("d3") - col("d4"), col("d5")))
    agg.select(explode(array(stages.map { case (st, rule, nIn, nDrop) =>
        struct(lit(st).as("stage"), lit(rule).as("rule"),
          nIn.cast("long").as("n_in"), nDrop.cast("long").as("n_dropped"))
      }: _*)).as("x"))
      .select(col("x.stage").as("stage"), col("x.rule").as("rule"),
        col("x.n_in").as("n_in"), col("x.n_dropped").as("n_dropped"),
        (col("x.n_in") - col("x.n_dropped")).as("n_out"),
        (round(col("x.n_dropped") * lit(1000000.0) / col("x.n_in")).cast("long") /
          lit(1000000.0)).as("drop_frac"))
      .orderBy("stage")
  }

  /** Dataset data card — the datasheet table every published corpus
    * ships: document counts, size mass and size extrema at FOUR grains
    * (lang×source, lang, source, global) computed in ONE pass via
    * GROUPING SETS (Spark plans one Expand ×4 into a single partially
    * aggregated exchange; the naive spelling is four scans unioned).
    * grouping() disambiguates rollup rows from real values; the mean is
    * one double division of two exact integer sums, snapped last.
    */
  val pipelineDataCard: Op = Op.sql(
    "pipeline-data-card",
    """SELECT CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END AS lang,
      |       CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS source,
      |       count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |       CAST(round(CAST(sum(n_chars) AS DOUBLE) * 1000000
      |                  / CAST(count(*) AS DOUBLE)) AS BIGINT)
      |         / 1000000.0 AS mean_chars
      |FROM documents
      |GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
      |ORDER BY lang, source""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .groupingSets(
        Seq(Seq(col("lang"), col("source")), Seq(col("lang")),
          Seq(col("source")), Seq.empty[org.apache.spark.sql.Column]),
        col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"),
        (round(sum("n_chars").cast("double") * lit(1000000) /
          count(lit(1)).cast("double")).cast("long") / lit(1e6)).as("mean_chars"),
        grouping("lang").as("gl"), grouping("source").as("gs"))
      .select(
        when(col("gl") === 1, lit("ALL")).otherwise(col("lang")).as("lang"),
        when(col("gs") === 1, lit("ALL")).otherwise(col("source")).as("source"),
        col("n_docs"), col("total_chars"), col("min_chars"), col("max_chars"),
        col("mean_chars"))
      .orderBy("lang", "source")
  }

  /** Deequ-style column profile — per-column null counts and exact
    * distinct cardinalities over the events table, the data-quality
    * contract a pipeline asserts before training ever sees a shard.
    * ALL columns profile in ONE scan: a single agg computes every
    * column's stats (Spark plans the multi-distinct via one Expand),
    * and the per-column rows EXPLODE from that one aggregated row —
    * never one scan per column, and never N unions of one aggregated
    * subtree (the house rule). At 100 TB the distinct counts switch to
    * the HLL sketch tier (agg-hll-distinct) — this is the exact
    * contract tier.
    */
  val pipelineColumnProfile: Op = Op.sql(
    "pipeline-column-profile",
    """WITH s AS (SELECT count(*) AS n,
      |  CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn1,
      |  count(DISTINCT event_id) AS nd1,
      |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn2,
      |  count(DISTINCT user_id) AS nd2,
      |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn3,
      |  count(DISTINCT event_type) AS nd3,
      |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn4,
      |  count(DISTINCT value) AS nd4,
      |  CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn5,
      |  count(DISTINCT props) AS nd5
      |  FROM events)
      |SELECT col_name, n_nulls, n_distinct, CAST(n AS BIGINT) AS n_rows FROM (
      |  SELECT 'event_id' AS col_name, nn1 AS n_nulls, nd1 AS n_distinct, n FROM s
      |  UNION ALL SELECT 'user_id', nn2, nd2, n FROM s
      |  UNION ALL SELECT 'event_type', nn3, nd3, n FROM s
      |  UNION ALL SELECT 'value', nn4, nd4, n FROM s
      |  UNION ALL SELECT 'props', nn5, nd5, n FROM s)
      |ORDER BY col_name""".stripMargin
  ) { (s, d) =>
    val cols = Seq("event_id", "user_id", "event_type", "value", "props")
    val aggs = count(lit(1)).as("n") +:
      cols.flatMap(c => Seq(
        sum(col(c).isNull.cast("long")).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c")))
    Tables.events(s, d)
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(s"nn_$c").as("n_nulls"),
          col(s"nd_$c").as("n_distinct"), col("n").as("n_rows"))): _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  /** Incremental-recompute planner: diff the current snapshot against a
    * prior one at CHUNK grain and emit, per chunk, the action an
    * incremental pipeline run should take — `skip` (unchanged), `recompute`
    * (rows changed inside the chunk) or `new` (chunk absent from the base).
    * This is the metadata query that turns a 100-TB full rebuild into a
    * touched-chunks-only rebuild — the incremental mirror of the
    * reference's copy/compact planning (src/command/copy.rs, which re-reads
    * whole ranges; chunk grain here matches its range files,
    * src/filenames.rs:60-88).
    *
    * The base snapshot is simulated by predicate (rows with
    * `o_orderkey % 997 == 0` arrived since the base was taken, and chunks
    * with `chunk % 37 == 0` are entirely new) so both engines derive it
    * from the same table — the plan shape is what matters: ONE scan, ONE
    * chunk-grained shuffle, with the base/current counts computed as
    * conditional aggregates of the same pass, never a self-join of two
    * snapshot scans. Output is chunk-catalog sized.
    */
  val pipelineIncrementalDelta: Op = Op.sql(
    "pipeline-incremental-delta",
    """WITH c AS (
      |  SELECT o_orderkey // 500 AS chunk,
      |         CAST(count(*) AS BIGINT) AS cur_n,
      |         CAST(count(*) FILTER (WHERE o_orderkey % 997 <> 0
      |                                 AND (o_orderkey // 500) % 37 <> 0) AS BIGINT) AS base_n
      |  FROM orders GROUP BY chunk)
      |SELECT chunk, base_n, cur_n,
      |       CASE WHEN base_n = 0 THEN 'new'
      |            WHEN cur_n = base_n THEN 'skip'
      |            ELSE 'recompute' END AS action
      |FROM c ORDER BY chunk""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(expr("o_orderkey div 500").as("chunk"))
      .agg(
        count(lit(1)).as("cur_n"),
        sum(when(col("o_orderkey") % 997 =!= 0 &&
          expr("o_orderkey div 500") % 37 =!= 0, 1L).otherwise(0L)).as("base_n"))
      .select(col("chunk"), col("base_n"), col("cur_n"),
        when(col("base_n") === 0, "new")
          .when(col("cur_n") === col("base_n"), "skip")
          .otherwise("recompute").as("action"))
      .orderBy("chunk")
  }

  /** Per-partition content fingerprint: an ORDER-INDEPENDENT additive hash
    * of every (doc_id, text) pair, rolled up to the (lang, source) grain —
    * the dataset content address a pipeline stamps into its manifest so a
    * re-run, a migration, or a downstream consumer can prove "same bytes"
    * without re-reading payloads (the distributed generalization of the
    * reference's per-file verify pass, src/command/verify.rs:200-260).
    * Addition commutes, so the fingerprint is invariant to partitioning,
    * task order and row order — two clusters of different sizes agree.
    * Per-row terms are md5-derived 20-bit values so the BIGINT sum cannot
    * overflow before ~2⁴³ rows per partition (ANSI-safe at any real SF).
    *
    * Scale shape: one map-side-combined groupBy to the partition grain;
    * the hash is a per-row projection. Incremental: a changed partition
    * changes its fingerprint only — the delta re-verify reads just that.
    */
  val pipelineContentFingerprint: Op = Op.sql(
    "pipeline-content-fingerprint",
    """SELECT lang, source, count(*) AS n_docs,
      |       CAST(sum(CAST(('0x' || substr(md5('fp:' || CAST(doc_id AS VARCHAR)
      |                || ':' || text), 1, 8)) AS BIGINT) % 1048576
      |           ) AS BIGINT) AS fingerprint
      |FROM documents GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), col("source"),
        (conv(substring(md5(concat(lit("fp:"), col("doc_id").cast("string"),
          lit(":"), col("text"))), 1, 8), 16, 10).cast("long") % 1048576L)
          .as("term"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("term").cast("long").as("fingerprint"))
      .orderBy("lang", "source")
  }

  /** Fingerprint-driven delta detection: compare the content fingerprint
    * of an OLD snapshot (doc_id % 10 < 8 plays the prior manifest) against
    * the CURRENT corpus per (lang, source) partition and flag exactly the
    * partitions whose bytes changed — the planner that turns
    * [[pipelineContentFingerprint]] into an incremental re-verify /
    * re-publish list (only `changed` partitions are re-read; at 100 TB
    * that is the whole point of manifest fingerprints). Both snapshots'
    * fingerprints come from ONE conditional-aggregation scan — never two
    * passes over the corpus.
    */
  val pipelineFingerprintDiff: Op = Op.sql(
    "pipeline-fingerprint-diff",
    """WITH t AS (
      |  SELECT lang, source, doc_id % 10 < 8 AS is_old,
      |         CAST(('0x' || substr(md5('fp:' || CAST(doc_id AS VARCHAR)
      |              || ':' || text), 1, 8)) AS BIGINT) % 1048576 AS term
      |  FROM documents),
      |p AS (SELECT lang, source,
      |        CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
      |        count(*) AS n_new,
      |        CAST(coalesce(sum(CASE WHEN is_old THEN term END), 0) AS BIGINT)
      |          AS fp_old,
      |        CAST(sum(term) AS BIGINT) AS fp_new
      |      FROM t GROUP BY lang, source)
      |SELECT lang, source, n_old, n_new, fp_old, fp_new,
      |       (n_old <> n_new OR fp_old <> fp_new) AS changed
      |FROM p ORDER BY lang, source""".stripMargin
  ) { (s, d) =>
    val term = conv(substring(md5(concat(lit("fp:"),
      col("doc_id").cast("string"), lit(":"), col("text"))), 1, 8), 16, 10)
      .cast("long") % 1048576L
    Tables.documents(s, d)
      .select(col("lang"), col("source"), (col("doc_id") % 10 < 8).as("is_old"),
        term.as("term"))
      .groupBy("lang", "source")
      .agg(
        sum(when(col("is_old"), 1L).otherwise(0L)).cast("long").as("n_old"),
        count(lit(1)).as("n_new"),
        coalesce(sum(when(col("is_old"), col("term"))), lit(0L)).cast("long")
          .as("fp_old"),
        sum("term").cast("long").as("fp_new"))
      .withColumn("changed",
        col("n_old") =!= col("n_new") || col("fp_old") =!= col("fp_new"))
      .orderBy("lang", "source")
  }

  /** Dead-letter audit: grade the event feed against the ingestion
    * contract, one row per rule with the violation count and share (basis
    * points) — the table a quarantine router writes next to the clean
    * output. Zero-count rows are the point: they PROVE the feed honors
    * the rule (null props, negative amounts, unknown types, out-of-range
    * timestamps), while non-zero rows (the 400-cap breach here) size the
    * quarantine. The four row-local rules come from ONE
    * conditional-aggregation scan exploded to rows; the duplicate-id rule
    * is its own key-grained aggregate (a per-key count can't ride a
    * row-local scan) — never five passes.
    */
  val pipelineQuarantine: Op = Op.sql(
    "pipeline-quarantine",
    """WITH f AS (
      |  SELECT count(*) AS n,
      |         CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |           AS null_props,
      |         CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS neg_value,
      |         CAST(sum(CASE WHEN event_type NOT IN
      |               ('click','error','purchase','signup','view')
      |               THEN 1 ELSE 0 END) AS BIGINT) AS unknown_type,
      |         CAST(sum(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS value_over_cap
      |  FROM events),
      |dup AS (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS dup_ids FROM
      |          (SELECT event_id, count(*) AS c FROM events
      |           GROUP BY event_id HAVING count(*) > 1)),
      |rules AS (
      |  SELECT 'dup_event_id' AS rule, dup.dup_ids AS n_failed, f.n FROM f, dup
      |  UNION ALL SELECT 'neg_value', f.neg_value, f.n FROM f
      |  UNION ALL SELECT 'null_props', f.null_props, f.n FROM f
      |  UNION ALL SELECT 'unknown_type', f.unknown_type, f.n FROM f
      |  UNION ALL SELECT 'value_over_cap', f.value_over_cap, f.n FROM f)
      |SELECT rule, n_failed,
      |       CAST((n_failed * 10000) // n AS BIGINT) AS share_bp
      |FROM rules ORDER BY rule""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val f = ev.agg(count(lit(1)).as("n"),
      sum(when(col("props").isNull, 1L).otherwise(0L)).cast("long")
        .as("null_props"),
      sum(when(col("value") < 0, 1L).otherwise(0L)).cast("long").as("neg_value"),
      sum(when(!col("event_type").isin(
        "click", "error", "purchase", "signup", "view"), 1L).otherwise(0L))
        .cast("long").as("unknown_type"),
      sum(when(col("value") > 400, 1L).otherwise(0L)).cast("long")
        .as("value_over_cap"))
    val dup = ev.groupBy("event_id").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(coalesce(sum(col("c") - 1), lit(0L)).cast("long").as("dup_ids"))
    f.crossJoin(broadcast(dup))
      .select(explode(array(
        struct(lit("dup_event_id").as("rule"), col("dup_ids").as("n_failed")),
        struct(lit("neg_value").as("rule"), col("neg_value").as("n_failed")),
        struct(lit("null_props").as("rule"), col("null_props").as("n_failed")),
        struct(lit("unknown_type").as("rule"), col("unknown_type").as("n_failed")),
        struct(lit("value_over_cap").as("rule"),
          col("value_over_cap").as("n_failed")))).as("r"), col("n"))
      .select(col("r.rule").as("rule"), col("r.n_failed").as("n_failed"),
        expr("(r.n_failed * 10000) div n").as("share_bp"))
      .orderBy("rule")
  }

  /** Deterministic experiment bucketing + sample-ratio-mismatch check:
    * users hash into control/treatment (md5 parity — seedless, sticky
    * across sessions and re-runs, the property assignment systems must
    * prove), and the one-row audit reports both arm sizes, the imbalance
    * in basis points, and the SRM flag — (n_a − n_b)² > 9·n is the
    * 3-sigma binomial bound spelled in EXACT integers (no sqrt, no
    * p-value table). An SRM fire means the assignment or logging is
    * broken and every downstream metric read is void — this is the first
    * gate an experimentation platform runs.
    *
    * Scale shape: one distinct-user pass, one conditional aggregation.
    */
  val pipelineAbAssign: Op = Op.sql(
    "pipeline-ab-assign",
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |a AS (SELECT user_id,
      |        CAST(('0x' || substr(md5('exp1:' || CAST(user_id AS VARCHAR)),
      |              1, 8)) AS BIGINT) % 2 AS arm
      |      FROM u)
      |SELECT count(*) AS n_users,
      |       CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
      |       CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treatment,
      |       CAST(abs(sum(CASE WHEN arm = 0 THEN 1 ELSE -1 END)) * 10000
      |            // count(*) AS BIGINT) AS imbalance_bp,
      |       (sum(CASE WHEN arm = 0 THEN 1 ELSE -1 END) *
      |        sum(CASE WHEN arm = 0 THEN 1 ELSE -1 END) > 9 * count(*)) AS srm
      |FROM a""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d).select("user_id").distinct()
      .select((conv(substring(md5(concat(lit("exp1:"),
        col("user_id").cast("string"))), 1, 8), 16, 10).cast("long") % 2)
        .as("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("long").as("n_control"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("long").as("n_treatment"),
        sum(when(col("arm") === 0, 1L).otherwise(-1L)).as("diff"))
      .select(col("n_users"), col("n_control"), col("n_treatment"),
        expr("abs(diff) * 10000 div n_users").as("imbalance_bp"),
        (col("diff") * col("diff") > lit(9L) * col("n_users")).as("srm"))
  }

  /** Declarative data-quality suite (the Deequ/Great-Expectations tier)
    * over the events stream plus one cross-table referential check —
    * every row-level expectation and the uniqueness check fold into ONE
    * conditional-aggregation pass of the table ([[graft.dq.Dq.suite]]),
    * so 50 checks cost the same scan as one; the report rows explode
    * from the single aggregate row (never a union of N selects over one
    * aggregated subtree). Two expectations fail by design on this corpus
    * (the value-cap canary and the no-error canary), so the report
    * exercises both verdicts.
    *
    * Scale shape: one map-side-combined pass for the suite, one
    * key-grained anti-join for the referential row; the UNION joins two
    * REPORT tables (≤ checks rows), not two scans.
    */
  val pipelineDqSuite: Op = Op.sql(
    "pipeline-dq-suite",
    """WITH s AS (SELECT count(*) AS n,
      |  CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v0,
      |  CAST(sum(CASE WHEN value >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
      |  CAST(sum(CASE WHEN event_type IS NULL OR event_type NOT IN
      |             ('click','view','purchase','signup','error')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS v2,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS v3,
      |  CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v4,
      |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v5,
      |  CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS u0
      |  FROM events),
      |r AS (SELECT (SELECT count(*) FROM orders) AS nc,
      |             (SELECT count(*) FROM orders o LEFT JOIN customer c
      |                ON o.o_custkey = c.c_custkey
      |              WHERE c.c_custkey IS NULL) AS v),
      |rep AS (
      |  SELECT 'value_non_negative' AS check_name, n AS n_checked, v0 AS n_violations FROM s
      |  UNION ALL SELECT 'value_below_300', n, v1 FROM s
      |  UNION ALL SELECT 'event_type_known', n, v2 FROM s
      |  UNION ALL SELECT 'no_error_events', n, v3 FROM s
      |  UNION ALL SELECT 'ts_not_null', n, v4 FROM s
      |  UNION ALL SELECT 'user_id_not_null', n, v5 FROM s
      |  UNION ALL SELECT 'unique:event_id', n, u0 FROM s
      |  UNION ALL SELECT 'ref:orders.o_custkey->customer',
      |                   CAST(nc AS BIGINT), CAST(v AS BIGINT) FROM r)
      |SELECT check_name, CAST(n_checked AS BIGINT) AS n_checked,
      |       CAST(n_violations AS BIGINT) AS n_violations,
      |       n_violations = 0 AS pass
      |FROM rep ORDER BY check_name""".stripMargin
  ) { (s, d) =>
    import graft.dq.Dq
    val knownTypes = Seq("click", "view", "purchase", "signup", "error")
    val report = Dq.suite(Tables.events(s, d), Seq(
        Dq.Check("value_non_negative", col("value") < 0),
        Dq.Check("value_below_300", col("value") >= 300),
        Dq.Check("event_type_known",
          col("event_type").isNull || !col("event_type").isin(knownTypes: _*)),
        Dq.Check("no_error_events", col("event_type") === "error"),
        Dq.Check("ts_not_null", col("ts").isNull),
        Dq.Check("user_id_not_null", col("user_id").isNull)),
      uniqueKeys = Seq("event_id"))
    report.unionByName(Dq.referential(Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey", "ref:orders.o_custkey->customer"))
      .orderBy("check_name")
  }

  /** Expectation auto-profiler — the other half of the DQ tier: scan the
    * table once and SUGGEST the expectation suite (per column: a
    * [p0.5%, p99.5%] value band snapped to integers, observed null rate
    * in bp, and the row count the band was fitted on). The suggested
    * rows are exactly what a reviewer promotes into pipeline-dq-suite
    * checks — profile once, enforce forever. Quantile bands (not
    * min/max) so one historical outlier doesn't bless future outliers.
    *
    * Scale shape: ONE aggregation pass computes every column's
    * percentiles/min/max/null counts (map-side partial aggregation);
    * the per-column suggestion rows explode from the single aggregate
    * row — same single-scan contract as Dq.suite, pinned alongside it.
    * At 100 TB swap percentile for approx_percentile; nothing else
    * changes.
    */
  val pipelineDqSuggest: Op = Op.sql(
    "pipeline-dq-suggest",
    """WITH s AS (SELECT count(*) AS n,
      |  CAST(round(quantile_cont(value, 0.005) * 100) AS BIGINT) AS v_lo,
      |  CAST(round(quantile_cont(value, 0.995) * 100) AS BIGINT) AS v_hi,
      |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
      |  CAST(min(user_id) AS BIGINT) AS u_lo, CAST(max(user_id) AS BIGINT) AS u_hi,
      |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS u_null,
      |  CAST(min(event_id) AS BIGINT) AS e_lo, CAST(max(event_id) AS BIGINT) AS e_hi,
      |  CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS e_null,
      |  CAST(min(epoch_ns(ts) // 86400000000000) AS BIGINT) AS t_lo,
      |  CAST(max(epoch_ns(ts) // 86400000000000) AS BIGINT) AS t_hi,
      |  CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t_null
      |  FROM events),
      |r AS (
      |  SELECT 'value_cents' AS column_name, v_lo AS lo, v_hi AS hi, v_null AS nn, n FROM s
      |  UNION ALL SELECT 'user_id', u_lo, u_hi, u_null, n FROM s
      |  UNION ALL SELECT 'event_id', e_lo, e_hi, e_null, n FROM s
      |  UNION ALL SELECT 'ts_day', t_lo, t_hi, t_null, n FROM s)
      |SELECT column_name, lo AS suggested_lo, hi AS suggested_hi,
      |       CAST((nn * 10000) // n AS BIGINT) AS null_bp,
      |       CAST(n AS BIGINT) AS n_profiled
      |FROM r ORDER BY column_name""".stripMargin
  ) { (s, d) =>
    val one = Tables.events(s, d).agg(
      count(lit(1)).as("n"),
      round(expr("percentile(value, 0.005D)") * 100).cast("long").as("v_lo"),
      round(expr("percentile(value, 0.995D)") * 100).cast("long").as("v_hi"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).cast("long").as("v_null"),
      min("user_id").cast("long").as("u_lo"), max("user_id").cast("long").as("u_hi"),
      sum(when(col("user_id").isNull, 1L).otherwise(0L)).cast("long").as("u_null"),
      min("event_id").cast("long").as("e_lo"), max("event_id").cast("long").as("e_hi"),
      sum(when(col("event_id").isNull, 1L).otherwise(0L)).cast("long").as("e_null"),
      min(expr("ts div 86400000000000")).cast("long").as("t_lo"),
      max(expr("ts div 86400000000000")).cast("long").as("t_hi"),
      sum(when(col("ts").isNull, 1L).otherwise(0L)).cast("long").as("t_null"))
    def row(name: String, lo: String, hi: String, nn: String) =
      struct(lit(name).as("column_name"), col(lo).as("lo"), col(hi).as("hi"),
        col(nn).as("nn"))
    one.select(col("n"), explode(array(
        row("value_cents", "v_lo", "v_hi", "v_null"),
        row("user_id", "u_lo", "u_hi", "u_null"),
        row("event_id", "e_lo", "e_hi", "e_null"),
        row("ts_day", "t_lo", "t_hi", "t_null"))).as("r"))
      .select(col("r.column_name").as("column_name"),
        col("r.lo").as("suggested_lo"), col("r.hi").as("suggested_hi"),
        expr("(r.nn * 10000) div n").as("null_bp"),
        col("n").as("n_profiled"))
      .orderBy("column_name")
  }

  /** Incremental view maintenance — the CHANGE SET a materialized
    * per-user spend aggregate needs when one new day of events lands:
    * 'update' rows carry old and new totals for users the delta day
    * touched, 'insert' rows are first-seen users (old total NULL). This
    * is the Delta-Live-Tables/Materialize contract the reference's
    * skip-existing + fix cycle approximates at file grain
    * (src/command/fix.rs:39-69) — emit only what changed, never
    * recompute the view. The delta day is the LAST populated day (a
    * 1-row broadcast anchor).
    *
    * Scale shape: the base aggregates only delta-touched users (semi
    * join on the delta's key set BEFORE the base aggregation — the
    * base view is read key-pruned, which at 100 TB is the difference
    * between touching one bucket and recomputing the world); one
    * key-grained outer join of two delta-key-sized tables emits the
    * change set.
    */
  val pipelineIvmDelta: Op = Op.sql(
    "pipeline-ivm-delta",
    """WITH g AS (SELECT max(epoch_ns(ts) // 86400000000000) AS dday FROM events),
      |delta AS (SELECT user_id,
      |                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS d_cents,
      |                 count(*) AS d_events
      |          FROM events WHERE epoch_ns(ts) // 86400000000000 = (SELECT dday FROM g)
      |          GROUP BY user_id),
      |base AS (SELECT user_id,
      |                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS b_cents,
      |                count(*) AS b_events
      |         FROM events
      |         WHERE epoch_ns(ts) // 86400000000000 < (SELECT dday FROM g)
      |           AND user_id IN (SELECT user_id FROM delta)
      |         GROUP BY user_id)
      |SELECT d.user_id AS user_id,
      |       CASE WHEN b.user_id IS NULL THEN 'insert' ELSE 'update' END AS op,
      |       b.b_cents AS old_cents,
      |       CAST(coalesce(b.b_cents, 0) + d.d_cents AS BIGINT) AS new_cents,
      |       CAST(coalesce(b.b_events, 0) + d.d_events AS BIGINT) AS new_events
      |FROM delta d LEFT JOIN base b ON d.user_id = b.user_id
      |ORDER BY d.user_id""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
    val g = ev.agg(max("day").as("dday"))
    val evd = ev.crossJoin(broadcast(g))
    val delta = evd.filter(col("day") === col("dday"))
      .groupBy("user_id")
      .agg(sum("cents").cast("long").as("d_cents"), count(lit(1)).as("d_events"))
    // no broadcast hint on the delta key set: one day's touched users are
    // unbounded at 100 TB — a hash semi-join keys the base prune and AQE
    // broadcasts at fixture scale on its own
    val base = evd.filter(col("day") < col("dday"))
      .join(delta.select(col("user_id")), Seq("user_id"), "left_semi")
      .groupBy("user_id")
      .agg(sum("cents").cast("long").as("b_cents"), count(lit(1)).as("b_events"))
      .withColumnRenamed("user_id", "b_user")
    delta.join(base, col("user_id") === col("b_user"), "left")
      .select(col("user_id"),
        when(col("b_user").isNull, lit("insert")).otherwise(lit("update")).as("op"),
        col("b_cents").as("old_cents"),
        (coalesce(col("b_cents"), lit(0L)) + col("d_cents")).cast("long").as("new_cents"),
        (coalesce(col("b_events"), lit(0L)) + col("d_events")).cast("long").as("new_events"))
      .orderBy("user_id")
  }

  /** END-TO-END curation composite — the LLM-pipeline analogue of
    * verify-full-roundtrip (which composes the reference's five commands,
    * /root/reference/src/command/verify.rs:409-477): the canonical
    * curation pass — exact dedup → near-dup cluster drop → quality screen
    * → mix quota → leakage-safe split → sequence packing — run as ONE
    * declarative plan whose output pins the surviving doc count, bytes
    * and tokens after every stage. Each stage is the standalone board
    * op's subtree, shared VERBATIM (so the composite can never drift from
    * the parts a pipeline also runs individually):
    *  - stage 1 exact-dedup: keep the min doc_id per md5(text) group
    *    (dedup-exact's rule);
    *  - stage 2 near-dup drop: keep the cluster representative
    *    (cluster label == own id) of [[DedupOps.persistedDocClusters]] —
    *    the dedup-savings-by-source rule over the shared memoized table;
    *  - stage 3 quality screen: drop the bottom unigram-logprob decile
    *    ([[TextOps.unigramDecileBuckets]], text-quality-deciles' subtree);
    *  - stage 4 mix quota: per-source n_keep from text-mix-weights'
    *    negotiated table ([[TextOps.mixWeightTable]]), filled among the
    *    stage-3 survivors in md5(doc_id) order (the seedless deterministic
    *    draw of text-mix-apply / text-sample-uniform);
    *  - stage 5 split: the text-train-split 'train' predicate
    *    (content-hash bucket < 'e6' — leakage-safe by construction);
    *  - stage 6 pack: [[graft.text.Packing.packSequences]] (budget 512,
    *    8 shards) over the survivors; n_units flips meaning here to the
    *    PHYSICAL count of packed 512-token sequences
    *    (Σ_shard ⌈tokens/512⌉), with n_tokens read off the packing
    *    output so the Packing subtree is load-bearing.
    * NULL-text documents are excluded at stage 0 (the corpus row counts
    * READABLE docs — same filter both engines). Quality deciles and mix
    * weights are computed over the FULL corpus exactly as their
    * standalone ops do (shared-verbatim discipline); the funnel applies
    * them cumulatively.
    *
    * Scale shape: stages 0-3 are ONE pass over the doc catalog joined to
    * two id-keyed derived tables (the memoized cluster table and the
    * decile buckets — the doc_id exchange is planned once and reused);
    * exact-dedup keeper is a min-over-window partitioned by the 16-byte
    * content hash (one corpus exchange, no join-back); the quota rank
    * windows per SOURCE over the WHOLE catalog — ordering k3 DESC first
    * means survivors' ranks equal their rank among survivors alone, the
    * deliberate trade that lets ALL six doc-grain stage counters fold in
    * ONE aggregation over one ranked pass (no per-stage branches). The
    * per-source window is low-cardinality-partitioned — the same funnel
    * shape text-mix-apply documents, with the same pathological-shape
    * remedy (near-single-source corpus → salted two-phase rank); the
    * pack cumsum windows per SHARD (text-pack-sequences' shape — never a
    * global sort). The pack metrics fold over the 8 shard subtotals, and
    * the 7 output rows EXPLODE from the single assembled row (the
    * one-aggregated-DF rule).
    * At 100 TB the dominant cost is the token-grain quality-scoring pass
    * (swap exact percentile → approx_percentile, nothing else changes);
    * the shared cluster table amortizes across the whole dedup family.
    */
  lazy val pipelineCurationE2e: Op = Op.sql(
    "pipeline-curation-e2e",
    s"""WITH RECURSIVE ${DedupOps.ShingleOracle},
      |${DedupOps.ClusterOracle},
      |d AS (SELECT doc_id, source,
      |             CAST(length(text) AS BIGINT) AS n_bytes,
      |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |             md5(text) AS h,
      |             substr(md5(text), 1, 2) < 'e6' AS is_train
      |      FROM documents WHERE text IS NOT NULL),
      |ek AS (SELECT h, min(doc_id) AS keep_id FROM d GROUP BY h),
      |${TextOps.unigramDecileCtes("sc", "qa")},
      |f AS (SELECT d.*,
      |             (d.doc_id = ek.keep_id) AS k1,
      |             (d.doc_id = ek.keep_id AND cl.cluster = d.doc_id) AS k2,
      |             (d.doc_id = ek.keep_id AND cl.cluster = d.doc_id
      |              AND qa.bucket >= 1) AS k3
      |      FROM d JOIN ek USING (h)
      |             JOIN cl ON cl.id = d.doc_id
      |             JOIN qa USING (doc_id)),
      |ms AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
      |mt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total, count(*) AS n_sources FROM ms),
      |mw AS (SELECT source, n_docs,
      |         least(1000000, CAST(round(total * 1000000.0 / (n_sources * n_docs)) AS BIGINT)) AS w_e6
      |       FROM ms, mt),
      |mq AS (SELECT source, (n_docs * w_e6) // 1000000 AS n_keep FROM mw),
      |rnk AS (SELECT f.*, row_number() OVER (PARTITION BY source
      |                 ORDER BY k3 DESC, md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |        FROM f),
      |fl AS (SELECT rnk.*, (k3 AND rk <= mq.n_keep) AS k4,
      |              (k3 AND rk <= mq.n_keep AND is_train) AS k5
      |       FROM rnk JOIN mq ON rnk.source = mq.source),
      |fr AS (SELECT CAST(count(*) AS BIGINT) AS n0,
      |              CAST(sum(n_bytes) AS BIGINT) AS b0,
      |              CAST(sum(n_tokens) AS BIGINT) AS t0,
      |              CAST(sum(CASE WHEN k1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |              CAST(sum(CASE WHEN k1 THEN n_bytes ELSE 0 END) AS BIGINT) AS b1,
      |              CAST(sum(CASE WHEN k1 THEN n_tokens ELSE 0 END) AS BIGINT) AS t1,
      |              CAST(sum(CASE WHEN k2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |              CAST(sum(CASE WHEN k2 THEN n_bytes ELSE 0 END) AS BIGINT) AS b2,
      |              CAST(sum(CASE WHEN k2 THEN n_tokens ELSE 0 END) AS BIGINT) AS t2,
      |              CAST(sum(CASE WHEN k3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
      |              CAST(sum(CASE WHEN k3 THEN n_bytes ELSE 0 END) AS BIGINT) AS b3,
      |              CAST(sum(CASE WHEN k3 THEN n_tokens ELSE 0 END) AS BIGINT) AS t3,
      |              CAST(sum(CASE WHEN k4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
      |              CAST(sum(CASE WHEN k4 THEN n_bytes ELSE 0 END) AS BIGINT) AS b4,
      |              CAST(sum(CASE WHEN k4 THEN n_tokens ELSE 0 END) AS BIGINT) AS t4,
      |              CAST(sum(CASE WHEN k5 THEN 1 ELSE 0 END) AS BIGINT) AS n5,
      |              CAST(sum(CASE WHEN k5 THEN n_bytes ELSE 0 END) AS BIGINT) AS b5,
      |              CAST(sum(CASE WHEN k5 THEN n_tokens ELSE 0 END) AS BIGINT) AS t5
      |       FROM fl),
      |pk0 AS (SELECT doc_id % 8 AS shard, CAST(sum(n_tokens) AS BIGINT) AS st
      |        FROM fl WHERE k5 GROUP BY shard),
      |pk AS (SELECT coalesce(CAST(sum((st + 511) // 512) AS BIGINT), 0) AS n_seqs,
      |              coalesce(CAST(sum(st) AS BIGINT), 0) AS t6 FROM pk0)
      |SELECT CAST(0 AS BIGINT) AS stage, 'corpus' AS stage_name,
      |       n0 AS n_units, b0 AS n_bytes, t0 AS n_tokens FROM fr
      |UNION ALL SELECT CAST(1 AS BIGINT), 'exact-dedup', n1, b1, t1 FROM fr
      |UNION ALL SELECT CAST(2 AS BIGINT), 'neardup-cluster-drop', n2, b2, t2 FROM fr
      |UNION ALL SELECT CAST(3 AS BIGINT), 'quality-screen', n3, b3, t3 FROM fr
      |UNION ALL SELECT CAST(4 AS BIGINT), 'mix-quota', n4, b4, t4 FROM fr
      |UNION ALL SELECT CAST(5 AS BIGINT), 'train-split', n5, b5, t5 FROM fr
      |UNION ALL SELECT CAST(6 AS BIGINT), 'pack-512', pk.n_seqs, fr.b5, pk.t6
      |          FROM pk, fr
      |ORDER BY stage""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("n_bytes"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        md5(col("text")).as("h"),
        (substring(md5(col("text")), 1, 2) < "e6").as("is_train"))
    val withK1 = docs.withColumn("k1",
      col("doc_id") === min("doc_id").over(Window.partitionBy("h")))
    val clusters = DedupOps.persistedDocClusters(s, d)
      .withColumnRenamed("id", "doc_id")
    val buckets = TextOps.unigramDecileBuckets(s, d).select("doc_id", "bucket")
    val f = withK1
      .join(clusters, Seq("doc_id"))
      .join(buckets, Seq("doc_id"))
      .withColumn("k2", col("k1") && col("cluster") === col("doc_id"))
      .withColumn("k3", col("k2") && col("bucket") >= 1)
    val quotas = TextOps.mixWeightTable(s, d)
      .select(col("source"), expr("(n_docs * w_e6) div 1000000").as("n_keep"))
    // k3 survivors sort FIRST within each source (k3 desc), so their
    // ranks equal the rank among survivors alone — one window over f
    // instead of a filtered branch, letting ALL six stage counters fold
    // in a single aggregation pass
    // ranked is deliberately NOT persisted (round-13 A/B): its second
    // consumer (the pack branch's survivor id list) prunes to doc_id+k5,
    // so the "recompute" is a narrow column-pruned pass over reused
    // exchanges — cheaper than the full-width materialization barrier a
    // persist forces (measured 2.42 → 3.71 s min-of-3 interleaved WITH
    // a persist).
    val ranked = f
      .withColumn("rk", row_number().over(Window.partitionBy("source")
        .orderBy(col("k3").desc, md5(col("doc_id").cast("string")),
          col("doc_id"))).cast("long"))
      .join(broadcast(quotas), Seq("source"))
      .withColumn("k4", col("k3") && col("rk") <= col("n_keep"))
      .withColumn("k5", col("k4") && col("is_train"))
    def stageAgg(flag: Column, i: Int) = Seq(
      sum(when(flag, 1L).otherwise(0L)).cast("long").as(s"n$i"),
      sum(when(flag, col("n_bytes")).otherwise(0L)).cast("long").as(s"b$i"),
      sum(when(flag, col("n_tokens")).otherwise(0L)).cast("long").as(s"t$i"))
    // n0 is count(1), not sum(when(true,1)): on an EMPTY readable corpus
    // a global sum returns NULL where the oracle's count(*) returns 0
    val allAggs = Seq(count(lit(1)).cast("long").as("n0")) ++
      stageAgg(lit(true), 0).tail ++ stageAgg(col("k1"), 1) ++
      stageAgg(col("k2"), 2) ++ stageAgg(col("k3"), 3) ++
      stageAgg(col("k4"), 4) ++ stageAgg(col("k5"), 5)
    val fr = ranked.agg(allAggs.head, allAggs.tail: _*)
    val ids5 = ranked.filter(col("k5")).select("doc_id")
    val packed = graft.text.Packing.packSequences(
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .join(ids5, Seq("doc_id"), "left_semi"),
      "doc_id", "text", budget = 512L, shards = 8)
    val pk = packed.groupBy("shard").agg(sum("n_tokens").as("st"))
      .agg(coalesce(sum(expr("(st + 511) div 512")), lit(0L)).cast("long").as("n_seqs"),
        coalesce(sum("st"), lit(0L)).cast("long").as("t6"))
    def stageRow(i: Long, name: String, n: Column, b: Column, t: Column) =
      struct(lit(i).as("stage"), lit(name).as("stage_name"),
        n.cast("long").as("n_units"), b.cast("long").as("n_bytes"),
        t.cast("long").as("n_tokens"))
    fr.crossJoin(broadcast(pk))
      .select(explode(array(
        stageRow(0L, "corpus", col("n0"), col("b0"), col("t0")),
        stageRow(1L, "exact-dedup", col("n1"), col("b1"), col("t1")),
        stageRow(2L, "neardup-cluster-drop", col("n2"), col("b2"), col("t2")),
        stageRow(3L, "quality-screen", col("n3"), col("b3"), col("t3")),
        stageRow(4L, "mix-quota", col("n4"), col("b4"), col("t4")),
        stageRow(5L, "train-split", col("n5"), col("b5"), col("t5")),
        stageRow(6L, "pack-512", col("n_seqs"), col("b5"), col("t6")))).as("r"))
      .select(col("r.stage").as("stage"), col("r.stage_name").as("stage_name"),
        col("r.n_units").as("n_units"), col("r.n_bytes").as("n_bytes"),
        col("r.n_tokens").as("n_tokens"))
      .orderBy("stage")
  }

  /** Stage-ORDER sensitivity of the curation funnel: does running the
    * quality screen BEFORE near-dup dedup change which documents
    * survive? Per multi-member near-dup cluster, compare the keeper
    * under dedup-first (longest member of the WHOLE cluster, kept only
    * if it passes the quality screen) against quality-first (longest
    * member among QUALITY-PASSING members; the cluster vanishes if none
    * passes). The one-row report — clusters whose keeper CHANGES,
    * clusters LOST entirely under each order — is the empirical answer
    * to the "filter order doesn't matter, right?" assumption every
    * pipeline quietly makes (it does matter exactly when a cluster's
    * longest member is junk but a shorter twin is clean). Shares
    * [[DedupOps.persistedDocClusters]] and
    * [[TextOps.unigramDecileBuckets]] verbatim with the standalone ops
    * and [[pipelineCurationE2e]] (which hard-codes dedup-first — k2
    * before k3; this op measures what that choice costs). Reference
    * analogue: verify's fail-fast stage ordering,
    * /root/reference/src/command/verify.rs:535-545 (block failure skips
    * tx/trace verify), lifted to the curation grain (extension scope).
    *
    * Both keepers ride ONE cluster-grain aggregation: the all-members
    * argmax carries the keeper's quality bucket as struct payload
    * ((len, -id) is unique per doc, so the bucket can never drive the
    * compare — the sim-kmeans-elbow trick), and the quality-first
    * argmax is a conditional max that is NULL when no member passes.
    * Keeper rule = dedup-cluster-rep's max(struct(len, -id)) verbatim.
    *
    * Scale shape: cluster table and decile buckets amortize across the
    * dedup/curation family (persisted / shared subtrees); this op adds
    * two doc-keyed joins, one cluster-grain map-side-combined groupBy
    * and a 1-row fold — no window, no new corpus pass beyond the
    * shared subtrees.
    */
  val pipelineOrderSensitivity: Op = Op.sql(
    "pipeline-order-sensitivity",
    s"""WITH RECURSIVE ${DedupOps.ShingleOracle},
      |${DedupOps.ClusterOracle},
      |${TextOps.unigramDecileCtes("sc", "qa")},
      |sized AS (SELECT cl.id, cl.cluster, length(d.text) AS len, qa.bucket
      |          FROM cl JOIN documents d ON d.doc_id = cl.id
      |                  JOIN qa ON qa.doc_id = cl.id),
      |alk AS (SELECT cluster, count(*) AS n_members FROM sized GROUP BY cluster),
      |rd AS (SELECT cluster, id, bucket,
      |              row_number() OVER (PARTITION BY cluster
      |                                 ORDER BY len DESC, id) AS rn FROM sized),
      |rq AS (SELECT cluster, id,
      |              row_number() OVER (PARTITION BY cluster
      |                                 ORDER BY len DESC, id) AS rn
      |       FROM sized WHERE bucket >= 1),
      |per AS (SELECT a.cluster, d1.id AS kd, d1.bucket AS kdb, q1.id AS kq
      |        FROM alk a JOIN rd d1 ON d1.cluster = a.cluster AND d1.rn = 1
      |                   LEFT JOIN rq q1 ON q1.cluster = a.cluster AND q1.rn = 1
      |        WHERE a.n_members > 1)
      |SELECT count(*) AS n_clusters,
      |       CAST(sum(CASE WHEN kq IS NOT NULL AND kq <> kd
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_keeper_changed,
      |       CAST(sum(CASE WHEN kq IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_lost_quality_first,
      |       CAST(sum(CASE WHEN kdb >= 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_dq_kept,
      |       CAST(sum(CASE WHEN kq IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_qd_kept
      |FROM per""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id").as("id"), length(col("text")).as("len"))
    val buckets = TextOps.unigramDecileBuckets(s, d)
      .select(col("doc_id").as("id"), col("bucket"))
    val sized = DedupOps.persistedDocClusters(s, d)
      .join(docs, "id").join(buckets, "id")
    val per = sized.groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("len"), (-col("id")).as("nid"),
          col("bucket").as("b"))).as("am"),
        max(when(col("bucket") >= 1,
          struct(col("len"), (-col("id")).as("nid")))).as("qm"))
      .filter(col("n_members") > 1)
    per.agg(count(lit(1)).as("n_clusters"),
      sum(when(col("qm").isNotNull && col("qm.nid") =!= col("am.nid"), 1L)
        .otherwise(0L)).as("n_keeper_changed"),
      sum(when(col("qm").isNull, 1L).otherwise(0L)).as("n_lost_quality_first"),
      sum(when(col("am.b") >= 1, 1L).otherwise(0L)).as("n_dq_kept"),
      sum(when(col("qm").isNotNull, 1L).otherwise(0L)).as("n_qd_kept"))
  }

  val ops: Seq[Op] = Seq(pipelinePreprocess, pipelineFilterFunnel,
    pipelineDataCard, pipelineColumnProfile, pipelineIncrementalDelta,
    pipelineContentFingerprint, pipelineFingerprintDiff, pipelineQuarantine,
    pipelineAbAssign, pipelineDqSuite, pipelineDqSuggest, pipelineIvmDelta,
    pipelineCurationE2e, pipelineOrderSensitivity)
}
