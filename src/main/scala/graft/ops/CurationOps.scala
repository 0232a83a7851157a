package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}
import graft.text.TextAnalysis

/** Corpus-curation ops: the snapshot-over-snapshot and per-source policy
  * layer of a training-data pipeline (scale extensions — no reference
  * analogue; the reference archives chain data, these cover the curation
  * decisions a data team layers on top: paragraph-grain dedup, incremental
  * dedup against prior crawl dumps, per-domain caps, dedup-threshold
  * calibration, output-shard planning).
  */
object CurationOps {

  /** Paragraph-grain content blocks: the fixture corpus is single-line, so
    * non-overlapping 10-token windows stand in for paragraphs (the unit
    * Dolma/CCNet-style pipelines dedup at). One row per block instance,
    * keyed by the block's md5 — a per-row projection + explode, no shuffle;
    * trailing partials (<10 tokens) are dropped so every hash covers the
    * same-size unit. Docs shorter than one block are filtered BEFORE the
    * `sequence` call (Spark generates descending sequences for b < a where
    * DuckDB returns empty — the guard keeps the engines aligned).
    */
  private val BlockTokens = 10
  private[ops] def blockInstances(s: SparkSession, d: String): DataFrame = {
    val b = BlockTokens
    Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= b)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), floor(size(col("ws")) / b).cast("int") - 1),
          i => md5(concat_ws(" ", slice(col("ws"), i * b + 1, lit(b)))))).as("h"))
  }

  private val BlockOracle =
    """t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |      WHERE len(string_split(text, ' ')) >= 10),
      |b AS (SELECT doc_id, md5(array_to_string(ws[i*10+1:i*10+10], ' ')) AS h
      |      FROM (SELECT doc_id, ws,
      |              unnest(generate_series(0, len(ws) // 10 - 1)) AS i FROM t))""".stripMargin

  private def microFrac(num: Column, den: Column): Column =
    round(num * lit(1000000.0) / den).cast("long") / lit(1000000.0)

  /** Within-corpus paragraph dedup report: per document, how many of its
    * content blocks also appear (byte-identical) in at least one OTHER
    * document, and the duplicated fraction — the signal a pipeline uses to
    * scrub boilerplate paragraphs without dropping whole documents
    * (complements dedup-substring-spans, which works at overlapping 8-gram
    * grain and reports positions; this is the cheap fixed-block variant).
    *
    * Scale shape: sharedness is a groupBy of the DISTINCT (doc, hash) set
    * (map-side combine — a boilerplate block in a billion docs is one
    * aggregated row); the flag join back is hash-keyed (AQE-skew-
    * splittable) and the final agg is doc-grained. Block hashes are the
    * only shuffled payload (16 bytes, never gram strings).
    */
  val dedupParagraph: Op = Op.sql(
    "dedup-paragraph",
    s"""WITH $BlockOracle,
       |sh AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM b)
       |       GROUP BY h HAVING count(*) > 1),
       |per AS (SELECT b.doc_id, count(*) AS n_blocks,
       |               CAST(sum(CASE WHEN sh.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |                 AS n_dup_blocks
       |        FROM b LEFT JOIN sh ON b.h = sh.h GROUP BY b.doc_id)
       |SELECT doc_id, n_blocks, n_dup_blocks,
       |       CAST(round(n_dup_blocks * 1000000.0 / n_blocks) AS BIGINT) / 1000000.0
       |         AS dup_frac
       |FROM per ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val inst = blockInstances(s, d)
    val shared = inst.distinct()
      .groupBy("h").agg(count(lit(1)).as("nd"))
      .filter(col("nd") > 1)
      .select(col("h"), lit(1).as("dup"))
    inst.join(shared, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(coalesce(col("dup"), lit(0))).as("n_dup_blocks"))
      .select(col("doc_id"), col("n_blocks"), col("n_dup_blocks"),
        microFrac(col("n_dup_blocks"), col("n_blocks")).as("dup_frac"))
      .orderBy("doc_id")
  }

  /** Incremental dedup against a prior snapshot: the corpus splits into an
    * "already shipped" snapshot (doc_id % 10 < 8 — the stand-in for last
    * month's crawl) and a new delta; every NEW document reports how many of
    * its content blocks were already present anywhere in the old snapshot,
    * plus the drop verdict at the 50% overlap policy. This is the
    * crawl-over-crawl dedup pass (new dumps re-serve most of the old web)
    * — exact doc-hash incremental matching is a degenerate subset of it.
    *
    * Scale shape: the old-snapshot hash set is a DISTINCT projection (at
    * 100 TB it would be a persisted side table maintained across runs, or
    * a bloom filter pre-screen before the exact join — the join here IS
    * the exact tier); the new-side probe is a hash-keyed left join sized
    * by the delta, not the archive. Neither side ever holds gram strings —
    * 16-byte hashes only.
    */
  val dedupIncremental: Op = Op.sql(
    "dedup-incremental",
    s"""WITH $BlockOracle,
       |oldh AS (SELECT DISTINCT h FROM b WHERE doc_id % 10 < 8),
       |newb AS (SELECT doc_id, h FROM b WHERE doc_id % 10 >= 8),
       |per AS (SELECT n.doc_id, count(*) AS n_blocks,
       |               CAST(sum(CASE WHEN o.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |                 AS n_seen
       |        FROM newb n LEFT JOIN oldh o ON n.h = o.h GROUP BY n.doc_id)
       |SELECT doc_id, n_blocks, n_seen,
       |       CAST(round(n_seen * 1000000.0 / n_blocks) AS BIGINT) / 1000000.0
       |         AS seen_frac,
       |       (n_seen * 2 >= n_blocks) AS drop_doc
       |FROM per ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val inst = blockInstances(s, d)
    val oldh = inst.filter(col("doc_id") % 10 < 8)
      .select(col("h")).distinct()
      .select(col("h"), lit(1).as("seen"))
    inst.filter(col("doc_id") % 10 >= 8)
      .join(oldh, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(coalesce(col("seen"), lit(0))).as("n_seen"))
      .select(col("doc_id"), col("n_blocks"), col("n_seen"),
        microFrac(col("n_seen"), col("n_blocks")).as("seen_frac"),
        (col("n_seen") * 2 >= col("n_blocks")).as("drop_doc"))
      .orderBy("doc_id")
  }

  /** Bloom-filter pre-screen for incremental dedup — the cheap first tier
    * in front of [[dedupIncremental]]'s exact hash join: the old snapshot's
    * blocks fill a bloom filter (k=3 independent polynomial folds — the
    * portable hash family of [[graft.text.TextAnalysis.polyHash]], three
    * multiplier/modulus pairs), and every NEW document reports its
    * bloom-positive block count next to the exact membership count, so the
    * false-positive overhead of the screen is directly observable
    * (n_bloom_hits ≥ n_true_hits always; the gap is what the exact tier
    * re-checks for nothing).
    *
    * Scale shape: the filter is ~1M positions here (≥10 bits/element at
    * bench SF). The relational spelling — a DISTINCT position table probed
    * by a hash-keyed join — is the oracle-exact form; a production run
    * compiles the same positions into a broadcast bitmap (Spark's own
    * bloom-join machinery, or a codegen Expression over a bit array) so
    * the probe costs zero shuffle. Either way the build side is one
    * map-side-combined DISTINCT over the OLD snapshot, and the probe is
    * sized by the new delta.
    */
  val dedupBloomScreen: Op = Op.sql(
    "dedup-bloom-screen",
    s"""WITH $BlockOracle,
       |bs AS (SELECT doc_id, array_to_string(ws[i*10+1:i*10+10], ' ') AS b
       |       FROM (SELECT doc_id, ws,
       |               unnest(generate_series(0, len(ws) // 10 - 1)) AS i FROM t)),
       |hs AS (SELECT doc_id, b,
       |         list_reduce(list_prepend(0::BIGINT,
       |           [ascii(substr(b, i, 1))::BIGINT FOR i IN generate_series(1, length(b))]),
       |           (a, x) -> (a * 31 + x) % 1000003) AS h1,
       |         list_reduce(list_prepend(0::BIGINT,
       |           [ascii(substr(b, i, 1))::BIGINT FOR i IN generate_series(1, length(b))]),
       |           (a, x) -> (a * 37 + x) % 999983) AS h2,
       |         list_reduce(list_prepend(0::BIGINT,
       |           [ascii(substr(b, i, 1))::BIGINT FOR i IN generate_series(1, length(b))]),
       |           (a, x) -> (a * 41 + x) % 999979) AS h3
       |       FROM bs),
       |bits AS (SELECT DISTINCT pos FROM
       |           (SELECT unnest([h1, h2, h3]) AS pos FROM hs WHERE doc_id % 10 < 8)),
       |oldb AS (SELECT DISTINCT b FROM bs WHERE doc_id % 10 < 8),
       |np AS (SELECT doc_id, b, h1, h2, h3,
       |              row_number() OVER (ORDER BY doc_id, h1, h2, h3) AS inst
       |       FROM hs WHERE doc_id % 10 >= 8),
       |probe AS (SELECT n.doc_id, n.inst, n.b, count(bits.pos) AS n_set
       |          FROM (SELECT doc_id, inst, b, unnest([h1, h2, h3]) AS pos FROM np) n
       |          LEFT JOIN bits ON n.pos = bits.pos
       |          GROUP BY n.doc_id, n.inst, n.b)
       |SELECT p.doc_id, count(*) AS n_blocks,
       |       CAST(sum(CASE WHEN p.n_set = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
       |       CAST(sum(CASE WHEN oldb.b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_true_hits
       |FROM probe p LEFT JOIN oldb ON p.b = oldb.b
       |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin
  ) { (s, d) =>
    val b = BlockTokens
    val bs = Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= b)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), floor(size(col("ws")) / b).cast("int") - 1),
          i => concat_ws(" ", slice(col("ws"), i * b + 1, lit(b))))))
      .select(col("doc_id"), col("pos").as("blk"), col("col").as("b"))
    val hs = bs.select(col("doc_id"), col("blk"), col("b"),
      graft.functions.BloomFolds(col("b")).as("hv"))
    val bits = hs.filter(col("doc_id") % 10 < 8)
      .select(explode(col("hv")).as("pos"))
      .distinct()
      .select(col("pos"), lit(1).as("set"))
    val oldb = hs.filter(col("doc_id") % 10 < 8)
      .select(col("b")).distinct()
      .select(col("b"), lit(1).as("seen"))
    val probe = hs.filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), col("blk"), col("b"), explode(col("hv")).as("pos"))
      .join(bits, Seq("pos"), "left")
      .groupBy("doc_id", "blk", "b")
      .agg(sum(coalesce(col("set"), lit(0))).as("n_set"))
    probe.join(oldb, Seq("b"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("n_set") === 3, 1).otherwise(0)).as("n_bloom_hits"),
        sum(coalesce(col("seen"), lit(0))).as("n_true_hits"))
      .orderBy("doc_id")
  }

  /** Per-source document cap (the FineWeb-style anti-spam policy: no
    * domain may contribute more than K documents, keep the best): top-10
    * per source by length (the cheap quality proxy), ties to the lowest
    * doc_id, with the within-source rank.
    *
    * Scale shape: the cap runs through the shared salted two-phase top-k
    * ([[graft.functions.TopK]]) — a spam domain with a billion pages never
    * funnels one window task; phase 2 sees ≤ k·salts rows per source. The
    * rank window afterwards runs on the CAPPED table (≤ k rows per source
    * — configuration-sized, not data-sized).
    */
  val textCapPerSource: Op = Op.sql(
    "text-cap-per-source",
    """SELECT source, doc_id, n_chars, rn FROM (
      |  SELECT source, doc_id, n_chars,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY n_chars DESC, doc_id) AS rn
      |  FROM documents) t
      |WHERE rn <= 10 ORDER BY source, rn""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val capped = graft.functions.TopK.topkPerGroup(
      Tables.documents(s, d).select(col("source"), col("doc_id"), col("n_chars")),
      groupCols = Seq("source"),
      orderCols = Seq(col("n_chars").desc, col("doc_id").asc),
      k = 10)
    capped
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))))
      .orderBy("source", "rn")
  }

  /** Dedup-threshold calibration: the pair-count / docs-affected curve
    * over candidate cosine thresholds — the table a team reads before
    * committing to a SemDeDup epsilon (how much of the corpus does each
    * threshold touch?). One scored pair table feeds every threshold row
    * via an explode (never N re-executions of the pair subtree — the
    * one-aggregated-DF rule), and thresholds are integer milli-units so
    * the group key is hash-exact.
    *
    * Scale shape: the pair table is label-blocked (the same bounded
    * blocking as dedup-embedding-cosine); the sweep multiplies it by a
    * constant 8, and the per-threshold agg has map-side combine. n_pairs
    * is derived from the endpoint explode (count/2 — exact, every pair
    * contributes exactly two endpoint rows).
    */
  val dedupThresholdSweep: Op = Op.sql(
    "dedup-threshold-sweep",
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |p AS (SELECT a.vec_id AS d1, b.vec_id AS d2,
      |             round(list_dot_product(a.v, b.v) /
      |                   (sqrt(list_dot_product(a.v, a.v)) *
      |                    sqrt(list_dot_product(b.v, b.v))), 6) AS sim
      |      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
      |thr AS (SELECT CAST(unnest([200, 300, 350, 400, 500, 600, 700, 800]) AS BIGINT)
      |               AS thr_milli),
      |ep AS (SELECT thr.thr_milli, sim, unnest([d1, d2]) AS dd FROM p, thr)
      |SELECT thr_milli,
      |       CAST(sum(CASE WHEN sim >= thr_milli / 1000.0 THEN 1 ELSE 0 END) / 2
      |            AS BIGINT) AS n_pairs,
      |       CAST(count(DISTINCT CASE WHEN sim >= thr_milli / 1000.0 THEN dd END)
      |            AS BIGINT) AS n_docs
      |FROM ep GROUP BY thr_milli ORDER BY thr_milli""".stripMargin
  ) { (s, d) =>
    val thresholds = Seq(200, 300, 350, 400, 500, 600, 700, 800)
    val pairs = graft.sim.Similarity.nearDupPairs(Tables.embeddings(s, d), "label", 0.2)
    val hit = col("sim") >= col("thr_milli").cast("double") / lit(1000.0)
    pairs
      .select(explode(array(thresholds.map(t => lit(t.toLong)): _*)).as("thr_milli"),
        col("d1"), col("d2"), col("sim"))
      .select(col("thr_milli"), hit.as("hit"),
        explode(array(col("d1"), col("d2"))).as("dd"))
      .groupBy("thr_milli")
      .agg((sum(when(col("hit"), 1).otherwise(0)) / 2).cast("long").as("n_pairs"),
        countDistinct(when(col("hit"), col("dd"))).as("n_docs"))
      .orderBy("thr_milli")
  }

  /** Output-shard planning: deterministic hash-sharding of the corpus into
    * 8 training shards with the balance report (docs, tokens, load factor
    * vs perfect balance per shard) — the table that decides whether the
    * shard count needs a bump before the expensive materialization runs.
    * Modulo-on-id stands in for the portable id hash; at 100 TB sharding
    * is exactly this one projection + a shard-count-sized agg, and the
    * balance check costs one broadcast of an 8-row total.
    */
  val textShardBalance: Op = Op.sql(
    "text-shard-balance",
    """WITH t AS (SELECT doc_id % 8 AS shard,
      |                  len(string_split(text, ' ')) AS nt FROM documents),
      |per AS (SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
      |               CAST(sum(nt) AS BIGINT) AS n_tokens FROM t GROUP BY shard),
      |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM per)
      |SELECT shard, n_docs, n_tokens,
      |       CAST(round(n_tokens * 8000000.0 / tot) AS BIGINT) / 1000000.0
      |         AS load_factor
      |FROM per, tot ORDER BY shard""".stripMargin
  ) { (s, d) =>
    val per = Tables.documents(s, d)
      .select((col("doc_id") % 8).as("shard"),
        TextAnalysis.tokenCount(col("text")).as("nt"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
    val tot = per.agg(sum("n_tokens").as("tot"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        (round(col("n_tokens") * lit(8000000.0) / col("tot")).cast("long") /
          lit(1000000.0)).as("load_factor"))
      .orderBy("shard")
  }

  /** Boilerplate removal with document reassembly — the step AFTER
    * [[dedupParagraph]]'s report: every content block shared by ≥2
    * documents (byte-identical 10-token window, the nav-bar/footer/cookie-
    * banner signature) is stripped, and each document's clean text is
    * rebuilt from its surviving blocks plus the unhashed trailing partial
    * (CCNet/Dolma-style paragraph scrubbing that keeps the document
    * instead of dropping it).
    *
    * Scale shape: the ONLY shuffled payloads are 16-byte block hashes and
    * per-doc dropped-position int sets — document text never shuffles.
    * Sharedness is one groupBy(h) with min/max(doc_id) and map-side
    * combine (min≠max ⟺ ≥2 docs — a boilerplate block in a billion docs
    * is one aggregated row); dropped positions come back doc-keyed as a
    * tiny int array; reassembly is a row-local projection on the original
    * scan (slice/filter/flatten over the token array — per-row HOFs at the
    * final projection, not in any shuffle path). A same-block repeated
    * WITHIN one doc only is kept (min=max) — within-doc repetition is
    * text-repetition's business, not boilerplate.
    */
  val textBoilerplateStrip: Op = Op.sql(
    "text-boilerplate-strip",
    """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
      |b AS (SELECT doc_id, i, ws[i*10+1:i*10+10] AS blk,
      |             md5(array_to_string(ws[i*10+1:i*10+10], ' ')) AS h
      |      FROM (SELECT doc_id, ws, unnest(generate_series(0, len(ws) // 10 - 1)) AS i
      |            FROM t WHERE len(ws) >= 10)),
      |sh AS (SELECT h FROM b GROUP BY h HAVING min(doc_id) <> max(doc_id)),
      |agg AS (SELECT b.doc_id, count(*) AS n_blocks,
      |               CAST(sum(CASE WHEN sh.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |                 AS n_dropped,
      |               coalesce(flatten(list(blk ORDER BY i) FILTER (WHERE sh.h IS NULL)),
      |                        []) AS kept
      |        FROM b LEFT JOIN sh ON b.h = sh.h GROUP BY b.doc_id)
      |SELECT t.doc_id,
      |       CAST(coalesce(a.n_blocks, 0) AS BIGINT) AS n_blocks,
      |       CAST(coalesce(a.n_dropped, 0) AS BIGINT) AS n_dropped,
      |       CASE WHEN a.doc_id IS NULL THEN t.text
      |            ELSE coalesce(array_to_string(
      |                   list_concat(a.kept, t.ws[len(t.ws) // 10 * 10 + 1:len(t.ws)]), ' '),
      |                 '')
      |       END AS clean_text
      |FROM t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id""".stripMargin
  ) { (s, d) =>
    val b = BlockTokens
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), TextAnalysis.tokens(col("text")).as("ws"))
    val inst = docs.filter(size(col("ws")) >= b)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), (size(col("ws")) / b).cast("int") - 1),
        i => md5(concat_ws(" ", slice(col("ws"), i * b + 1, lit(b)))))))
      .select(col("doc_id"), col("pos"), col("col").as("h"))
    val shared = inst.groupBy("h")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select("h")
    val dropped = inst.join(shared, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(collect_set("pos").as("drp"))
    val nb = (size(col("ws")) / b).cast("int")
    val drpSafe = coalesce(col("drp"), array().cast("array<int>"))
    docs.join(dropped, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(size(col("ws")) >= b, nb.cast("long")).otherwise(lit(0L)).as("n_blocks"),
        coalesce(size(col("drp")).cast("long"), lit(0L)).as("n_dropped"),
        when(size(col("ws")) < b, col("text")).otherwise(
          array_join(concat(
            flatten(transform(
              filter(sequence(lit(0), nb - 1),
                i => !array_contains(drpSafe, i)),
              i => slice(col("ws"), i * b + 1, lit(b)))),
            slice(col("ws"), nb * b + 1, size(col("ws")) - nb * b)), " "))
          .as("clean_text"))
      .orderBy("doc_id")
  }

  /** Reproducibility manifest per training shard (the doc_id % 8 sharding
    * of [[textShardBalance]]): document count, byte volume, and an
    * ORDER-FREE content checksum — bit_xor of each document's md5-derived
    * 60-bit content hash. XOR is commutative/associative and can't
    * overflow, so the checksum is identical however partitions combine,
    * and two independently-produced copies of a shard can be compared
    * without sorting anything — the "did the rerun produce byte-identical
    * data" gate a reproducible pipeline signs its outputs with.
    *
    * Scale shape: one groupBy with map-side combine over per-row
    * projections; the manifest is shards-sized.
    */
  val textShardManifest: Op = Op.sql(
    "text-shard-manifest",
    """WITH t AS (
      |  SELECT doc_id % 8 AS shard, n_chars,
      |         list_reduce([CAST(strpos('0123456789abcdef', x) - 1 AS BIGINT)
      |                      FOR x IN [substr(md5(text), i, 1)
      |                                FOR i IN generate_series(1, 15)]],
      |                     (a, x) -> a * 16 + x) AS h
      |  FROM documents)
      |SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS bytes,
      |       bit_xor(h) AS checksum
      |FROM t GROUP BY shard ORDER BY shard""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .select((col("doc_id") % 8).as("shard"), col("n_chars"),
        conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("bytes"),
        expr("bit_xor(h)").as("checksum"))
      .orderBy("shard")
  }

  /** Cross-source duplication matrix at content-block grain: for every
    * ordered source pair, how many of source A's distinct 10-token blocks
    * also appear in source B — the mix diagnostic that says which sources
    * re-serve each other's content (mirrors, scrapes, syndication) before
    * mixture weights get fit on double-counted mass. Block grain, not
    * whole-document hashes, because real cross-source duplication is
    * partial (same article, different chrome).
    *
    * Scale shape: the DISTINCT (block-hash, source) table reduces with
    * map-side combine; the self-join keys on the 16-byte block hash,
    * whose fan-out is bounded per hash by the source count (catalog-
    * sized, not corpus-sized); the matrix is sources²-sized and the
    * per-source totals broadcast.
    */
  val dedupSourceOverlap: Op = Op.sql(
    "dedup-source-overlap",
    s"""WITH $BlockOracle,
       |hs AS (SELECT DISTINCT b.h, d.source
       |       FROM b JOIN documents d USING (doc_id)),
       |m AS (SELECT a.source AS source_a, c.source AS source_b, count(*) AS n_shared
       |      FROM hs a JOIN hs c ON a.h = c.h AND a.source <> c.source
       |      GROUP BY 1, 2),
       |tot AS (SELECT source AS source_a, count(*) AS n_blocks FROM hs GROUP BY 1)
       |SELECT m.source_a, m.source_b, m.n_shared, tot.n_blocks,
       |       CAST(round(m.n_shared * 1000000.0 / tot.n_blocks) AS BIGINT) / 1000000.0
       |         AS shared_frac
       |FROM m JOIN tot USING (source_a)
       |ORDER BY source_a, source_b""".stripMargin
  ) { (s, d) =>
    // hs feeds BOTH self-join sides and the totals — persist the reduced
    // (hash, source) set (block-hash × source sized) so the corpus-scale
    // decompose+join+DISTINCT subtree runs once, not three times (the
    // persistedJaccardPairs discipline).
    val hs = blockInstances(s, d)
      .join(Tables.documents(s, d).select("doc_id", "source"), Seq("doc_id"))
      .select(col("h"), col("source")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = hs.select(col("h"), col("source").as("source_a"))
      .join(hs.select(col("h"), col("source").as("source_b")), Seq("h"))
      .filter(col("source_a") =!= col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
    val tot = hs.groupBy(col("source").as("source_a"))
      .agg(count(lit(1)).as("n_blocks"))
    m.join(broadcast(tot), Seq("source_a"))
      .select(col("source_a"), col("source_b"), col("n_shared"), col("n_blocks"),
        (round(col("n_shared") * lit(1000000.0) / col("n_blocks")).cast("long") /
          lit(1000000.0)).as("shared_frac"))
      .orderBy("source_a", "source_b")
  }

  /** k-anonymity audit over quasi-identifiers — the privacy compliance
    * check a training corpus runs next to PII scrubbing
    * (text-pii-scrub): treat (lang, source, 500-char size band) as a
    * quasi-identifier tuple and count documents whose tuple group is
    * smaller than k=5 — those are re-identifiable through metadata alone
    * even with the text scrubbed. One map-side-combined groupBy to the
    * quasi-id grain (bounded by the id-space cross product, not corpus
    * size), then a per-lang fold of the group table. Pure integers.
    */
  val textKAnonymity: Op = Op.sql(
    "text-k-anonymity",
    """WITH q AS (SELECT lang, source, n_chars // 500 AS size_band,
      |                  count(*) AS k
      |           FROM documents GROUP BY lang, source, size_band)
      |SELECT lang, count(*) AS n_groups,
      |       CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT) AS risky_groups,
      |       CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS risky_docs,
      |       CAST(sum(k) AS BIGINT) AS n_docs
      |FROM q GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("lang"), col("source"), expr("n_chars div 500").as("size_band"))
      .agg(count(lit(1)).as("k"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("k") < 5, 1L).otherwise(0L)).as("risky_groups"),
        sum(when(col("k") < 5, col("k")).otherwise(0L)).as("risky_docs"),
        sum("k").as("n_docs"))
      .orderBy("lang")
  }

  /** l-diversity audit — k-anonymity's required companion
    * (Machanavajjhala et al. 2007): a quasi-identifier group can be large
    * (k-anonymous) yet expose its members anyway when the SENSITIVE
    * attribute is near-constant inside it (homogeneity attack). Here the
    * quasi-id is (source, 500-char size band) and the sensitive attribute
    * is `lang`: groups carrying fewer than l = 3 distinct languages leak
    * their members' language through metadata alone. Same scale shape as
    * text-k-anonymity — one groupBy to the quasi-id grain (the
    * countDistinct is over a bounded code set, so partial aggregation
    * holds), one fold to the sources-sized report.
    */
  val textLDiversity: Op = Op.sql(
    "text-l-diversity",
    """WITH q AS (SELECT source, n_chars // 500 AS size_band,
      |                  count(DISTINCT lang) AS l, count(*) AS k
      |           FROM documents GROUP BY source, size_band)
      |SELECT source, count(*) AS n_groups,
      |       CAST(min(l) AS BIGINT) AS min_l,
      |       CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS weak_groups,
      |       CAST(sum(CASE WHEN l < 3 THEN k ELSE 0 END) AS BIGINT)
      |         AS weak_docs
      |FROM q GROUP BY source ORDER BY source""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("source"), expr("n_chars div 500").as("size_band"))
      .agg(countDistinct("lang").as("l"), count(lit(1)).as("k"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_groups"),
        min("l").as("min_l"),
        sum(when(col("l") < 3, 1L).otherwise(0L)).as("weak_groups"),
        sum(when(col("l") < 3, col("k")).otherwise(0L)).as("weak_docs"))
      .orderBy("source")
  }

  /** Canonical-form dedup tiers from ONE scan: how many duplicate groups
    * exist under (a) EXACT text equality, (b) the sorted word BAG
    * (order-insensitive — catches shuffled/reordered copies), and (c) the
    * 50-word PREFIX (head-truncation dup — the same doc cut short). Real
    * curation runs exactly this ladder before choosing its canonical key:
    * each tier's extra dupes over `exact` price what that normalization
    * would additionally collapse. Every tier key explodes from the SAME
    * tokenized row (one scan, one exchange — never three dedup passes).
    *
    * Scale shape: one 3-struct explode → one map-side-combined groupBy on
    * (tier, md5 key) → a tier-grained rollup; group rows are bounded by
    * the corpus, output by 3 rows.
    */
  val dedupCanonicalTiers: Op = Op.sql(
    "dedup-canonical-tiers",
    """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ws
      |           FROM documents),
      |keys AS (
      |  SELECT 'exact' AS tier, md5(text) AS k FROM t
      |  UNION ALL
      |  SELECT 'bag', md5(array_to_string(list_sort(ws), ' ')) FROM t
      |  UNION ALL
      |  SELECT 'prefix50', md5(array_to_string(ws[1:50], ' ')) FROM t),
      |g AS (SELECT tier, k, count(*) AS n FROM keys GROUP BY tier, k)
      |SELECT tier, CAST(sum(n) AS BIGINT) AS n_docs,
      |       count(*) AS n_groups,
      |       CAST(sum(n) - count(*) AS BIGINT) AS n_dup_docs,
      |       CAST(max(n) AS BIGINT) AS max_group
      |FROM g GROUP BY tier ORDER BY tier""".stripMargin
  ) { (s, d) =>
    val keys = Tables.documents(s, d)
      .select(col("text"), split(col("text"), " ").as("ws"))
      .select(explode(array(
        struct(lit("exact").as("tier"), md5(col("text")).as("k")),
        struct(lit("bag").as("tier"),
          md5(concat_ws(" ", array_sort(col("ws")))).as("k")),
        struct(lit("prefix50").as("tier"),
          md5(concat_ws(" ", slice(col("ws"), 1, 50))).as("k")))).as("tk"))
      .select(col("tk.tier").as("tier"), col("tk.k").as("k"))
    keys.groupBy("tier", "k").agg(count(lit(1)).as("n"))
      .groupBy("tier")
      .agg(sum("n").cast("long").as("n_docs"),
        count(lit(1)).as("n_groups"),
        (sum("n") - count(lit(1))).cast("long").as("n_dup_docs"),
        max("n").cast("long").as("max_group"))
      .orderBy("tier")
  }

  val ops: Seq[Op] = Seq(dedupParagraph, dedupIncremental, dedupBloomScreen,
    textCapPerSource, dedupThresholdSweep, textShardBalance, textBoilerplateStrip,
    textShardManifest, dedupSourceOverlap, textKAnonymity, textLDiversity,
    dedupCanonicalTiers)
}
