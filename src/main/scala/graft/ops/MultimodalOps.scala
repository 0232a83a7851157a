package graft.ops

import org.apache.spark.sql.functions._
import graft.{Op, Tables}
import graft.multimodal.Multimodal

/** Multimodal-column ops (scale extensions): opaque binary payloads with
  * typed metadata. Decode is a deterministic STUB (no media libs in this
  * container) — the schema, partition-parallel batch iteration and
  * explode-based frame plan are the real Spark plumbing.
  */
object MultimodalOps {

  /** Header decode over binary payloads via partition-parallel
    * mapPartitions. The payloads are [[graft.multimodal.ToyMedia]]
    * containers (GRFT magic, version, kind, big-endian u16 dims, u32
    * length) synthesized from the fixture — the PARSE is real byte-level
    * header decoding with a corrupt-magic fallback path (every 17th doc);
    * only the pixel work behind the header is stubbed offline. The oracle
    * predicts what a correct parser must recover from arithmetic the
    * Spark side never sees as such — a mis-read endian or offset fails
    * the hash.
    */
  val mmDecodeStub: Op = Op.sql(
    "mm-decode-stub",
    """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS nt FROM documents)
      |SELECT doc_id,
      |       CAST(CASE WHEN doc_id % 17 = 0 THEN 0 ELSE 1 + doc_id % 3 END AS INTEGER) AS kind,
      |       CAST(CASE WHEN doc_id % 17 = 0 THEN (nt + 14) % 640
      |                 ELSE 16 + (doc_id * 37) % 624 END AS INTEGER) AS width,
      |       CAST(CASE WHEN doc_id % 17 = 0 THEN ((nt + 14) * 7) % 480
      |                 ELSE 16 + (doc_id * 53) % 464 END AS INTEGER) AS height,
      |       CAST(CASE WHEN doc_id % 17 = 0 THEN nt + 14 ELSE nt END AS INTEGER) AS n_payload,
      |       CAST(CASE WHEN doc_id % 17 = 0 THEN 0 ELSE 1 END AS INTEGER) AS header_ok
      |FROM d ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val media = Multimodal.toyMedia(Tables.documents(s, d))
    Multimodal.decodeStub(s, media).toDF()
      .select("doc_id", "kind", "width", "height", "n_payload", "header_ok")
      .orderBy("doc_id")
  }

  /** Frame-sampling plan: 5 evenly spaced byte offsets per payload,
    * exploded into a distributed (doc, frame) table; the sampled byte value
    * proves offset arithmetic matches.
    */
  val mmFrameSample: Op = Op.sql(
    "mm-frame-sample",
    """WITH m AS (SELECT doc_id, text, length(text)::BIGINT AS n FROM documents),
      |f AS (SELECT doc_id, text, n, greatest(1, n // 5) AS step FROM m)
      |SELECT doc_id,
      |       off // step AS frame_no, off,
      |       ascii(substr(text, CAST(off + 1 AS INTEGER), 1)) AS byte_val
      |FROM (SELECT doc_id, text, step, unnest(generate_series(0, n - 1, step)) AS off FROM f) t
      |ORDER BY doc_id, frame_no""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val media = docs.select(col("doc_id"), col("text"),
      col("text").cast("binary").as("payload"))
    Multimodal.frameOffsets(media)
      .join(docs.select("doc_id", "text"), Seq("doc_id"))
      .withColumn("byte_val", ascii(col("text").substr((col("off") + 1).cast("int"), lit(1))))
      .select("doc_id", "frame_no", "off", "byte_val")
      .orderBy("doc_id", "frame_no")
  }

  /** Feature-extraction stub: 8-bucket byte histogram per payload,
    * exploded to (doc, feature, value) rows — the columnar shape a real
    * embedding/feature stage produces.
    */
  val mmFeatureExtract: Op = Op.sql(
    "mm-feature-extract",
    """SELECT doc_id,
      |       ascii(substr(text, i, 1)) // 16 AS feature,
      |       count(*) AS value
      |FROM (SELECT doc_id, text,
      |             unnest(generate_series(1, length(text))) AS i
      |      FROM documents)
      |GROUP BY doc_id, feature
      |ORDER BY doc_id, feature""".stripMargin
  ) { (s, d) =>
    Multimodal.featureExtract(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id", "feature")
  }

  /** Resize plan stub: aspect-preserving target dims bounded by 224,
    * derived from the header-decoded metadata (corrupt payloads carry
    * their fallback dims through — the plan resizes what decode reports).
    */
  val mmResizeStub: Op = Op.sql(
    "mm-resize-stub",
    """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS nt FROM documents),
      |meta AS (
      |  SELECT doc_id,
      |         CAST(CASE WHEN doc_id % 17 = 0 THEN (nt + 14) % 640
      |                   ELSE 16 + (doc_id * 37) % 624 END AS INTEGER) AS width,
      |         CAST(CASE WHEN doc_id % 17 = 0 THEN ((nt + 14) * 7) % 480
      |                   ELSE 16 + (doc_id * 53) % 464 END AS INTEGER) AS height
      |  FROM d)
      |SELECT doc_id, width, height,
      |       CASE WHEN greatest(width, height) <= 224 THEN width
      |            ELSE CAST(floor(width * 224.0 / greatest(width, height)) AS INTEGER) END AS out_w,
      |       CASE WHEN greatest(width, height) <= 224 THEN height
      |            ELSE CAST(floor(height * 224.0 / greatest(width, height)) AS INTEGER) END AS out_h
      |FROM meta ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val media = Multimodal.toyMedia(Tables.documents(s, d))
    Multimodal.resizePlan(Multimodal.decodeStub(s, media).toDF())
      .orderBy("doc_id")
  }

  /** Perceptual-hash near-dup detection over binary payloads: a dHash-style
    * 48-bit fingerprint from 49 evenly sampled bytes (bit i = sampled
    * byte i < byte i+1 — the gradient-sign hash real image dHash computes
    * over downscaled pixels; byte sampling stands in for the decode stub),
    * then 4×12-bit band blocking (same LSH-banding shape as dedup-simhash)
    * and an exact Hamming-distance ≤ 10 verify inside candidate pairs.
    *
    * Scale shape: the fingerprint is a zero-shuffle per-row projection
    * (a native codegen expression, [[graft.functions.GradientSampleHash]]
    * — no explode/groupBy per doc); candidates come from a band-key equi-join
    * (AQE-splittable), never an all-pairs cross; the verify is a
    * projection on pair rows.
    *
    * Recall contract: 4×12-bit banding GUARANTEES a shared band only for
    * hamming ≤ 3 (pigeonhole); pairs at hamming 4–10 are found with high
    * probability but a pair whose differing bits spread across all four
    * bands is missed — the standard LSH recall/fan-out trade. Widening to
    * 8×6-bit bands would guarantee hamming ≤ 7 but shrinks band keys to 64
    * buckets, i.e. O(n²/64) candidate pairs per band at corpus scale —
    * strictly worse than re-probing with a second offset banding if recall
    * above 3 ever needs a guarantee.
    *
    * Payload contract: the fingerprint samples BYTES (the multimodal
    * column is opaque binary); both sides hash only single-byte payloads
    * (octet_length = char length) rather than assuming an ASCII fixture —
    * a multi-byte string would index different positions in the Spark
    * byte-sampler vs the character-indexed oracle.
    */
  val mmPhashDedup: Op = Op.sql(
    "mm-phash-dedup",
    """WITH m AS (SELECT doc_id, text, length(text)::BIGINT - 1 AS nm1 FROM documents
      |           WHERE length(text) = strlen(text)),
      |bits AS (
      |  SELECT doc_id, i,
      |    CASE WHEN ascii(substr(text, CAST(1 + (i * nm1) // 48 AS INTEGER), 1))
      |            < ascii(substr(text, CAST(1 + ((i + 1) * nm1) // 48 AS INTEGER), 1))
      |         THEN (2 ** i)::BIGINT ELSE 0 END AS bv
      |  FROM m, (SELECT unnest(generate_series(0, 47)) AS i) g),
      |fp AS (SELECT doc_id, CAST(sum(bv) AS BIGINT) AS phash FROM bits GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, phash, b, (phash // (2 ** (12 * b))::BIGINT) % 4096 AS bk
      |  FROM fp, (SELECT unnest(generate_series(0, 3)) AS b) gb),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, a.phash AS fp1, c.doc_id AS d2, c.phash AS fp2
      |  FROM bands a JOIN bands c ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id)
      |SELECT d1, d2, CAST(bit_count(xor(fp1, fp2)) AS INTEGER) AS hamming
      |FROM cand WHERE bit_count(xor(fp1, fp2)) <= 10
      |ORDER BY d1, d2""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
      .filter(length(col("text")) === octet_length(col("text")))
    val fp = docs.select(col("doc_id"), Multimodal.phash(col("text")).as("phash"))
    val bands = fp.select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("b"))
      .withColumn("bk",
        floor(col("phash") / pow(lit(2), col("b") * lit(12))).cast("long") % 4096)
    val cand = bands.as("a").join(bands.as("c"),
        col("a.b") === col("c.b") && col("a.bk") === col("c.bk") &&
          col("a.doc_id") < col("c.doc_id"))
      .select(col("a.doc_id").as("d1"), col("a.phash").as("fp1"),
        col("c.doc_id").as("d2"), col("c.phash").as("fp2"))
      .distinct()
    val ham = bit_count(col("fp1").bitwiseXOR(col("fp2")))
    cand.filter(ham <= 10)
      .select(col("d1"), col("d2"), ham.cast("int").as("hamming"))
      .orderBy("d1", "d2")
  }

  /** Per-modality corpus manifest over the DECODED metadata (kind 0 =
    * corrupt-header, 1..3 = image/audio/video): item count, payload byte
    * volume, min/max payload size and header-ok count — the mixed-modal
    * balance table a multimodal training run reads before fixing batch
    * composition, produced from the same mapPartitions decode seam as
    * mm-decode-stub (the manifest sees what the decoder reports, not what
    * the catalog claims).
    *
    * Scale shape: decode is partition-parallel; the manifest is one
    * groupBy with map-side combine to a ≤4-row table.
    */
  val mmModalityManifest: Op = Op.sql(
    "mm-modality-manifest",
    """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS nt FROM documents),
      |meta AS (
      |  SELECT doc_id,
      |         CAST(CASE WHEN doc_id % 17 = 0 THEN 0 ELSE 1 + doc_id % 3 END AS INTEGER) AS kind,
      |         CAST(CASE WHEN doc_id % 17 = 0 THEN nt + 14 ELSE nt END AS INTEGER) AS n_payload,
      |         CAST(CASE WHEN doc_id % 17 = 0 THEN 0 ELSE 1 END AS INTEGER) AS header_ok
      |  FROM d)
      |SELECT kind, count(*) AS n_items,
      |       CAST(sum(n_payload) AS BIGINT) AS total_bytes,
      |       CAST(min(n_payload) AS BIGINT) AS min_bytes,
      |       CAST(max(n_payload) AS BIGINT) AS max_bytes,
      |       CAST(sum(header_ok) AS BIGINT) AS n_ok
      |FROM meta GROUP BY kind ORDER BY kind""".stripMargin
  ) { (s, d) =>
    val media = Multimodal.toyMedia(Tables.documents(s, d))
    Multimodal.decodeStub(s, media).toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n_items"),
        sum("n_payload").as("total_bytes"),
        min("n_payload").cast("long").as("min_bytes"),
        max("n_payload").cast("long").as("max_bytes"),
        sum("header_ok").as("n_ok"))
      .orderBy("kind")
  }

  /** Cross-item duplicated frames: the sampled frames of mm-frame-sample,
    * each identified by a 16-byte content window at its offset, grouped
    * corpus-wide — frames appearing in ≥ 2 distinct items are shared
    * footage (the intro/outro/watermark detection a video dedup pass runs
    * on sampled frames instead of full decode). Single-byte payloads only,
    * same contract as mm-phash-dedup.
    *
    * Scale shape: frame extraction is the same row-local explode as
    * mm-frame-sample; sharedness is one 16-byte-hash-keyed groupBy with
    * map-side combine (a boilerplate frame in a billion videos is one
    * aggregated row) — frame bytes never shuffle, only their md5.
    */
  val mmFrameDedup: Op = Op.sql(
    "mm-frame-dedup",
    """WITH m AS (SELECT doc_id, text, length(text)::BIGINT AS n FROM documents
      |           WHERE length(text) = strlen(text)),
      |f AS (SELECT doc_id, text, n, greatest(1, n // 5) AS step FROM m),
      |fr AS (SELECT doc_id, md5(substr(text, CAST(off + 1 AS INTEGER), 16)) AS fh
      |       FROM (SELECT doc_id, text, step,
      |                    unnest(generate_series(0, n - 1, step)) AS off FROM f)),
      |g AS (SELECT fh, count(*) AS n_frames, count(DISTINCT doc_id) AS n_docs
      |      FROM fr GROUP BY fh)
      |SELECT fh AS frame_hash, CAST(n_docs AS BIGINT) AS n_docs,
      |       CAST(n_frames AS BIGINT) AS n_frames
      |FROM g WHERE n_docs > 1 ORDER BY frame_hash""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
      .filter(length(col("text")) === octet_length(col("text")))
    val media = docs.select(col("doc_id"), col("text"),
      col("text").cast("binary").as("payload"))
    Multimodal.frameOffsets(media)
      .join(docs.select("doc_id", "text"), Seq("doc_id"))
      .select(col("doc_id"),
        md5(col("text").substr((col("off") + 1).cast("int"), lit(16)).cast("binary"))
          .as("fh"))
      .groupBy("fh")
      .agg(count(lit(1)).as("n_frames"), countDistinct("doc_id").as("n_docs"))
      .filter(col("n_docs") > 1)
      .select(col("fh").as("frame_hash"), col("n_docs"), col("n_frames"))
      .orderBy("frame_hash")
  }

  /** Perceptual-hash calibration histogram: the hamming-distance
    * distribution over ALL band-blocked candidate pairs (mm-phash-dedup
    * keeps only ≤ 10) — the table that sets the hamming threshold: the
    * near-dup mass should separate from the random-pair hump (which
    * centers at ~24 for 48-bit fingerprints). Same fingerprint, banding
    * and candidate join as the dedup op; only the final filter differs.
    */
  val mmPhashHistogram: Op = Op.sql(
    "mm-phash-histogram",
    """WITH m AS (SELECT doc_id, text, length(text)::BIGINT - 1 AS nm1 FROM documents
      |           WHERE length(text) = strlen(text)),
      |bits AS (
      |  SELECT doc_id, i,
      |    CASE WHEN ascii(substr(text, CAST(1 + (i * nm1) // 48 AS INTEGER), 1))
      |            < ascii(substr(text, CAST(1 + ((i + 1) * nm1) // 48 AS INTEGER), 1))
      |         THEN (2 ** i)::BIGINT ELSE 0 END AS bv
      |  FROM m, (SELECT unnest(generate_series(0, 47)) AS i) g),
      |fp AS (SELECT doc_id, CAST(sum(bv) AS BIGINT) AS phash FROM bits GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, phash, b, (phash // (2 ** (12 * b))::BIGINT) % 4096 AS bk
      |  FROM fp, (SELECT unnest(generate_series(0, 3)) AS b) gb),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, a.phash AS fp1, c.doc_id AS d2, c.phash AS fp2
      |  FROM bands a JOIN bands c ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id)
      |SELECT CAST(bit_count(xor(fp1, fp2)) AS BIGINT) AS hamming,
      |       count(*) AS n_pairs
      |FROM cand GROUP BY hamming ORDER BY hamming""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
      .filter(length(col("text")) === octet_length(col("text")))
    val fp = docs.select(col("doc_id"), Multimodal.phash(col("text")).as("phash"))
    val bands = fp.select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("b"))
      .withColumn("bk",
        floor(col("phash") / pow(lit(2), col("b") * lit(12))).cast("long") % 4096)
    val cand = bands.as("a").join(bands.as("c"),
        col("a.b") === col("c.b") && col("a.bk") === col("c.bk") &&
          col("a.doc_id") < col("c.doc_id"))
      .select(col("a.doc_id").as("d1"), col("a.phash").as("fp1"),
        col("c.doc_id").as("d2"), col("c.phash").as("fp2"))
      .distinct()
    cand
      .select(bit_count(col("fp1").bitwiseXOR(col("fp2"))).cast("long").as("hamming"))
      .groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
      .orderBy("hamming")
  }

  /** Modality alignment audit — the first integrity check of any paired
    * (text, embedding) training set: a FULL OUTER join of the two id
    * spaces classifies every item as both / text_only / embedding_only.
    * The fixture ids align 1:1, so each side deterministically drops a
    * residue class (doc_id % 17, vec_id % 13 — simulating failed embed
    * jobs and deleted documents) to make all three fates populated.
    * Scale shape: one full-outer hash join on 8-byte ids + a 3-row
    * groupBy; at warehouse scale both sides pre-bucket on the id (the
    * layout-bucketed-join contract) and the join is exchange-free.
    */
  val mmAlignmentAudit: Op = Op.sql(
    "mm-alignment-audit",
    """WITH t AS (SELECT doc_id AS id FROM documents WHERE doc_id % 17 <> 0),
      |e AS (SELECT vec_id AS id FROM embeddings WHERE vec_id % 13 <> 0)
      |SELECT CASE WHEN t.id IS NOT NULL AND e.id IS NOT NULL THEN 'both'
      |            WHEN t.id IS NOT NULL THEN 'text_only'
      |            ELSE 'embedding_only' END AS status,
      |       count(*) AS n_items
      |FROM t FULL OUTER JOIN e ON t.id = e.id
      |GROUP BY status ORDER BY status""".stripMargin
  ) { (s, d) =>
    val t = Tables.documents(s, d).select(col("doc_id").as("tid"))
      .filter(col("tid") % 17 =!= 0)
    val e = Tables.embeddings(s, d).select(col("vec_id").as("eid"))
      .filter(col("eid") % 13 =!= 0)
    t.join(e, col("tid") === col("eid"), "full_outer")
      .select(when(col("tid").isNotNull && col("eid").isNotNull, "both")
        .when(col("tid").isNotNull, "text_only")
        .otherwise("embedding_only").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n_items"))
      .orderBy("status")
  }

  /** WebDataset-style shard packing plan: assign every media item to a
    * fixed-byte-budget shard (8 KiB here; 1 GiB tars in production) by
    * running byte offset within its (kind, ingest-batch) group —
    * offset-based packing, so shards are equal-byte ±1 item and the
    * assignment is a pure function of the catalog (no packer state).
    * Output is the shard manifest a tar-writer fleet consumes: items,
    * bytes, and the doc-id span per shard. Sizes come from the DECODED
    * metadata (same seam as mm-modality-manifest), so corrupt-header
    * blobs are budgeted at their real byte cost, not the catalog claim.
    *
    * Scale shape: packing is per (kind, ingest-batch of 1000 ids) —
    * every window partition is ≤ batch-sized by construction and batches
    * pack embarrassingly parallel (each writer owns its shard sequence;
    * there is NO global byte order, which is what makes this the 100-TB
    * shape — a corpus-global cumsum would serialize the fleet). The
    * manifest rollup is one map-side-combined groupBy.
    */
  val mmShardPack: Op = Op.sql(
    "mm-shard-pack",
    """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS nt FROM documents),
      |meta AS (
      |  SELECT doc_id,
      |         CAST(CASE WHEN doc_id % 17 = 0 THEN 0 ELSE 1 + doc_id % 3 END AS INTEGER) AS kind,
      |         CASE WHEN doc_id % 17 = 0 THEN nt + 14 ELSE nt END AS n_payload
      |  FROM d),
      |o AS (SELECT doc_id, kind, doc_id // 1000 AS batch, n_payload,
      |             COALESCE(sum(n_payload) OVER (
      |               PARTITION BY kind, doc_id // 1000 ORDER BY doc_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      |      FROM meta)
      |SELECT kind, CAST(batch AS BIGINT) AS batch,
      |       CAST(off // 8192 AS BIGINT) AS shard,
      |       count(*) AS n_items, CAST(sum(n_payload) AS BIGINT) AS shard_bytes,
      |       CAST(min(doc_id) AS BIGINT) AS first_doc,
      |       CAST(max(doc_id) AS BIGINT) AS last_doc
      |FROM o GROUP BY 1, 2, 3 ORDER BY kind, batch, shard""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val meta = Multimodal.decodeStub(s,
        Multimodal.toyMedia(Tables.documents(s, d))).toDF()
      .select(col("doc_id"), col("kind"), col("n_payload"))
      .withColumn("batch", expr("doc_id div 1000"))
    val w = Window.partitionBy("kind", "batch").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    meta
      .withColumn("off", coalesce(sum("n_payload").over(w), lit(0L)))
      .withColumn("shard", expr("off div 8192"))
      .groupBy("kind", "batch", "shard")
      .agg(count(lit(1)).as("n_items"),
        sum("n_payload").cast("long").as("shard_bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("kind", "batch", "shard")
  }

  val ops: Seq[Op] = Seq(mmDecodeStub, mmFrameSample, mmFeatureExtract, mmResizeStub,
    mmPhashDedup, mmModalityManifest, mmFrameDedup, mmPhashHistogram,
    mmAlignmentAudit, mmShardPack)
}
