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

  /** Decode stub over binary payloads via partition-parallel mapPartitions:
    * metadata = deterministic function of payload length.
    */
  val mmDecodeStub: Op = Op.sql(
    "mm-decode-stub",
    """SELECT doc_id,
      |       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |       CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
      |       CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val media = Multimodal.withBinaryPayload(Tables.documents(s, d), "doc_id", "text")
    Multimodal.decodeStub(s, media).toDF().orderBy("doc_id")
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
    * derived from the decode stub's metadata.
    */
  val mmResizeStub: Op = Op.sql(
    "mm-resize-stub",
    """WITH meta AS (
      |  SELECT doc_id,
      |         CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
      |         CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height
      |  FROM documents)
      |SELECT doc_id, width, height,
      |       CASE WHEN greatest(width, height) <= 224 THEN width
      |            ELSE CAST(floor(width * 224.0 / greatest(width, height)) AS INTEGER) END AS out_w,
      |       CASE WHEN greatest(width, height) <= 224 THEN height
      |            ELSE CAST(floor(height * 224.0 / greatest(width, height)) AS INTEGER) END AS out_h
      |FROM meta ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val media = Multimodal.withBinaryPayload(Tables.documents(s, d), "doc_id", "text")
    Multimodal.resizePlan(Multimodal.decodeStub(s, media).toDF())
      .orderBy("doc_id")
  }

  val ops: Seq[Op] = Seq(mmDecodeStub, mmFrameSample, mmFeatureExtract, mmResizeStub)
}
