package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata. The Spark-side plumbing — schema, partition-parallel batch
  * iteration, decode signature — is real; the decode itself is STUBBED
  * (no image/audio libs in this container) with a deterministic fake that
  * derives metadata from the payload bytes. A production decoder replaces
  * only the body of `decodeStub`.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, kind: Int, width: Int, height: Int,
      n_payload: Int, header_ok: Int)

  /** Attach the opaque payload column (here: the utf-8 text bytes stand in
    * for image bytes; schema-wise identical to a real media column).
    */
  def withBinaryPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(textCol).cast("binary").as("payload"))

  /** Synthesize [[ToyMedia]] containers from a document table: each text's
    * bytes wrapped in a GRFT header whose kind/dims derive from the doc id
    * (so an independent oracle can predict what a CORRECT parser must
    * recover). Every `corruptEvery`-th id gets its magic clobbered — the
    * decode stage's fallback path has to carry those rows, not drop them.
    * Runs at the decode/connector seam (mapPartitions), like the ingest
    * that would produce real media columns.
    */
  def toyMedia(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", corruptEvery: Long = 17L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val b = ToyMedia.wrap(kindFor(id), widthFor(id), heightFor(id), payload)
          if (corruptEvery > 0 && id % corruptEvery == 0) b(0) = 'X'.toByte
          (id, b)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** The deterministic header fields `toyMedia` stamps for a doc id. */
  def kindFor(id: Long): Int = (1 + id % 3).toInt
  def widthFor(id: Long): Int = (16 + (id * 37) % 624).toInt
  def heightFor(id: Long): Int = (16 + (id * 53) % 464).toInt

  /** Partition-parallel decode: one decoder instance per partition, batch
    * iteration over payloads — the Scala shape of a mapInPandas/mapInArrow
    * decode stage. The header parse is REAL ([[ToyMedia.parse]]: magic,
    * version, kind, big-endian dims, length reconciliation); only the
    * pixel/sample work behind it is absent offline. A payload that fails
    * the parse degrades to opaque-blob metadata (`header_ok = 0`, dims
    * from byte-length arithmetic) instead of erroring the batch — a
    * corrupt object at 100 TB must cost one row, not a stage retry loop.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // decoder init would happen once per partition here
        rows.map { case (id, bytes) =>
          ToyMedia.parse(bytes) match {
            case Some((kind, w, h, np)) => MediaMeta(id, kind, w, h, np, 1)
            case None =>
              val n = bytes.length
              MediaMeta(id, 0, n % 640, (n * 7) % 480, n, 0)
          }
        }
      }
  }

  /** Feature extraction stub: an 8-bucket byte histogram per payload —
    * the shape of a real embedding/feature stage (fixed-length features,
    * exploded to (doc, feature, value) rows so downstream stays columnar).
    * A real extractor replaces the bucket arithmetic with model inference
    * inside the same explode/groupBy plan.
    */
  def featureExtract(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // round-8 re-plan: the per-character explode carried the FULL payload
    // string into every exploded row (O(len²) bytes per document — the
    // scaling harness's worst non-fill slope) and diverged on empty
    // payloads (Spark sequence(1, 0) descends, DuckDB generate_series is
    // empty). The native kernel builds the whole histogram in one byte
    // loop inside the row; only (doc, bucket, count) rows ever move.
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.ByteBucketHistogram(col(textCol)).as("h"))
      .select(col("doc_id"), posexplode(col("h")).as(Seq("feature", "value")))
      .filter(col("value") > 0)
      .select(col("doc_id"), col("feature").cast("long").as("feature"),
        col("value"))

  /** Resize plan stub: aspect-preserving target dims bounded by `maxSide`
    * — metadata-only arithmetic; the pixel work happens in the decode
    * stage's partition-parallel batch.
    */
  def resizePlan(meta: DataFrame, maxSide: Int = 224): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val scaled = (c: org.apache.spark.sql.Column) =>
      when(longest <= maxSide, c)
        .otherwise(floor(c * lit(maxSide.toDouble) / longest).cast("int"))
    meta.select(col("doc_id"), col("width"), col("height"),
      scaled(col("width")).as("out_w"), scaled(col("height")).as("out_h"))
  }

  /** dHash-style perceptual fingerprint: 48 gradient-sign bits from 49
    * evenly sampled bytes of the payload (stand-in for the downscaled
    * grayscale row a real dHash compares). A native codegen expression
    * ([[graft.functions.GradientSampleHash]]) — one tight byte loop, a
    * zero-shuffle per-row projection. (The HOF spelling — aggregate over
    * a literal offset sequence of ascii(substr) probes — measured ~2 s
    * slower at sf0.1: the lambda tree re-appears in every derived
    * join-key filter and each copy is a separate interpreted eval +
    * janino compile.)
    */
  def phash(text: org.apache.spark.sql.Column, bits: Int = 48): org.apache.spark.sql.Column =
    graft.functions.GradientSampleHash(text, bits)

  /** Frame sampling plan for a "video" payload: byte offsets of `nFrames`
    * evenly spaced sample points — pure column arithmetic, explodes into a
    * distributed (doc, frame) table the decoder consumes.
    */
  def frameOffsets(media: DataFrame, nFrames: Int = 5): DataFrame = {
    val n = length(col("payload")).cast("long")
    val step = greatest(lit(1L), floor(n / nFrames).cast("long"))
    media
      // Empty payloads produce no frames. The guard matters beyond
      // semantics: Spark's sequence(0, -1, 1) THROWS where the oracle's
      // generate_series returns empty — an empty document would otherwise
      // fail the whole job (fixtures carry none; real corpora do).
      .filter(n > 0)
      .withColumn("off", explode(sequence(lit(0L), n - 1, step)))
      .withColumn("frame_no", floor(col("off") / step).cast("long"))
      .select(col("doc_id"), col("frame_no"), col("off"))
  }
}
