package graft.archive

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Archive sinks (reference: src/storage/fs.rs:135-219 local Avro writer,
  * src/storage/objects.rs:170-330 S3 multipart pipe, src/notify/mod.rs).
  *
  * The hand-rolled async pipes and delete-on-drop atomicity collapse into
  * Spark's commit protocol; the S3 path is the same `df.write` against an
  * `s3a://` URI where the Hadoop S3A committer replaces the multipart pipe
  * (no S3 in this container — the code path is identical module the URI).
  */
object Sinks {

  /** Append-style archive write with codec (zstd level is the parquet
    * writer's; reference default is zstd(9), src/global.rs:34-46).
    */
  def writeArchive(df: DataFrame, path: String, codec: String = "zstd",
      overwrite: Boolean = false): Unit =
    df.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.Ignore)
      .option("compression", codec)
      .parquet(path)

  /** `create(…, overwrite=false)` → None when target exists (reference:
    * src/storage/objects.rs:46-55, fs.rs:33-39): SaveMode.Ignore is the
    * idempotent-restart write used by `stream` and `fix`.
    */
  def writeIfAbsent(df: DataFrame, path: String, codec: String = "zstd"): Unit =
    writeArchive(df, path, codec, overwrite = false)

  /** One JSON notification line per written file (reference:
    * src/notify/mod.rs:12-62 — ts, blockchain, type, run, maturity, height
    * range, location). Deterministic string build, no engine-specific JSON
    * serializer quirks.
    */
  def notificationLines(files: DataFrame, blockchain: String, run: String,
      maturity: String): DataFrame =
    files.select(concat(
      lit("{\"blockchain\":\""), lit(blockchain),
      lit("\",\"type\":\""), col("kind"),
      lit("\",\"run\":\""), lit(run),
      lit("\",\"maturity\":\""), lit(maturity),
      lit("\",\"heightStart\":"), col("start_h"),
      lit(",\"heightEnd\":"), col("end_h"),
      lit(",\"location\":\""), col("file"), lit("\"}")).as("notification"))

  /** The notification version id (reference: src/notify/mod.rs:68-70). */
  val NotificationVersion = "https://schema.emrld.io/dshackle-archive/notify"

  /** Full notification shape including `version` and `ts` (reference:
    * src/notify/mod.rs:12-46). `ts` is caller-supplied (ISO-8601) so the
    * emitted lines stay deterministic and testable.
    */
  def notificationLinesFull(files: DataFrame, blockchain: String, run: String,
      maturity: String, tsIso: String): DataFrame =
    files.select(concat(
      lit("{\"version\":\""), lit(NotificationVersion),
      lit("\",\"ts\":\""), lit(tsIso),
      lit("\",\"blockchain\":\""), lit(blockchain),
      lit("\",\"type\":\""), col("kind"),
      lit("\",\"run\":\""), lit(run),
      lit("\",\"maturity\":\""), lit(maturity),
      lit("\",\"heightStart\":"), col("start_h"),
      lit(",\"heightEnd\":"), col("end_h"),
      lit(",\"location\":\""), col("file"), lit("\"}")).as("notification"))
}
