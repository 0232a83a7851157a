package graft.archive

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Compaction: merge per-block files into aligned range files, only for
  * chunks that verify complete, then drop the fully-copied sources
  * (reference: src/command/compact.rs:44-244,343-500).
  *
  * Transactional shape: validate → write new → delete old, relying on
  * Spark's commit protocol for the write and on explicit validation before
  * any delete (compact.rs:89-106). This is the Delta-OPTIMIZE analogue
  * flagged in SURVEY.md §4.
  */
object Compaction {

  /** Per-chunk validation verdicts over a height-keyed DataFrame
    * (reference `CopiedStatus.validate`, compact.rs:246-321): count equals
    * the chunk span AND heights form one contiguous interval.
    */
  def validateChunks(df: DataFrame, heightCol: String, chunkSize: Long): DataFrame =
    df.groupBy(floor(col(heightCol) / chunkSize).cast("long").as("chunk"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col(heightCol)).as("n_distinct"),
        min(heightCol).as("mn"),
        max(heightCol).as("mx"))
      .withColumn("complete",
        col("n") === chunkSize &&
          col("n_distinct") === col("n") &&
          col("mx") - col("mn") + 1 === col("n") &&
          col("mn") === col("chunk") * chunkSize)

  /** Compact `df` into one output file per complete aligned chunk under
    * `outDir`, laid out as l1/l2 partition dirs. Incomplete chunks are NOT
    * written (sources stay authoritative). Returns the per-chunk verdicts.
    */
  def compact(
      spark: SparkSession,
      df: DataFrame,
      heightCol: String,
      chunkSize: Long,
      outDir: String): DataFrame = {
    val verdicts = validateChunks(df, heightCol, chunkSize).cache()
    val completeChunks = verdicts.filter(col("complete")).select("chunk")
    val toWrite = df
      .withColumn("chunk", floor(col(heightCol) / chunkSize).cast("long"))
      .join(broadcast(completeChunks), Seq("chunk"), "left_semi")
      .withColumn("l1", Filenames.l1(col(heightCol)))
      .withColumn("l2", Filenames.l2(col(heightCol)))
    // One file per chunk: repartition by chunk so each range file is a
    // single sorted write, like the reference's range-<s>_<e> files.
    toWrite
      .repartition(col("chunk"))
      .sortWithinPartitions(heightCol)
      .write
      .mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .partitionBy("l1", "l2")
      .parquet(outDir)
    verdicts
  }
}
