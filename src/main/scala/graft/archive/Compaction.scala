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

  /** Full compact-then-clean: merge complete chunks of `srcDir` into
    * `outDir`, then delete ONLY the source files every one of whose rows
    * was fully copied (reference: write new THEN delete old, and only if
    * fully copied — src/command/compact.rs:89-106; scenario
    * `compact_partial_chunk_not_deleted`, compact.rs:502-1120). The write
    * commits (Spark commit protocol) before any delete runs. Returns
    * (verdicts, deleted file paths).
    */
  def compactAndClean(
      spark: SparkSession,
      srcDir: String,
      heightCol: String,
      chunkSize: Long,
      outDir: String): (DataFrame, Seq[String]) = {
    val src = spark.read.parquet(srcDir)
    val verdicts = compact(spark, src, heightCol, chunkSize, outDir)
    val completeChunks = verdicts.filter(col("complete")).select("chunk")
    // A source file is deletable iff ALL its rows landed in complete
    // chunks (a file may span chunks; any partial row keeps it alive).
    val perFile = src
      .withColumn("file", input_file_name())
      .withColumn("chunk", floor(col(heightCol) / chunkSize).cast("long"))
      .join(broadcast(completeChunks).withColumn("copied", lit(1)), Seq("chunk"), "left")
      .groupBy("file")
      .agg(count(lit(1)).as("n"), count("copied").as("n_copied"))
      .filter(col("n") === col("n_copied"))
    // File count is catalog-sized; drive deletion from the collected list
    // (reference deletes with a semaphore of 4, verify.rs:278).
    val deletable = perFile.collect().map(_.getAs[String]("file")).toSeq
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    deletable.foreach { f =>
      fs.delete(new org.apache.hadoop.fs.Path(new java.net.URI(f)), false)
    }
    (verdicts, deletable)
  }
}
