package graft.archive

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Mirrors the reference's compact-command scenarios
  * (src/command/compact.rs:502-1120): complete chunks compacted, partial
  * chunks left alone, validation catches dup/gap.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("validateChunks: complete, gappy, duplicated, misaligned") {
    // chunk 0 complete; chunk 1 has a gap; chunk 2 has a duplicate height.
    val heights = (0L to 9L) ++ ((10L to 19L).filter(_ != 13L)) ++ ((20L to 29L) :+ 25L)
    val v = Compaction.validateChunks(heights.toDF("height"), "height", 10L)
      .orderBy("chunk").collect()
    assert(v.map(_.getAs[Long]("chunk")).toSeq === Seq(0L, 1L, 2L))
    assert(v.map(_.getAs[Boolean]("complete")).toSeq === Seq(true, false, false))
  }

  test("compactAndClean deletes only fully-copied source files") {
    val srcDir = Files.createTempDirectory("graft-cc-src").toString
    val outDir = Files.createTempDirectory("graft-cc-out").toString
    // one source file per 10-height bucket; chunk 1 (10..19) is partial
    val heights = ((0L to 9L) ++ (10L to 17L) ++ (20L to 29L)).toDF("height")
      .withColumn("payload", md5(col("height").cast("string")))
      .withColumn("bucket", floor(col("height") / 10).cast("long"))
    heights.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(srcDir)
    val before = spark.read.parquet(srcDir).count()
    assert(before === 28L)

    val (verdicts, deleted) = Compaction.compactAndClean(
      spark, srcDir, "height", 10L, outDir)
    assert(verdicts.filter(col("complete")).count() === 2)
    // files of buckets 0 and 2 deleted; bucket 1 (partial chunk) survives
    assert(deleted.nonEmpty)
    assert(deleted.forall(f => !f.contains("bucket=1")))
    val remaining = spark.read.parquet(srcDir)
    assert(remaining.select("height").as[Long].collect().sorted.toSeq === (10L to 17L))
    // compacted output holds exactly the complete chunks
    assert(spark.read.parquet(outDir).count() === 20L)
  }

  test("compact writes only complete chunks and keeps sources intact") {
    val out = Files.createTempDirectory("graft-compact").toString
    val heights = ((0L to 9L) ++ (10L to 17L) ++ (20L to 29L)).toDF("height")
      .withColumn("payload", md5(col("height").cast("string")))
    val verdicts = Compaction.compact(spark, heights, "height", 10L, out)
    val complete = verdicts.filter(col("complete")).select("chunk")
      .collect().map(_.getLong(0)).sorted
    assert(complete.toSeq === Seq(0L, 2L))
    val written = spark.read.parquet(out)
    assert(written.count() === 20L) // chunks 0 and 2 only; partial chunk 1 skipped
    assert(written.select("height").as[Long].collect().toSet ===
      ((0L to 9L) ++ (20L to 29L)).toSet)
    // payload survives the rewrite byte-for-byte
    val r = written.filter(col("height") === 5L).select("payload").head().getString(0)
    assert(r === heights.filter(col("height") === 5L).select("payload").head().getString(0))
  }

  test("incremental re-run preserves earlier compacted chunks (never overwrite)") {
    // Run 1 compacts chunks 0 and 2 and cleans their sources. Run 2 sees a
    // source holding ONLY the now-complete chunk 1 — the reference only
    // ever ADDS range files (compact.rs:89-106), so chunks 0/2 must
    // survive even though their sources no longer exist.
    val srcDir = Files.createTempDirectory("graft-inc-src").toString
    val outDir = Files.createTempDirectory("graft-inc-out").toString
    def writeSrc(hs: Seq[Long]): Unit =
      hs.toDF("height")
        .withColumn("payload", md5(col("height").cast("string")))
        .withColumn("bucket", floor(col("height") / 10).cast("long"))
        .repartition(col("bucket"))
        .write.mode("append").partitionBy("bucket").parquet(srcDir)

    writeSrc((0L to 9L) ++ (10L to 17L) ++ (20L to 29L))
    val (v1, deleted1) = Compaction.compactAndClean(spark, srcDir, "height", 10L, outDir)
    assert(v1.filter(col("complete")).count() === 2)
    assert(deleted1.nonEmpty)
    assert(spark.read.parquet(outDir).count() === 20L)

    // heights 18..19 arrive, completing chunk 1
    writeSrc(Seq(18L, 19L))
    val (v2, deleted2) = Compaction.compactAndClean(spark, srcDir, "height", 10L, outDir)
    assert(v2.filter(col("complete")).count() === 1) // only chunk 1 in source now
    assert(deleted2.nonEmpty)

    val out = spark.read.parquet(outDir)
    assert(out.count() === 30L) // chunks 0 and 2 SURVIVED, chunk 1 added once
    assert(out.select("height").as[Long].collect().sorted.toSeq === (0L to 29L))

    // run 3 over an emptied source: nothing new, nothing destroyed
    val (_, deleted3) = Compaction.compactAndClean(spark, srcDir, "height", 10L, outDir)
    assert(deleted3.isEmpty)
    assert(spark.read.parquet(outDir).count() === 30L)
  }
}
