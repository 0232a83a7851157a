package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Job/stage-count profile of the verify-full-roundtrip composite
  * (VERDICT r13 item 8): the op's ~5 s bench minimum was justified as
  * "fixed five-command job count, no repeated subtree" — this measures
  * that claim. Builds the op's synthetic chain at N and 10N blocks,
  * runs the SAME archive→verify pipeline, and counts Spark jobs, stages
  * and tasks via a listener. If the job count scales with the file
  * count, a listing/claim phase is issuing per-file actions and should
  * be batched; if only TASKS scale (one task per shuffle partition /
  * file split), the composite is already minimal.
  *
  * Usage: sbt "runMain graft.tools.VerifyJobProfile [n1 n2 ...]"
  * (defaults 50 500). Scratch tool — not part of the driver contract.
  */
object VerifyJobProfile {
  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(50, 500)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-verify-job-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    ns.foreach { n =>
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val stages = new java.util.concurrent.atomic.AtomicInteger(0)
      val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
        }
      }
      val dir = s"/tmp/graft-verify-jobprofile-$n"
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)

      val raw = spark.range(0, n).toDF("height")
        .withColumn("blockId", sha2(col("height").cast("string"), 256))
        .withColumn("parentId", sha2((col("height") - 1).cast("string"), 256))
        .withColumn("payload", concat(
          lit("{\"hash\":\""), col("blockId"),
          lit("\",\"previousblockhash\":\""), col("parentId"),
          lit("\",\"height\":"), col("height"),
          lit(",\"tx\":[],\"time\":"), col("height"), lit("}")))
      val records = raw.select(
        lit("BITCOIN").as("blockchainType"), lit("BTC").as("blockchainId"),
        to_timestamp(lit(0)).as("archiveTimestamp"),
        col("height"), col("blockId"), col("parentId"),
        to_timestamp(col("height")).as("timestamp"),
        col("payload").cast("binary").as("json"),
        lit(0).as("unclesCount"),
        lit(null).cast("binary").as("uncle0Json"),
        lit(null).cast("binary").as("uncle1Json"))
      val canonical = raw.select(col("height"), col("blockId").as("hash"))
      canonical.count() // materialize inputs OUTSIDE the profiled window

      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      graft.sources.AvroArchiveSink.writeSingles(records, "blocks", dir,
        forkHashCol = Some("blockId"))
      val tWrite = (System.nanoTime() - t0) / 1e9
      val jWrite = jobs.get()
      val report = graft.commands.VerifyFull.run(spark, dir,
        graft.model.BitcoinAdapter, 0L, (n - 1).toLong, canonical,
        graft.commands.VerifyFull.Options(checkTxes = false))
      report.batches.collect()
      val tAll = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // listener events are async — give the bus a beat to drain
      // (scratch tool; the public API has no flush)
      Thread.sleep(1000)
      println(f"VERIFYPROFILE n=$n%5d files: jobs=${jobs.get()}%3d " +
        f"(write=$jWrite%2d verify=${jobs.get() - jWrite}%2d) " +
        f"stages=${stages.get()}%3d tasks=${tasks.get()}%5d " +
        f"wall_write=$tWrite%.2fs wall_total=$tAll%.2fs")
    }
    spark.stop()
    sys.exit(0)
  }
}
