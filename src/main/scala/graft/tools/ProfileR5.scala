package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Scratch stage-level profiler for the round-4 search/dedup ops (not part
  * of the driver contract).
  */
object ProfileR5 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile-r5")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    for (round <- 1 to 3) {
      println(s"--- round $round")
      val fp = docs.select(col("doc_id"), Multimodal.phash(col("text")).as("phash"))
      time("phash-fp")(fp.count())
      val bands = fp.select(col("doc_id"), col("phash"),
          explode(sequence(lit(0), lit(3))).as("b"))
        .withColumn("bk",
          floor(col("phash") / pow(lit(2), col("b") * lit(12))).cast("long") % 4096)
      time("phash-bands")(bands.count())
      val cand = bands.as("a").join(bands.as("c"),
          col("a.b") === col("c.b") && col("a.bk") === col("c.bk") &&
            col("a.doc_id") < col("c.doc_id"))
        .select(col("a.doc_id").as("d1"), col("a.phash").as("fp1"),
          col("c.doc_id").as("d2"), col("c.phash").as("fp2"))
        .distinct()
      time("phash-cand")(cand.count())
      time("phash-op")(graft.ops.MultimodalOps.mmPhashDedup.build(spark, sfDir).count())

      val g2 = docs.select(col("doc_id"),
          explode(graft.text.TextAnalysis.wordShingles(col("text"), 2)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      time("rep-gram2")(g2.count())
      time("rep-op")(graft.ops.TextOps.textRepetition.build(spark, sfDir).count())
      time("bm25-op")(graft.ops.TextOps.textBm25Topk.build(spark, sfDir).count())
      time("rrf-op")(graft.ops.SimOps.simRrfHybrid.build(spark, sfDir).count())
      time("pipeline-op")(graft.ops.PipelineOps.pipelinePreprocess.build(spark, sfDir).count())
    }
    spark.stop()
  }
}
