package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup

/** Scratch stage-level profiler for the minhash pipeline (not part of the
  * driver contract).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
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
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    // A/B variant: band-bucket candidates via collect_list + codegen pair
    // expansion (one shuffle) instead of the bucket self-join (two shuffle
    // sides + sort-merge) — the spelling that made jaccardPairs ~25% faster.
    def lshCandidatesPairs(signatures: org.apache.spark.sql.DataFrame,
        k: Int, r: Int): org.apache.spark.sql.DataFrame = {
      val bandKeys = (0 until k / r).map { b =>
        concat_ws("_", lit(b) +: (0 until r).map(i => col(s"mh${b * r + i}")): _*)
      }
      signatures
        .select(col("id"), explode(array(bandKeys: _*)).as("bucket"))
        .groupBy("bucket").agg(array_sort(collect_list("id")).as("ids"))
        .select(explode(graft.functions.ArrayOrderedPairs(col("ids"))).as("p"))
        .select(col("p.d1"), col("p.d2"))
        .distinct()
    }

    for (round <- 1 to 3) {
      println(s"--- round $round")
      time("shingles")(Dedup.shingleSets(docs, "doc_id", "text").count())
      val sh = Dedup.shingleSets(docs, "doc_id", "text")
      time("signatures")(Dedup.minhashSignatures(sh, 32).count())
      time("candidates-join")(Dedup.lshCandidates(Dedup.minhashSignatures(sh, 32), 32, 2).count())
      time("candidates-pairs")(lshCandidatesPairs(Dedup.minhashSignatures(sh, 32), 32, 2).count())
      time("full")(Dedup.minhashNearDups(sh, 0.8).count())
      val pairs = Dedup.minhashNearDups(sh, 0.8).select("d1", "d2")
      time("cc-on-pairs")(graft.dedup.Clusters.connectedComponents(
        docs.select(col("doc_id").as("id")), pairs).count())
      val cachedPairs = pairs.cache()
      cachedPairs.count()
      time("cc-cached-pairs")(graft.dedup.Clusters.connectedComponents(
        docs.select(col("doc_id").as("id")), cachedPairs).count())
      cachedPairs.unpersist()
      time("cluster-rep-op")(
        graft.ops.DedupOps.dedupClusterRep.build(spark, sfDir).count())
      // inline CC with per-round timing over the minhash pair subtree
      locally {
        val edges = Dedup.minhashNearDups(sh, 0.8).select("d1", "d2")
        val bidir = edges
          .select(explode(array(
            struct(col("d1").as("src"), col("d2").as("dst")),
            struct(col("d2").as("src"), col("d1").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
          .cache()
        time("cc-bidir-fill")(bidir.count())
        var labels = docs.select(col("doc_id").as("id"), col("doc_id").as("lbl"))
          .localCheckpoint()
        var sig = labels.agg(sum("lbl")).head().getLong(0)
        var it = 0
        var converged = false
        while (!converged && it < 20) {
          time(s"cc-round-$it") {
            val nbrMin = bidir.join(labels.withColumnRenamed("id", "src"), Seq("src"))
              .groupBy(col("dst").as("id"))
              .agg(min("lbl").as("nlbl"))
            labels = labels.join(nbrMin, Seq("id"), "left")
              .select(col("id"),
                least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
              .localCheckpoint()
            val newSig = labels.agg(sum("lbl")).head().getLong(0)
            converged = newSig == sig
            sig = newSig
            it += 1
            labels.count()
          }
        }
        bidir.unpersist()
      }
    }
    spark.stop()
  }
}
