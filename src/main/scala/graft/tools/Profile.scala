package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup

/** Scratch stage-level profiler for the shingle/minhash dedup pipeline
  * (not part of the driver contract). Round-5 question: does caching the
  * pruned shingle set pay for jaccardPairs / minhashNearDups under the
  * current code (the round-3 "uncached wins" measurement predates the
  * one-shuffle pair generation)?
  *
  * ROUND-13 CAVEAT: Dedup.shingleSets and Dedup.minhashNearDups now carry
  * INTERNAL persists (the hashed stream, signatures, candidates), which
  * CacheManager plan-matches across rounds of this loop — so the
  * "uncached" legs below measure cache scans from round 2 on. For honest
  * cold numbers, use interleaved single-round JVMs (the OPTIMIZATION_r13
  * A/B protocol), not this loop.
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
      println(f"STAGE $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    for (round <- 1 to 3) {
      println(s"--- round $round")
      val sh = Dedup.shingleSets(docs, "doc_id", "text", cacheHashed = true)
      time("shingles")(sh.count())
      time("signatures")(Dedup.minhashSignatures(sh, 32).count())
      time("jaccard-uncached")(Dedup.jaccardPairs(sh, 0.5).count())
      locally {
        val c = sh.cache()
        time("jaccard-cache-fill")(c.count())
        time("jaccard-cached")(Dedup.jaccardPairs(c, 0.5).count())
        c.unpersist(true)
      }
      locally {
        val t0 = System.nanoTime()
        val c = sh.localCheckpoint()
        time("jaccard-ckpt")(Dedup.jaccardPairs(c, 0.5).count())
        println(f"      (incl ckpt ${(System.nanoTime() - t0) / 1e9}%7.2f s)")
      }
      time("minhash-uncached")(Dedup.minhashNearDups(sh, 0.8).count())
      locally {
        val c = sh.cache()
        c.count()
        time("minhash-cached")(Dedup.minhashNearDups(c, 0.8).count())
        c.unpersist(true)
      }
      time("cluster-rep-op")(
        graft.ops.DedupOps.dedupClusterRep.build(spark, sfDir).count())
    }
    spark.stop()
  }
}
