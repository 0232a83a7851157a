package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiler for the jaccard-pairs plan (round-13, VERDICT
  * r12 item 2): times (a) the shingle fill, (b) pair explode + groupBy
  * alone, (c) the full jaccardPairs including the two sz joins — so the
  * sf10 superlinearity can be attributed to the aggregation or to the
  * post-agg joins before any plan surgery. Run:
  *   sbt -batch "runMain graft.tools.ProfileJaccard <sfDir>"
  */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val sh = graft.dedup.Dedup.shingleSets(
      graft.Tables.documents(spark, sfDir), "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("fill shingles")(sh.count())

    // Legacy (round-3..12) spelling kept as the A/B baseline: sizeless
    // pair gen + two post-agg size joins.
    val lists = sh.groupBy("s").agg(array_sort(collect_list("id")).as("ids"))
    val rawPairs = lists
      .select(explode(graft.functions.ArrayOrderedPairs(col("ids"))).as("p"))
      .select(col("p.d1"), col("p.d2"))
    time("legacy explode only (count)")(rawPairs.count())

    val agg = rawPairs.groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    time("legacy explode + groupBy(d1,d2)")(agg.count())

    val sz = sh.groupBy("id").agg(count(lit(1)).as("n"))
    time("legacy full (agg + two size joins)")(
      agg.join(sz.select(col("id").as("d1"), col("n").as("na")), Seq("d1"))
        .join(sz.select(col("id").as("d2"), col("n").as("nb")), Seq("d2"))
        .withColumn("jac", round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 6))
        .filter(col("jac") >= 0.5).count())

    time("full jaccardPairs (sized pairs + length filter)")(
      graft.dedup.Dedup.jaccardPairs(sh, 0.5).count())

    sh.unpersist()
    spark.stop()
  }
}
