package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Scratch plan dumper for the round-4 ops (not part of the driver
  * contract).
  */
object ExplainR5 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val op = args.headOption.getOrElse("mm-phash-dedup")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain-r5")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(graft.SparkEntry.queries(op)(spark, sfDir)
      .queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}
