package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens, shingles, quality on a known sentence") {
    val df = Seq((1L, "the quick brown fox")).toDF("id", "text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.distinctTokenCount(col("text")).as("nd"),
      TextAnalysis.wordShingles(col("text"), 3).as("sh"),
      TextAnalysis.stopwordCount(col("text")).as("stop")).head()
    assert(r.getAs[Int]("n") === 4)
    assert(r.getAs[Int]("nd") === 4)
    assert(r.getSeq[String](2) === Seq("the quick brown", "quick brown fox"))
    assert(r.getAs[Int]("stop") === 1)
  }

  test("polyHash matches the reference fold") {
    def model(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % TextAnalysis.HashMod)
    val words = Seq("a", "spark", "zz", "the")
    val got = words.toDF("w")
      .select(col("w"), TextAnalysis.polyHash(col("w")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach(w => assert(got(w) === model(w), w))
  }

  test("fingerprint windows: short text falls back to one window") {
    val df = Seq((1L, "short")).toDF("id", "text")
    val fp = df.select(TextAnalysis.fingerprintWindows(col("text")).as("f")).head().getString(0)
    assert(fp.length === 32)
  }
}
