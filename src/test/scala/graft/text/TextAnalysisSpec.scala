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

  test("shingleHashes: equivalence classes match wordShingles corpus-wide") {
    // The round-14 fused kernel (multi-arg xxhash64 over the word tuple)
    // must induce the SAME equality classes as the string spelling,
    // including the short-doc degradation (size < n ⇒ one gram over the
    // available prefix, via null-skip in the hash) and repeated grams.
    val docs = Seq(
      1L -> "the quick brown fox jumps",  // normal
      2L -> "the quick brown",            // exactly n tokens
      3L -> "the quick",                  // short: one 2-token gram
      4L -> "the",                        // short: one 1-token gram
      5L -> "",                           // degenerate: one empty token
      6L -> "the quick",                  // duplicate of 3 (cross-doc class)
      7L -> "a a a a",                    // repeated gram within a doc
      8L -> "quick the")                  // order matters
      .toDF("id", "text")
    val rows = docs.select(col("id"),
        TextAnalysis.wordShingles(col("text"), 3).as("strs"),
        TextAnalysis.shingleHashes(col("text"), 3).as("hs"))
      .collect()
    val pairs = rows.flatMap { r =>
      val ss = r.getSeq[String](1); val hh = r.getSeq[Long](2)
      assert(ss.length === hh.length, s"length mismatch for id=${r.getLong(0)}")
      ss.zip(hh)
    }
    // string -> hash must be a FUNCTION (equal strings, equal hashes)
    // and injective on this corpus (distinct strings, distinct hashes).
    val byStr = pairs.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    byStr.foreach { case (s, hs) =>
      assert(hs.size === 1, s"gram '$s' mapped to ${hs.size} hashes") }
    val byHash = pairs.groupBy(_._2).view.mapValues(_.map(_._1).distinct).toMap
    byHash.foreach { case (h, ss) =>
      assert(ss.size === 1, s"hash $h collides grams ${ss.mkString("|")}") }
  }
}
