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

  test("ShingleHashes kernel is bit-identical to builtin multi-arg xxhash64") {
    // The native kernel (graft.functions.ShingleHashes) must produce the
    // exact longs the builtin chained xxhash64 produces (seed 42,
    // null-skip), so the lambda spelling shingleHashedStructs keeps for
    // its member-sized consumer (persistedMd5Base) joins the same keys.
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick", 3L -> "the", 4L -> "", 5L -> "a a a a",
      6L -> "unicode tøkens ünd émoji")
      .toDF("id", "text")
    for (n <- Seq(2, 3, 5, 8)) {
      val ws = split(col("text"), " ")
      val lambda = transform(
        sequence(lit(1), greatest(lit(1), size(ws) - (n - 1))),
        i => xxhash64((0 until n).map(k => get(ws, i + lit(k - 1))): _*))
      val rows = docs.select(col("id"),
          TextAnalysis.shingleHashes(col("text"), n).as("kern"),
          lambda.as("lam"),
          TextAnalysis.shingleHashedStructs(col("text"), n)("s").as("structs"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) === r.getSeq[Long](2),
          s"kernel != lambda for id=${r.getLong(0)} n=$n")
        assert(r.getSeq[Long](1) === r.getSeq[Long](3),
          s"kernel != structs.s for id=${r.getLong(0)} n=$n")
      }
    }
  }
}
