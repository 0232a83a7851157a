package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),     // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"),   // near dup of 1
    (4L, "completely different content about spark engines entirely"),
    (5L, "the quick brown fox jumps over the lazy dog today")// near dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup keeps smallest id per content group") {
    val g = Dedup.exactDupGroups(docs, "doc_id", "text").collect()
    assert(g.length === 1)
    assert(g.head.getAs[Long]("keep_id") === 1L)
    assert(g.head.getAs[Long]("n_copies") === 2L)
  }

  test("jaccard pairs find planted near-dups and skip unrelated docs") {
    val pairs = Dedup.jaccardPairs(Dedup.shingleSets(docs, "doc_id", "text"), 0.5)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.contains((1L, 2L)), "exact dup has jaccard 1.0")
    assert(pairs.forall { case (a, b) => a != 4L && b != 4L }, "unrelated doc excluded")
  }

  test("jaccardPairs matches a plain-Scala set model on seeded random corpora") {
    // the round-3 one-shuffle pair generation (collect_list + codegen pair
    // expansion) must reproduce exact set-jaccard under the same shingle
    // and df-prune rules, for arbitrary corpora
    val rnd = new scala.util.Random(23)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    for (trial <- 1 to 5) {
      val docs = (0L until (20 + rnd.nextInt(30)).toLong).map { id =>
        val n = 3 + rnd.nextInt(10)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val maxDf = 5
      // model: 3-word shingles (slice semantics incl. short-doc fallback),
      // distinct per doc, global df prune, exact jaccard
      def shinglesOf(text: String): Set[String] = {
        val ws = text.split(" ")
        val upper = math.max(1, ws.length - 2)
        (1 to upper).map(i => ws.slice(i - 1, i + 2).mkString(" ")).toSet
      }
      val byDoc = docs.map { case (id, t) => id -> shinglesOf(t) }.toMap
      val df = byDoc.values.flatten.groupBy(identity).map { case (s0, xs) => s0 -> xs.size }
      val pruned = byDoc.map { case (id, ss) => id -> ss.filter(df(_) <= maxDf) }
      val expected = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        inter = (pruned(a) intersect pruned(b)).size if inter > 0
        jac = BigDecimal(inter.toDouble / (pruned(a).size + pruned(b).size - inter))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble if jac >= 0.3
      } yield (a, b, jac)).toSet
      val got = graft.dedup.Dedup.jaccardPairs(
        graft.dedup.Dedup.shingleSets(docs.toDF("doc_id", "text"), "doc_id", "text",
          n = 3, maxDf = maxDf),
        threshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expected, s"trial $trial")
    }
  }

  test("skew-safe df prune is equivalent to the window prune") {
    val win = Dedup.shingleSets(docs, "doc_id", "text", maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val two = Dedup.shingleSets(docs, "doc_id", "text", maxDf = 3, skewSafe = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(win === two)
    assert(win.nonEmpty)
    // maxDf=3 prunes the shingles shared by 4 near-identical docs
    val dfBy = win.groupBy(_._2).view.mapValues(_.size)
    assert(dfBy.values.forall(_ <= 3))
  }

  test("minhash+LSH verified pairs equal exact jaccard pairs") {
    val sh = Dedup.shingleSets(docs, "doc_id", "text")
    val exact = Dedup.jaccardPairs(sh, 0.8)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDups(sh, 0.8)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
  }

  test("simhash: identical docs share fingerprints, distinct docs differ") {
    val fp = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash")).toMap
    assert(fp(1L) === fp(2L), "exact dups share simhash")
    assert(fp(1L) !== fp(4L), "unrelated docs differ")
  }
}
