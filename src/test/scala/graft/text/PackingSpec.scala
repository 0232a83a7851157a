package graft.text

import graft.SparkSpec

/** Packing contract: concat-then-chunk per shard, pack = first token's
  * chunk, independent of physical partitioning.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packs fill to the budget and straddling docs take their first token's pack") {
    // one shard (ids all ≡ 0 mod 1): docs of 3/4/5 tokens, budget 6:
    //   d0 tokens [0,3) → pack 0, offset 0
    //   d1 tokens [3,7) → pack 0, offset 3  (straddles into pack 1)
    //   d2 tokens [7,12) → pack 1, offset 1
    val docs = Seq(
      (0L, "a b c"), (1L, "a b c d"), (2L, "a b c d e")).toDF("doc_id", "text")
    val got = Packing.packSequences(docs, "doc_id", "text", budget = 6L, shards = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq((0L, 0L, 0L), (1L, 0L, 3L), (2L, 1L, 1L)))
  }

  test("assignment is deterministic under repartitioning and shards spread docs") {
    val docs = (0L to 199L).map(h => (h, ("w " * (1 + (h % 17).toInt)).trim))
      .toDF("doc_id", "text")
    def runOn(parts: Int) =
      Packing.packSequences(docs.repartition(parts), "doc_id", "text",
        budget = 32L, shards = 4)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))).toSeq
    val a = runOn(1)
    val b = runOn(13)
    assert(a === b)
    assert(a.map(_._2).distinct.sorted === Seq(0L, 1L, 2L, 3L))
  }
}
