package graft.ops

import scala.util.Random
import graft.SparkSpec

/** Mirrors the reference's interval-algebra tests
  * (src/archiver/range.rs:311-666, range_bag.rs:136-321): islands over any
  * key set reproduce a single-pass in-memory model; seeded random sets play
  * the property-test role (the harness resolves no scalatest+scalacheck
  * bridge offline).
  */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def model(keys: Seq[Long]): Seq[(Long, Long)] = {
    val ks = keys.distinct.sorted
    ks.foldLeft(List.empty[(Long, Long)]) {
      case ((s, e) :: rest, k) if k <= e + 1 => (s, math.max(e, k)) :: rest
      case (acc, k)                          => (k, k) :: acc
    }.reverse
  }

  test("islands match the reference model on seeded random key sets") {
    val rnd = new Random(42)
    for (trial <- 1 to 8) {
      val n = 1 + rnd.nextInt(400)
      val keys = Seq.fill(n)(rnd.nextLong(5000L).abs)
      val got = Intervals.islands(keys.toDF("k"), "k", bucketSize = 100)
        .orderBy("s").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === model(keys), s"trial $trial, n=$n")
    }
  }

  test("islands straddle bucket boundaries") {
    // 998..1002 is one island even though it crosses the 1000 bucket edge.
    val keys = Seq(998L, 999L, 1000L, 1001L, 1002L, 2000L)
    val got = Intervals.islands(keys.toDF("k"), "k", bucketSize = 1000)
      .orderBy("s").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((998L, 1002L), (2000L, 2000L)))
  }

  test("merge pyramid preserves semantics on adversarial gappy keys") {
    // every other key missing → n/2 islands that no level can merge; the
    // pyramid must pass them through unchanged (tiny buckets force many
    // bucket-edge crossings through every level)
    val keys = (0L to 4000L by 2L) ++ (10000L to 10005L)
    val expected = model(keys)
    val got = Intervals.islands(keys.toDF("k"), "k", bucketSize = 50, levels = 3)
      .orderBy("s").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("subtract yields 0, 1 or 2 remainders per interval") {
    // reference: range.rs:197-213 — cut [10,20] out of various intervals
    val iv = Seq((0L, 5L), (0L, 15L), (12L, 18L), (15L, 30L), (5L, 25L), (10L, 20L))
      .toDF("s", "e")
    val got = Intervals.subtract(iv, 10L, 20L)
      .orderBy("s", "e").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((0L, 5L), (0L, 9L), (5L, 9L), (21L, 25L), (21L, 30L)))
  }
}
