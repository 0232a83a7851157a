package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import graft.SparkSpec

/** Property tests for the interval algebra behind interval-union /
  * interval-subtract / compaction completeness — random key sets instead
  * of the fixture's shapes, including the adversarial every-other-key
  * pattern the islands pyramid has to survive.
  */
class IntervalsPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(25)

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private def naiveIslands(ks: Seq[Long]): Seq[(Long, Long)] = {
    val sorted = ks.distinct.sorted
    sorted.foldLeft(List.empty[(Long, Long)]) {
      case ((s, e) :: rest, k) if k == e + 1 => (s, k) :: rest
      case (acc, k) => (k, k) :: acc
    }.reverse
  }

  test("islands equals a naive fold for random key sets") {
    val gen = Gen.listOf(Gen.choose(0L, 150L))
    check("islands", Prop.forAll(gen) { ks =>
      val got = Intervals.islands(ks.toDF("h"), "h", bucketSize = 10L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      (got == naiveIslands(ks)) :| s"ks=${ks.sorted} got=$got"
    })
  }

  test("islands handles the adversarial every-other-key set across bucket edges") {
    val ks = (0L to 400L by 2).toSeq
    val got = Intervals.islands(ks.toDF("h"), "h", bucketSize = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === ks.map(k => (k, k)))
  }

  test("subtract leaves exactly the set difference for random cuts") {
    val gen = for {
      ks <- Gen.nonEmptyListOf(Gen.choose(0L, 120L))
      a <- Gen.choose(0L, 120L)
      b <- Gen.choose(0L, 120L)
    } yield (ks, math.min(a, b), math.max(a, b))
    check("subtract", Prop.forAll(gen) { case (ks, cutS, cutE) =>
      val iv = Intervals.islands(ks.toDF("h"), "h", bucketSize = 10L)
      val got = Intervals.subtract(iv, cutS, cutE)
        .collect().flatMap(r => r.getLong(0) to r.getLong(1)).sorted.toSeq
      val expected = ks.distinct.sorted.filterNot(k => k >= cutS && k <= cutE)
      (got == expected) :| s"ks=${ks.sorted} cut=[$cutS,$cutE] got=$got"
    })
  }
}
