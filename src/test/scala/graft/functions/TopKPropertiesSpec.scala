package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSpec

/** Property check for the shared salted two-phase top-k — the helper a
  * dozen registered ops rank through. The claim that must hold for the
  * salting to be EXACT (not approximate): for any dataset, any group
  * structure and any k, the two-phase result equals the naive global
  * sort-and-take per group. Runs fewer, bigger random cases than a pure
  * kernel property (each case spins Spark jobs).
  */
class TopKPropertiesSpec extends SparkSpec {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(12)

  test("salted two-phase top-k equals the naive per-group top-k") {
    import spark.implicits._
    val genRows = for {
      n <- Gen.choose(1, 400)
      nGroups <- Gen.choose(1, 6)
      k <- Gen.choose(1, 5)
      salts <- Gen.oneOf(2, 7, 64)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, nGroups - 1)
        v <- Gen.choose(-1000L, 1000L)
        id <- Gen.choose(0L, 10000L)
      } yield (g, v, id))
    } yield (rows, k, salts)
    val prop = Prop.forAll(genRows) { case (rows, k, salts) =>
      val df = rows.toDF("g", "v", "id")
      val got = TopK.topkPerGroup(df, Seq("g"),
          Seq(col("v").desc, col("id"), col("g")), k, salts)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.toSeq).toMap
      val want = rows.groupBy(_._1).view.mapValues(
        _.sortBy { case (_, v, id) => (-v, id) }.take(k)).toMap
      // MULTISET compare (sorted Seq, no dedup): a regression that loses
      // one copy of a duplicated boundary row must fail
      got.keySet == want.keySet && got.forall { case (g, s) =>
        s.map(t => (t._2, t._3)).sorted ==
          want(g).map(t => (t._2, t._3)).sorted
      }
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
