package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("ArrayDot matches the HOF formulation exactly on float arrays") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f), Array(0.3f, 0.4f))
    ).toDF("a", "b")
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, z) => acc + z).as("d")).as[Double].collect()
    val native = df.select(ArrayDot(col("a"), col("b")).as("d")).as[Double].collect()
    assert(native.toSeq === hof.toSeq)
    assert(native.head === 32.0)
  }

  test("array_dot is SQL-callable after GraftExtensions registration") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(r === 11.0)
  }

  test("ArrayOrderedPairs matches the HOF formulation on seeded random arrays") {
    val rnd = new scala.util.Random(7)
    val arrays = Seq(Array.empty[Long], Array(42L)) ++
      (1 to 6).map(_ => Array.fill(1 + rnd.nextInt(20))(rnd.nextLong(1000L).abs).distinct.sorted)
    val df = arrays.map(a => Tuple1(a)).toDF("ids")
    val hof = df.select(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), (i + 2).cast("int"), size(col("ids"))), y =>
          struct(x.as("d1"), y.as("d2"))))).as("p"))
      .select(explode(col("p")).as("p")).select("p.d1", "p.d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val native = df.select(explode(ArrayOrderedPairs(col("ids"))).as("p"))
      .select("p.d1", "p.d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(native.toSeq === hof.toSeq)
    // sorted input → every pair ordered
    assert(native.forall { case (a, b) => a < b })
  }

  test("array_ordered_pairs is SQL-callable after registration") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT array_ordered_pairs(array(1L, 2L, 3L)) AS p").head().getSeq[Any](0)
    assert(r.size === 3)
  }

  test("ArrayOrderedSizedPairs matches a Scala model and never drops a true match") {
    val rnd = new scala.util.Random(13)
    val t = 0.5
    val lists: Seq[Seq[(Long, Long)]] =
      Seq(Seq.empty, Seq((42L, 7L))) ++ (1 to 8).map { _ =>
        Seq.fill(1 + rnd.nextInt(20))(
          (rnd.nextLong(1000L).abs, 1L + rnd.nextInt(40).toLong))
          .distinctBy(_._1).sortBy(_._1)
      }
    val df = lists.map(Tuple1(_)).toDF("raw")
      .select(expr("transform(raw, x -> struct(x._1 AS id, x._2 AS n))").as("ids"))
    val native = df.select(explode(ArrayOrderedSizedPairs(col("ids"), t)).as("p"))
      .select("p.d1", "p.n1", "p.d2", "p.n2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // same conservative bound as the companion apply: ⌊t·1e6⌋ − 1 (the
    // downstream compare is on round(jac, 6), which admits jac ≥ t − 5e-7)
    val k = math.max(0L, math.floor(t * 1000000.0).toLong - 1L)
    val model = lists.flatMap { l =>
      for {
        (a, i) <- l.zipWithIndex; b <- l.drop(i + 1)
        if math.min(a._2, b._2) * 1000000L >= k * math.max(a._2, b._2)
      } yield (a._1, a._2, b._1, b._2)
    }.toSet
    assert(native === model)
    assert(native.forall { case (d1, _, d2, _) => d1 < d2 })
    // conservativeness: every pair that could reach jaccard >= t survives
    // (j <= min/max, so min/max >= t must be kept — including equality)
    val boundary = Seq(Seq((1L, 2L), (2L, 4L), (3L, 5L))).map(Tuple1(_))
      .toDF("raw")
      .select(expr("transform(raw, x -> struct(x._1 AS id, x._2 AS n))").as("ids"))
      .select(explode(ArrayOrderedSizedPairs(col("ids"), t)).as("p"))
      .select("p.d1", "p.d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (2,4): ratio exactly 0.5 — kept; (4,5): 0.8 — kept; (2,5): 0.4 — dropped
    assert(boundary === Set((1L, 2L), (2L, 3L)))
  }

  test("ArrayOrderedSizedPairs at threshold 0.0 keeps every ordered pair") {
    // dedup-containment's contract (round 13): containment admits no
    // length prefilter, so the op calls the sized generator with t = 0.0
    // and must get exactly C(n,2) pairs — the unsized generator's output
    // with sizes riding along.
    val df = Seq(Tuple1(Seq((1L, 9L), (2L, 1L), (5L, 1000000L)))).toDF("raw")
      .select(expr("transform(raw, x -> struct(x._1 AS id, x._2 AS n))").as("ids"))
    val pairs = df.select(explode(ArrayOrderedSizedPairs(col("ids"), 0.0)).as("p"))
      .select("p.d1", "p.n1", "p.d2", "p.n2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(pairs === Set((1L, 9L, 2L, 1L), (1L, 9L, 5L, 1000000L),
      (2L, 1L, 5L, 1000000L)))
  }

  test("array_ordered_sized_pairs is SQL-callable after registration") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT array_ordered_sized_pairs(
        |  array(struct(1L, 10L), struct(2L, 10L), struct(3L, 3L)),
        |  500000) AS p""".stripMargin).head().getSeq[Any](0)
    // (1,2) ratio 1.0 kept; (1,3) and (2,3) ratio 0.3 dropped
    assert(r.size === 1)
  }

  test("the full kernel tier is SQL-callable and matches the Column API") {
    graft.GraftExtensions.register(spark)
    // every registered function parses and evaluates via SQL
    val row = spark.sql(
      """SELECT array_dot_long(array(1L, 2L), array(3L, 4L)) AS dl,
        |       bloom_folds('abc') AS bf,
        |       repetition_stats(array('a', 'b', 'a', 'b')) AS rs,
        |       token_entropy(array('a', 'a', 'b')) AS te,
        |       simhash_fingerprint(array('a', 'b')) AS s20,
        |       simhash_fingerprint(array('a', 'b'), 48, 1) AS s48,
        |       gradient_sample_hash('payload', 48) AS gh,
        |       cdc_cuts(array('a', 'b', 'c', 'd', 'e', 'f')) AS cc,
        |       winnow_fingerprints(array('a', 'b', 'c', 'd', 'e', 'f', 'g')) AS wf
        |""".stripMargin).head()
    assert(row.getLong(0) === 11L)
    assert(row.getSeq[Long](1).size === 3)
    // SQL results match the Column-API spellings bit-for-bit
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a", "b"))).toDF("ts")
    val viaApi = df.select(
      graft.functions.SimhashFingerprint(col("ts")).as("s20"),
      graft.functions.SimhashFingerprint.mixed(col("ts"), 48).as("s48")).head()
    assert(row.getLong(4) === viaApi.getLong(0))
    assert(row.getLong(5) === viaApi.getLong(1))
    // the two round-7 kernels round-trip through SQL too
    val toks = Seq(Tuple1(Seq("a", "b", "c", "d", "e", "f", "g")))
      .toDF("ts")
    val wfApi = toks
      .select(graft.functions.WinnowFingerprints(col("ts")).as("wf"))
      .select(expr("transform(wf, x -> x.fp)")).head().getSeq[Long](0)
    assert(row.getSeq[org.apache.spark.sql.Row](8).map(_.getLong(1)) === wfApi)
    val ccApi = Seq(Tuple1(Seq("a", "b", "c", "d", "e", "f"))).toDF("ts")
      .select(graft.functions.CdcCuts(col("ts")).as("cc")).head().getSeq[Long](0)
    assert(row.getSeq[Long](7) === ccApi)
  }

  test("chain aggregator verifies an intact chain and localizes breaks") {
    import graft.functions.{BlockLink, ChainSequenceAggregator}
    def md5s(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes).map("%02x".format(_)).mkString

    def link(h: Long, parentOf: Long => String) =
      BlockLink(h, md5s(h.toString), parentOf(h - 1))

    // intact chain 0..99
    val ok = (0L to 99L).map(h => link(h, p => md5s(p.toString)))
    val v1 = ok.toDS().repartition(7)
      .select(ChainSequenceAggregator.toColumn).head()
    assert(v1.ok && v1.minH === 0L && v1.maxH === 99L && v1.breaks.isEmpty)

    // gap at 50 and a bad hash at 80
    val broken = ok.filterNot(_.height == 50L).map {
      case b if b.height == 80L => b.copy(parentId = "corrupt")
      case b                    => b
    }
    val v2 = broken.toDS().repartition(7)
      .select(ChainSequenceAggregator.toColumn).head()
    assert(!v2.ok)
    assert(v2.breaks === Seq(51L, 80L))
  }
}
