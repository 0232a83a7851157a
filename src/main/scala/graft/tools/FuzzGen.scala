package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Seeded adversarial-fixture generator for oracle-parity fuzzing
  * (round-8, VERDICT r7 item 6): `FuzzGen <outBase> <seed,seed,...>`
  * writes one driver-schema fixture per seed, each deliberately packed
  * with the cross-engine divergence traps that are otherwise guarded
  * only op-by-op:
  *
  *  - NEGATIVE values everywhere a column is signed (acctbals, event
  *    values, discounts, even quantities) — the Spark `div` (truncate
  *    toward zero) vs DuckDB `//` (floor) trap;
  *  - TIES at every grain: duplicate heights/dates, duplicate
  *    (orderkey, linenumber) with equal AND differing shipdates, equal
  *    event timestamps within a user, duplicate embedding vectors
  *    (distance ties) — any top-k / argmax without a total order
  *    diverges here;
  *  - DEGENERATE populations: a source with exactly one document, an
  *    all-duplicate document cluster, single-token and double-space
  *    texts (empty-string tokens), one user holding ~30% of events;
  *  - exact .5 rounding edges in doubles (round-half behavior).
  *
  * Every table matches the driver testdata schema byte-for-byte
  * (TESTDATA.md; FuzzSpec pins this), and each table lands as a SINGLE
  * parquet file named `{table}.parquet` so `tools/oracle_check.py`'s
  * DuckDB views read the fixture exactly like the driver testdata.
  * Deterministic: all content derives from the seed via one
  * scala.util.Random stream per table.
  */
object FuzzGen {
  def main(args: Array[String]): Unit = {
    val base = args(0)
    val seeds = args(1).split(",").map(_.trim.toInt)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    seeds.foreach(seed => genFixture(spark, s"$base/s$seed", seed))
    spark.stop()
  }

  /** Write df as the single file `<dir>/<name>.parquet`. */
  private def writeOne(df: DataFrame, dir: String, name: String): Unit = {
    val tmp = s"$dir/_tmp_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
      .find(_.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file for $name"))
    Files.createDirectories(Paths.get(dir))
    Files.move(Paths.get(part), Paths.get(s"$dir/$name.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    // clean the temp dir (part file already moved out)
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  def genFixture(spark: SparkSession, dir: String, seed: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val ts0 = 1704067200000000L // 2024-01-01T00:00Z in micros

    def ntz(us: Long): java.time.LocalDateTime =
      java.time.LocalDateTime.ofEpochSecond(us / 1000000L,
        ((us % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)

    def df(schema: StructType)(rows: Seq[Seq[Any]]): DataFrame =
      spark.createDataFrame(
        rows.map(r => org.apache.spark.sql.Row.fromSeq(r)).asJava, schema)

    // ---- region / nation (fixed shape, tiny) --------------------------
    val region = df(StructType(Seq(
      StructField("r_regionkey", IntegerType, nullable = true),
      StructField("r_name", StringType, nullable = true))))(
      (0 until 5).map(i => Seq(i, s"REGION$i")))
    val nation = df(StructType(Seq(
      StructField("n_nationkey", IntegerType, nullable = true),
      StructField("n_name", StringType, nullable = true),
      StructField("n_regionkey", IntegerType, nullable = true))))(
      (0 until 25).map(i => Seq(i, s"NATION$i", i % 5)))

    // ---- customer -----------------------------------------------------
    val rc = new Random(seed * 7919 + 1)
    val nCust = 60
    val customer = df(StructType(Seq(
      StructField("c_custkey", LongType, nullable = true),
      StructField("c_name", StringType, nullable = true),
      StructField("c_nationkey", IntegerType, nullable = true),
      StructField("c_acctbal", DoubleType, nullable = true),
      StructField("c_mktsegment", StringType, nullable = true))))(
      (0 until nCust).map { i =>
        // negative balances and exact .5 edges
        val bal = (rc.nextInt(4001) - 2000) / 2.0
        Seq(i.toLong, s"Customer$i", rc.nextInt(25),
          bal, Seq("AUTO", "BUILDING", "MACHINERY")(rc.nextInt(3)))
      })

    // ---- supplier / part ----------------------------------------------
    val rs = new Random(seed * 7919 + 2)
    val supplier = df(StructType(Seq(
      StructField("s_suppkey", LongType, nullable = true),
      StructField("s_name", StringType, nullable = true),
      StructField("s_nationkey", IntegerType, nullable = true),
      StructField("s_acctbal", DoubleType, nullable = true))))(
      (0 until 12).map(i => Seq(i.toLong, s"Supplier$i", rs.nextInt(25),
        (rs.nextInt(2001) - 1000) / 2.0)))
    val rp = new Random(seed * 7919 + 3)
    val part = df(StructType(Seq(
      StructField("p_partkey", LongType, nullable = true),
      StructField("p_name", StringType, nullable = true),
      StructField("p_brand", StringType, nullable = true),
      StructField("p_type", StringType, nullable = true),
      StructField("p_size", IntegerType, nullable = true),
      StructField("p_retailprice", DoubleType, nullable = true))))(
      (0 until 80).map(i => Seq(i.toLong,
        s"part ${Seq("red", "blue", "green")(rp.nextInt(3))} ${rp.nextInt(9)}",
        s"Brand#${rp.nextInt(5)}",
        Seq("STANDARD", "SMALL", "LARGE")(rp.nextInt(3)) + " METAL",
        rp.nextInt(50) + 1, (rp.nextInt(20000) + 100) / 10.0)))

    // ---- orders: duplicate dates, priority flip-flops -----------------
    val ro = new Random(seed * 7919 + 4)
    val nOrd = 600
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val orders = df(StructType(Seq(
      StructField("o_orderkey", LongType, nullable = true),
      StructField("o_custkey", LongType, nullable = true),
      StructField("o_orderstatus", StringType, nullable = true),
      StructField("o_totalprice", DoubleType, nullable = true),
      StructField("o_orderdate", TimestampNTZType, nullable = true),
      StructField("o_orderpriority", StringType, nullable = true))))(
      (0 until nOrd).map { i =>
        // only ~20 distinct days => heavy date ties; same-day priority
        // flips are routine
        val day = ro.nextInt(20).toLong
        Seq(i.toLong, ro.nextInt(nCust).toLong,
          Seq("O", "F", "P")(ro.nextInt(3)),
          (ro.nextInt(400001) - 100000) / 2.0,
          ntz(ts0 + day * 86400000000L), prios(ro.nextInt(5)))
      })

    // ---- lineitem: duplicate (orderkey, linenumber), negative qty -----
    val rl = new Random(seed * 7919 + 5)
    val lineitem = df(StructType(Seq(
      StructField("l_orderkey", LongType, nullable = true),
      StructField("l_partkey", LongType, nullable = true),
      StructField("l_suppkey", LongType, nullable = true),
      StructField("l_linenumber", IntegerType, nullable = true),
      StructField("l_quantity", DoubleType, nullable = true),
      StructField("l_extendedprice", DoubleType, nullable = true),
      StructField("l_discount", DoubleType, nullable = true),
      StructField("l_tax", DoubleType, nullable = true),
      StructField("l_returnflag", StringType, nullable = true),
      StructField("l_linestatus", StringType, nullable = true),
      StructField("l_shipdate", TimestampNTZType, nullable = true))))(
      (0 until 2400).map { i =>
        val okey = rl.nextInt(nOrd).toLong
        val day = rl.nextInt(25).toLong
        Seq(okey, rl.nextInt(80).toLong, rl.nextInt(12).toLong,
          rl.nextInt(3) + 1, // 1..3 => (okey, line) collides often
          (rl.nextInt(101) - 50).toDouble, // negative quantities
          (rl.nextInt(100001) - 20000) / 2.0,
          rl.nextInt(11) / 100.0, rl.nextInt(9) / 100.0,
          Seq("A", "N", "R")(rl.nextInt(3)), Seq("O", "F")(rl.nextInt(2)),
          ntz(ts0 + day * 86400000000L +
            (if (rl.nextBoolean()) 0L else 43200000000L)))
      })

    // ---- events: hot user, ts ties, negative values -------------------
    // Seeds >= 600 are LONG-SPAN fixtures (round-10, VERDICT r9 item 2):
    // events spread over 40 DAYS at 15-minute grain (2000 draws over 3840
    // slots keep exact-ts ties likely), so day-split ops — the
    // stream-ood-flags serve path (day >= min + 14), agg-trend-slope's
    // multi-day moments, the retention/cohort/LTV family — run
    // NON-degenerately under fuzz; seeds < 600 keep the original <= 20 h
    // span that stresses the within-day tie/boundary paths.
    // tools/fuzz_check.py asserts the serve/moment sets are non-empty on
    // long-span seeds.
    val re = new Random(seed * 7919 + 6)
    val longSpan = seed >= 600
    val types = Seq("view", "click", "purchase", "signup", "error")
    val events = df(StructType(Seq(
      StructField("event_id", LongType, nullable = true),
      StructField("ts", TimestampNTZType, nullable = true),
      StructField("user_id", LongType, nullable = true),
      StructField("event_type", StringType, nullable = true),
      StructField("value", DoubleType, nullable = true),
      StructField("props", StringType, nullable = true))))(
      (0 until 2000).map { i =>
        val uid = if (re.nextInt(10) < 3) 0L else re.nextInt(50).toLong
        // coarse slot grain => many exact ts ties (micros kept zero)
        val us =
          if (longSpan) ts0 + re.nextInt(3840) * 900000000L // 40 d, 15-min grain
          else ts0 + re.nextInt(1200) * 1000000L * 60L // <= 20 h, 1-min grain
        Seq(i.toLong, ntz(us), uid, types(re.nextInt(5)),
          (re.nextInt(2001) - 1000) / 2.0,
          s"""{"k": ${re.nextInt(201) - 100}}""")
      })

    // ---- documents: dup cluster, singleton source, empty tokens -------
    val rd = new Random(seed * 7919 + 7)
    val vocab = Seq("spark", "scan", "join", "sort", "hash", "key", "the",
      "a", "of", "and", "to", "in", "is", "table", "query", "batch")
    def sentence(n: Int): String =
      (0 until n).map(_ => vocab(rd.nextInt(vocab.length))).mkString(" ")
    val dupText = sentence(12)
    val docRows = (0 until 120).map { i =>
      val src = if (i == 0) "srcSingleton" else s"src${rd.nextInt(4)}"
      val text =
        if (i % 5 == 0) dupText // all-duplicate cluster (~24 docs)
        else if (i % 17 == 0) vocab(rd.nextInt(vocab.length)) // single token
        else if (i % 23 == 0) sentence(4) + "  " + sentence(3) // double space
        else sentence(6 + rd.nextInt(20))
      Seq(i.toLong, text, if (rd.nextInt(10) == 0) "de" else "en", src,
        text.length.toLong)
    }
    // Seeds >= 700 additionally plant a CHAIN-SHAPED near-dup component
    // (round-13, VERDICT r12 item 5): 64 sliding-window docs over one
    // disjoint token sequence — window 20 tokens, shift 2, so adjacent
    // docs share 16 of their 18 3-gram shingles (jaccard 16/20 = 0.8,
    // exactly the >= 0.8 edge) while docs two apart sit at 14/22 ≈ 0.64
    // (no edge). The doc pair graph gets a diameter-63 PATH, so the CC
    // loop (Clusters.scala) must run ~log2(63) ≈ 6 pointer-jump rounds
    // to converge — without this every fuzz component was a clique/star
    // that converged in the fused init round, leaving maxIter/convergence
    // logic untested in the gate. Each chain shingle appears in <= 10
    // docs, safely under the maxDf=20 prune.
    val chain = seed >= 700
    val chainDocRows = if (!chain) Seq.empty else (0 until 64).map { i =>
      val text = (2 * i until 2 * i + 20).map(k => s"ch$k").mkString(" ")
      Seq((120 + i).toLong, text, "en", "srcChain", text.length.toLong)
    }
    val documents = df(StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("text", StringType, nullable = true),
      StructField("lang", StringType, nullable = true),
      StructField("source", StringType, nullable = true),
      StructField("n_chars", LongType, nullable = true))))(
      docRows ++ chainDocRows)

    // ---- embeddings: unit norm, exact duplicate vectors ---------------
    val rv = new Random(seed * 7919 + 8)
    val dims = 64
    def unitVec(): Seq[Float] = {
      val raw = Seq.fill(dims)(rv.nextInt(2001) - 1000)
      val n = math.sqrt(raw.map(x => x.toDouble * x).sum)
      raw.map(x => (x / n).toFloat)
    }
    val baseVecs = Seq.fill(16)(unitVec())
    // Chain seeds also plant a 63-vector PATH in the embedding near-dup
    // graph (dedup-cluster's CC input): 2-hot unit vectors
    // v_i = (e_i + e_{i+1})/√2, so adjacent vectors have cosine 0.5
    // (>= the 0.35 edge) and any other pair cosine 0 — a diameter-62
    // component. Label 99 keeps the chain's block pure (random vectors
    // live in labels 0..9 and never pair against it).
    val chainVecRows = if (!chain) Seq.empty else (0 until 63).map { i =>
      val v = Seq.tabulate(dims)(k =>
        if (k == i || k == i + 1) (1.0 / math.sqrt(2.0)).toFloat else 0.0f)
      Seq((64 + i).toLong, v, 99)
    }
    val embeddings = df(StructType(Seq(
      StructField("vec_id", LongType, nullable = true),
      StructField("embedding", ArrayType(FloatType, containsNull = true),
        nullable = true),
      StructField("label", IntegerType, nullable = true))))(
      (0 until 64).map { i =>
        // every 4th vector is an exact duplicate of a base vector:
        // guaranteed distance ties for the top-k tiebreak paths
        val v = if (i % 4 == 0) baseVecs(rv.nextInt(16)) else unitVec()
        Seq(i.toLong, v, rv.nextInt(10))
      } ++ chainVecRows)

    Seq(("region", region), ("nation", nation), ("customer", customer),
      ("supplier", supplier), ("part", part), ("orders", orders),
      ("lineitem", lineitem), ("events", events), ("documents", documents),
      ("embeddings", embeddings))
      .foreach { case (name, d) => writeOne(d, dir, name) }
    println(s"[fuzzgen] seed $seed fixture at $dir")
  }
}
