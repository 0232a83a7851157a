package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Synthetic scale-up fixture generator (round-8 scaling-curve harness,
  * VERDICT r7 item 1): `ScaleGen <srcDir> <outDir> <mult>` writes a
  * fixture `mult`× the source as `mult` INDEPENDENT SHARDS of the same
  * distribution — the scaling model under which a linear plan must
  * measure linear:
  *
  *  - every key space is offset per replica (custkey, orderkey, partkey,
  *    suppkey, event/user ids, doc_id, vec_id), so joins/groupBys see
  *    `mult`× keys at unchanged per-key fan-out;
  *  - document TEXT tokens are prefixed `r{i}·` per replica (replica 0
  *    byte-identical to the source), so the shingle/minhash/LSH
  *    candidate structure replicates EXACTLY `mult`× — naive text
  *    copying would instead make every doc a cross-replica exact dup
  *    and blow the pair tables up quadratically in `mult`, an artifact
  *    that would drown the slope being measured;
  *  - embedding vectors are FRESH unit-norm pseudo-random draws per
  *    replica (xxhash64-seeded, deterministic) matching the source's
  *    unit-norm random geometry — copied vectors would co-bucket every
  *    clone set in the LSH/IVF ops and square their bucket joins;
  *  - region/nation stay single-copy (bounded dimensions), order dates,
  *    event timestamps, amounts and categorical columns keep their
  *    source distributions untouched.
  *
  * Determinism: pure column arithmetic + xxhash64 — no RNG, no clock;
  * same (src, mult) → byte-identical fixture modulo parquet row order.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val mult = args(2).toInt
    require(mult >= 1, "mult must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // replica index table: crossJoin'd per source row (mult is tiny)
    val reps = spark.range(0, mult).toDF("rep")

    def replicate(df: DataFrame): DataFrame = df.crossJoin(broadcast(reps))

    /** Offset an id column by rep × the source key-space size (next
      * power-of-ten-ish stride keeps ids readable; any stride ≥ span
      * works since source ids are 0-based and dense). Strides are sized
      * for the sf0.1 testdata — guard so running against a LARGER
      * source cannot silently overlap replica id spaces and corrupt the
      * "independent shards" scaling model (round-8 self-review).
      */
    def off(c: String, stride: Long) = col(c) + col("rep") * stride

    def requireFits(df: DataFrame, c: String, stride: Long): DataFrame = {
      val mx = df.agg(max(col(c))).head().getLong(0)
      require(mx < stride,
        s"$c max $mx >= replica stride $stride — source larger than the " +
          "sf0.1 key space these strides assume; raise the stride")
      df
    }

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name done")
    }

    // bounded dims: single copy
    write(Tables.region(spark, src), "region")
    write(Tables.nation(spark, src), "nation")

    write(replicate(requireFits(Tables.customer(spark, src), "c_custkey", 15000))
      .select(off("c_custkey", 15000).as("c_custkey"),
        when(col("rep") === 0, col("c_name"))
          .otherwise(concat(col("c_name"), lit("-r"), col("rep"))).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      "customer")

    write(replicate(requireFits(Tables.supplier(spark, src), "s_suppkey", 1000))
      .select(off("s_suppkey", 1000).as("s_suppkey"),
        when(col("rep") === 0, col("s_name"))
          .otherwise(concat(col("s_name"), lit("-r"), col("rep"))).as("s_name"),
        col("s_nationkey"), col("s_acctbal")),
      "supplier")

    write(replicate(requireFits(Tables.part(spark, src), "p_partkey", 20000))
      .select(off("p_partkey", 20000).as("p_partkey"),
        when(col("rep") === 0, col("p_name"))
          .otherwise(concat(col("p_name"), lit(" r"), col("rep"))).as("p_name"),
        col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")),
      "part")

    write(replicate(requireFits(Tables.orders(spark, src), "o_orderkey", 150000))
      .select(off("o_orderkey", 150000).as("o_orderkey"),
        off("o_custkey", 15000).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")),
      "orders")

    write(replicate(requireFits(Tables.lineitem(spark, src), "l_orderkey", 150000))
      .select(off("l_orderkey", 150000).as("l_orderkey"),
        off("l_partkey", 20000).as("l_partkey"),
        off("l_suppkey", 1000).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate")),
      "lineitem")

    // events: ts arrives as canonical epoch-nanos LONG via Tables.events
    // (the seam absorbs the physical type); written back as a plain long
    // the same seam accepts.
    write(replicate(requireFits(requireFits(Tables.events(spark, src), "event_id", 100000), "user_id", 1500))
      .select(off("event_id", 100000).as("event_id"), col("ts"),
        off("user_id", 1500).as("user_id"),
        col("event_type"), col("value"), col("props")),
      "events")

    // documents: replica 0 byte-identical; others prefix every token
    // with r{i} (disjoint token spaces ⇒ dedup structure replicates
    // exactly; n_chars re-derived to stay consistent with the text).
    write(replicate(requireFits(Tables.documents(spark, src), "doc_id", 5000))
      .select(off("doc_id", 5000).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(concat(lit("r"), col("rep"),
            regexp_replace(col("text"), lit(" "),
              concat(lit(" r"), col("rep"))))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents")

    // embeddings: replica 0 identical; others fresh deterministic
    // unit-norm vectors (uniform components from xxhash64, normalized).
    // `label` is a key space too — it is the BLOCKING key of the
    // within-label all-pairs ops (dedup-embedding-cosine, dedup-cluster)
    // — so it offsets per replica like every other key: an unsalted
    // label grows each block `mult`× and turns the blocked all-pairs
    // quadratic IN THE FIXTURE (r12's dedup-cluster sf10 REVIEW flag:
    // 2e8 within-block pairs at 100× vs 2e6 under the documented
    // "mult× keys at unchanged per-key fan-out" model). A corpus whose
    // blocking key stops bounding block size needs the bucket-blocked
    // path (dedup-embedding-lsh), not bigger blocks — PLANS.md
    // "dedup-cluster" scale rule.
    val dims = 64
    write(replicate(requireFits(requireFits(Tables.embeddings(spark, src)
        .withColumn("label", col("label").cast("long")), "vec_id", 2000), "label", 100))
      .withColumn("raw",
        transform(sequence(lit(0), lit(dims - 1)), j =>
          (xxhash64(col("vec_id"), col("rep"), j) % 1000001L)
            .cast("double") / 1000000.0))
      .withColumn("nrm",
        sqrt(aggregate(col("raw"), lit(0.0d), (a, x) => a + x * x)))
      .select(off("vec_id", 2000).as("vec_id"),
        when(col("rep") === 0, col("embedding"))
          .otherwise(transform(col("raw"), x => (x / col("nrm")).cast("float")))
          .as("embedding"),
        off("label", 100).cast("int").as("label")),
      "embeddings")

    spark.stop()
    println(s"[scalegen] wrote ${mult}x fixture to $out")
  }
}
