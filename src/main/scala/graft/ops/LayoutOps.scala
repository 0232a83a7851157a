package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Physical data-layout planning ops — the metadata-tier queries that decide
  * how a 100-TB archive is clustered on disk and how much of it a query must
  * read. The reference's layout is one-dimensional (height-ranged files,
  * reference: src/filenames.rs:60-88, SURVEY.md §1.4); these ops cover the
  * multi-dimensional generalization every large warehouse needs: Z-order
  * clustering keys and zone-map (min/max) pruning stats.
  *
  * Both ops are pure projections + one catalog-grained groupBy — the row
  * data itself never shuffles anywhere except on the (coarse) file key, which
  * is exactly the shuffle a real re-clustering write would perform.
  */
object LayoutOps {

  /** Morton/Z-order bit-spread of a 16-bit value onto even bit positions —
    * the classic magic-number doubling network, expressed with the portable
    * integer bit ops (`shiftleft`, `&`, `|`) that both Spark codegen and any
    * ANSI engine evaluate identically (no UDF, no float).
    */
  private def spread16(v: Column): Column = {
    val a = bitwise_and(v.bitwiseOR(shiftleft(v, 8)), lit(0x00FF00FFL))
    val b = bitwise_and(a.bitwiseOR(shiftleft(a, 4)), lit(0x0F0F0F0FL))
    val c = bitwise_and(b.bitwiseOR(shiftleft(b, 2)), lit(0x33333333L))
    bitwise_and(c.bitwiseOR(shiftleft(c, 1)), lit(0x55555555L))
  }

  private def bitwise_and(l: Column, r: Column): Column = l.bitwiseAND(r)

  /** Z-order clustering audit: interleave (l_partkey, l_suppkey) into a
    * Morton key, tile the table into 4096-key Z-files, and report each
    * file's zone extents. The payoff column is `span` — the area of the
    * (part × supp) rectangle a file's zone map covers: Z-ordered files
    * cover small, square-ish rectangles, so a predicate on EITHER dimension
    * prunes most files; a single-dimension sort gives files that span the
    * whole other dimension (span ≈ full range) and zone maps on the second
    * column are useless. At 100 TB this op is the planner for a
    * `repartitionByRange(zkey)` re-clustering write — the stats computed
    * here are the write's file-skipping contract.
    *
    * Scale shape: `zkey` is a per-row codegen'd bit projection (no shuffle);
    * the only exchange is the groupBy on the file id — the same key a
    * re-clustering writer would range-partition by. Output is file-catalog
    * sized. All columns are exact integers.
    */
  val layoutZorder: Op = Op.sql(
    "layout-zorder",
    """WITH z AS (
      |  SELECT l_partkey AS p, l_suppkey AS s,
      |         ((((p & 65535) | ((p & 65535) << 8)) & 16711935
      |            | ((((p & 65535) | ((p & 65535) << 8)) & 16711935) << 4)) & 252645135) AS ph
      |  FROM lineitem),
      |z2 AS (
      |  SELECT p, s,
      |         (((ph | (ph << 2)) & 858993459
      |            | ((((ph | (ph << 2)) & 858993459)) << 1)) & 1431655765) AS px,
      |         ((((s & 65535) | ((s & 65535) << 8)) & 16711935
      |            | ((((s & 65535) | ((s & 65535) << 8)) & 16711935) << 4)) & 252645135) AS sh
      |  FROM z),
      |z3 AS (
      |  SELECT p, s, px,
      |         (((sh | (sh << 2)) & 858993459
      |            | ((((sh | (sh << 2)) & 858993459)) << 1)) & 1431655765) AS sx
      |  FROM z2),
      |keyed AS (SELECT p, s, (px | (sx << 1)) AS zkey FROM z3),
      |filed AS (SELECT p, s, zkey // 4096 AS zfile FROM keyed)
      |SELECT zfile, count(*) AS n_rows,
      |       min(p) AS p_min, max(p) AS p_max,
      |       min(s) AS s_min, max(s) AS s_max,
      |       (max(p) - min(p) + 1) * (max(s) - min(s) + 1) AS span
      |FROM filed GROUP BY zfile ORDER BY zfile""".stripMargin
  ) { (s, d) =>
    val li = Tables.lineitem(s, d).select(
      col("l_partkey").as("p"), col("l_suppkey").as("s"))
    val zkey = spread16(bitwise_and(col("p"), lit(65535L)))
      .bitwiseOR(shiftleft(spread16(bitwise_and(col("s"), lit(65535L))), 1))
    li.withColumn("zkey", zkey)
      .withColumn("zfile", expr("zkey div 4096"))
      .groupBy("zfile")
      .agg(
        count(lit(1)).as("n_rows"),
        min("p").as("p_min"), max("p").as("p_max"),
        min("s").as("s_min"), max("s").as("s_max"),
        ((max("p") - min("p") + 1) * (max("s") - min("s") + 1)).as("span"))
      .orderBy("zfile")
  }

  /** Zone-map pruning audit: build the per-file min/max index the archive's
    * natural layout yields (files tile the PRIMARY key, o_orderkey — the
    * reference's height-chunked layout, src/filenames.rs:60-88) and grade a
    * SECONDARY-column range probe (o_custkey ∈ [100, 200]) against it:
    * `must_read` marks files whose custkey zone intersects the probe. Under
    * the natural layout custkey is uncorrelated with file order, so nearly
    * every file must be read — the quantified motivation for layout-zorder.
    * This min/max catalog is exactly what parquet row-group stats give a
    * 100-TB scan, so `sum(must_read)/count(*)` here IS the scan's I/O
    * fraction for the probe.
    *
    * Scale shape: one groupBy on the file id (catalog-grained); the probe
    * grade is a projection over catalog rows. Pure integers.
    */
  val indexZonemap: Op = Op.sql(
    "index-zonemap",
    """WITH f AS (
      |  SELECT o_orderkey // 100 AS file_id,
      |         count(*) AS n_rows,
      |         min(o_custkey) AS ck_min, max(o_custkey) AS ck_max
      |  FROM orders GROUP BY file_id)
      |SELECT file_id, n_rows, ck_min, ck_max,
      |       CASE WHEN ck_max >= 100 AND ck_min <= 200 THEN 1 ELSE 0 END AS must_read
      |FROM f ORDER BY file_id""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(expr("o_orderkey div 100").as("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min("o_custkey").as("ck_min"), max("o_custkey").as("ck_max"))
      .withColumn("must_read",
        when(col("ck_max") >= 100 && col("ck_min") <= 200, 1).otherwise(0))
      .orderBy("file_id")
  }

  /** Hive-partition balance audit for a `partitionBy(lang, source)` layout:
    * per partition, row count, byte-weight proxy (sum of n_chars), skew in
    * basis points of the corpus total, and the file-split count a writer
    * should use for that partition (64 KiB target here; the constant scales
    * with the deployment's target file size). The reference's layout is
    * range-only (src/filenames.rs:60-88); this is the planner for the hive
    * generalization: oversized partitions get `splits` output files (via
    * repartition inside the partition), tiny ones coalesce to one.
    *
    * Scale shape: one catalog-grained groupBy; the corpus total is a window
    * sum over the CATALOG rows (single-partition, but over ~|partitions|
    * rows, not data rows — one pass, no second scan of the corpus). Exact
    * integer arithmetic throughout (basis points via integer division) — no
    * float in the hashed output.
    */
  val layoutPartitionSkew: Op = Op.sql(
    "layout-partition-skew",
    """WITH p AS (
      |  SELECT lang, source, count(*) AS n_rows,
      |         CAST(sum(n_chars) AS BIGINT) AS weight
      |  FROM documents GROUP BY lang, source),
      |t AS (SELECT CAST(sum(weight) AS BIGINT) AS tw FROM p)
      |SELECT lang, source, n_rows, weight,
      |       CAST((weight * 10000) // tw AS BIGINT) AS skew_bp,
      |       CAST((weight + 65535) // 65536 AS BIGINT) AS splits
      |FROM p, t ORDER BY lang, source""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val parts = Tables.documents(s, d)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_rows"), sum("n_chars").as("weight"))
    parts.withColumn("tw",
        sum("weight").over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("lang"), col("source"), col("n_rows"), col("weight"),
        expr("(weight * 10000) div tw").as("skew_bp"),
        expr("(weight + 65535) div 65536").as("splits"))
      .orderBy("lang", "source")
  }

  val ops: Seq[Op] = Seq(layoutZorder, indexZonemap, layoutPartitionSkew)
}
