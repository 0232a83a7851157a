package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** First end-to-end slice (SURVEY.md §7 phase 2): scan → filter → agg →
  * anti-join — the spine of the reference's `verify`/`fix` commands
  * (reference: src/command/verify.rs, src/storage/mod.rs:143-207).
  */
object CoreOps {

  /** Flagship aggregation (also `SparkEntry.entry`): the Spark shape of the
    * reference's per-kind archive statistics (src/command/verify.rs:62-96),
    * exercised as a TPC-H-Q1-style groupBy over lineitem.
    */
  val q1Agg: Op = Op.sql(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
      |                     AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
      |       count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, d) =>
    // revenue snaps each row to integer cents BEFORE summing (order-free;
    // a raw double sum diverges by a ULP across engines when the 2dp
    // round lands on a boundary — fuzz seed 404). DEFINITION NOTE
    // (ADVICE r8): this is a deliberate semantic change from
    // round(sum(price*(1-disc)), 2) — per-row cent snapping can drift
    // from the round-of-sum value by up to half a cent per row. The
    // engine DEFINES revenue at the cent grain (the money type's native
    // resolution): it is exact, associative, and engine-independent,
    // where round-of-double-sum is none of the three. sum_qty stays a
    // plain double sum: quantities are integral, so the sum is exact.
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).cast("long") / lit(100.0)).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Keep records whose height is inside a chunk range
    * (reference: src/command/compact.rs:370-377,432-440). Pushed to the
    * parquet scan by Catalyst (shows up in PushedFilters).
    */
  val filterHeightRange: Op = Op.sql(
    "filter-height-range",
    """SELECT o_orderkey AS height, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_orderkey BETWEEN 100 AND 1099
      |ORDER BY height""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderkey").between(100, 1099))
      .select(col("o_orderkey").as("height"), col("o_custkey"), col("o_totalprice"))
      .orderBy("height")
  }

  /** Extract the height field from a record, type-checked
    * (reference: src/avros.rs:252-260). Column pruning → parquet reads one
    * column.
    */
  val projectHeight: Op = Op.sql(
    "project-height",
    "SELECT o_orderkey AS height FROM orders ORDER BY height"
  ) { (s, d) =>
    Tables.orders(s, d).select(col("o_orderkey").cast("long").as("height")).orderBy("height")
  }

  /** `find_incomplete_tables` — expected range minus archived keys
    * (reference: src/storage/mod.rs:143-207). The archived set is orders
    * minus multiples of 7; expected is the dense [min..max] sequence
    * generated DISTRIBUTED via spark.range (not a single exploded array —
    * at 100 TB the expected range is billions of heights).
    */
  val antiJoinMissing: Op = Op.sql(
    "anti-join-missing",
    """WITH arch AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0),
      |bounds AS (SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx FROM arch),
      |seq AS (SELECT unnest(generate_series(mn, mx)) AS height FROM bounds)
      |SELECT height FROM seq
      |WHERE height NOT IN (SELECT o_orderkey FROM arch)
      |ORDER BY height""".stripMargin
  ) { (s, d) =>
    val arch = Tables.orders(s, d)
      .filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"))
    // Two scalars to the driver (a single agg row), then a distributed range:
    // the expected-height side never materializes as one array.
    val Row(mn: Long, mx: Long) =
      arch.agg(min("o_orderkey"), max("o_orderkey")).head()
    s.range(mn, mx + 1).toDF("height")
      .join(arch.withColumnRenamed("o_orderkey", "height"), Seq("height"), "left_anti")
      .orderBy("height")
  }

  /** `CopiedStatus.validate` — copied count equals range length and the keys
    * form one contiguous interval (reference: src/command/compact.rs:246-321).
    * Checked per 100-key chunk over the gappy archived subset.
    */
  val aggCompleteness: Op = Op.sql(
    "agg-completeness",
    """WITH arch AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0)
      |SELECT CAST(floor(o_orderkey / 100) AS BIGINT) AS chunk,
      |       count(*) AS n,
      |       min(o_orderkey) AS mn,
      |       max(o_orderkey) AS mx,
      |       (count(*) = max(o_orderkey) - min(o_orderkey) + 1) AS complete
      |FROM arch
      |GROUP BY chunk
      |ORDER BY chunk""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 7 =!= 0)
      .groupBy(floor(col("o_orderkey") / 100).cast("long").as("chunk"))
      .agg(
        count(lit(1)).as("n"),
        min("o_orderkey").as("mn"),
        max("o_orderkey").as("mx"))
      .withColumn("complete", col("n") === col("mx") - col("mn") + 1)
      .orderBy("chunk")
  }

  val ops: Seq[Op] = Seq(q1Agg, filterHeightRange, projectHeight, antiJoinMissing, aggCompleteness)
}
