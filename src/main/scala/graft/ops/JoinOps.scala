package graft.ops

import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Joins / set operations (SURVEY.md §2.3).
  *
  * The reference's completeness and reconciliation logic is hand-rolled
  * HashSet bookkeeping; here every check is a shuffle-partitioned anti/semi
  * join or a groupBy — sort-merge/broadcast picked by Catalyst+AQE.
  */
object JoinOps {

  /** Reconcile found txids against the declared set: unexpected, missing
    * and duplicate entries (reference: src/command/verify.rs:648-779).
    * orders (filtered) plays the declared block→tx list; lineitem plays the
    * archived tx files.
    */
  val joinTxExpected: Op = Op.sql(
    "join-tx-expected",
    """WITH declared AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0)
      |SELECT 'unexpected' AS issue, l_orderkey AS k1, CAST(l_linenumber AS BIGINT) AS k2
      |FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM declared)
      |UNION ALL
      |SELECT 'missing' AS issue, o_orderkey AS k1, CAST(NULL AS BIGINT) AS k2
      |FROM declared WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
      |UNION ALL
      |SELECT 'duplicate' AS issue, l_orderkey AS k1, CAST(l_linenumber AS BIGINT) AS k2
      |FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
      |ORDER BY issue, k1, k2""".stripMargin
  ) { (s, d) =>
    val declared = Tables.orders(s, d).filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"))
    val li = Tables.lineitem(s, d)
    val unexpected = li
      .join(declared.withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"), "left_anti")
      .select(lit("unexpected").as("issue"), col("l_orderkey").as("k1"),
        col("l_linenumber").cast("long").as("k2"))
    val missing = declared
      .join(li.select(col("l_orderkey").as("o_orderkey")), Seq("o_orderkey"), "left_anti")
      .select(lit("missing").as("issue"), col("o_orderkey").as("k1"),
        lit(null).cast("long").as("k2"))
    val dups = li.groupBy("l_orderkey", "l_linenumber").count()
      .filter(col("count") > 1)
      .select(lit("duplicate").as("issue"), col("l_orderkey").as("k1"),
        col("l_linenumber").cast("long").as("k2"))
    unexpected.union(missing).union(dups).orderBy("issue", "k1", "k2")
  }

  /** Group per-range files of the three kinds into one row — pivot
    * (reference: src/archiver/range_group.rs:44-128). Counts > 1 flag
    * duplicates, 0 flags a missing kind.
    */
  val groupTables: Op = Op.sql(
    "group-tables",
    """SELECT CAST(floor(event_id / 100) AS BIGINT) AS bucket,
      |       count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
      |       count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
      |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
      |       count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
      |       count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
      |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin
  ) { (s, d) =>
    val kinds = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables.events(s, d)
      .groupBy(floor(col("event_id") / 100).cast("long").as("bucket"))
      .pivot("event_type", kinds)
      .count()
    kinds.foldLeft(pivoted) { (df, k) =>
      df.withColumn(s"n_$k", coalesce(col(k), lit(0L))).drop(k)
    }.orderBy("bucket")
  }

  /** `remove_forks` — keep only the record matching the canonical hash per
    * height (reference: src/command/verify.rs:328-369). Canonical = latest
    * ts per (user_id, event_type); the canonical side is tiny → broadcast.
    */
  val semiJoinFork: Op = Op.sql(
    "semi-join-fork",
    """WITH canon AS (
      |  SELECT user_id, event_type, max(epoch_us(ts)) AS ts_us
      |  FROM events GROUP BY user_id, event_type)
      |SELECT e.user_id, e.event_type, e.event_id, epoch_us(e.ts) AS ts_us
      |FROM events e
      |JOIN canon c ON e.user_id = c.user_id AND e.event_type = c.event_type
      |            AND epoch_us(e.ts) = c.ts_us
      |ORDER BY e.user_id, e.event_type, e.event_id""".stripMargin
  ) { (s, d) =>
    // DuckDB's parquet reader truncates TIMESTAMP(NANOS) to micros, so the
    // comparable timestamp grain across engines is epoch-micros.
    val ev = Tables.events(s, d).withColumn("ts_us", expr("ts div 1000"))
    val canon = ev.groupBy("user_id", "event_type").agg(max("ts_us").as("ts_us"))
    ev.join(broadcast(canon), Seq("user_id", "event_type", "ts_us"))
      .select("user_id", "event_type", "event_id", "ts_us")
      .orderBy("user_id", "event_type", "event_id")
  }

  /** `Range::cut` / `RangeBag::remove` — subtract [500, 800] from the
    * archived islands (reference: src/archiver/range.rs:197-213).
    */
  val intervalSubtract: Op = Op.sql(
    "interval-subtract",
    """WITH arch AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 7 <> 0),
      |flags AS (SELECT k, CASE WHEN lag(k) OVER (ORDER BY k) IS NULL
      |                          OR k - lag(k) OVER (ORDER BY k) > 1
      |                         THEN 1 ELSE 0 END AS brk FROM arch),
      |isl AS (SELECT k, sum(brk) OVER (ORDER BY k) AS g FROM flags),
      |iv AS (SELECT min(k) AS s, max(k) AS e FROM isl GROUP BY g)
      |SELECT s, least(e, 499) AS e FROM iv WHERE s <= least(e, 499)
      |UNION ALL
      |SELECT greatest(s, 801) AS s, e FROM iv WHERE greatest(s, 801) <= e
      |ORDER BY s, e""".stripMargin
  ) { (s, d) =>
    val arch = Tables.orders(s, d).filter(col("o_orderkey") % 7 =!= 0)
    val iv = Intervals.islands(arch, "o_orderkey")
    Intervals.subtract(iv, 500L, 800L).orderBy("s", "e")
  }

  /** `RangeBag::compact` — union of intersecting/adjacent ranges as
    * gaps-and-islands (reference: src/archiver/range_bag.rs:53-86), via the
    * two-phase parallel islands in [[Intervals]].
    */
  val intervalUnion: Op = Op.sql(
    "interval-union",
    """WITH arch AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 7 <> 0),
      |flags AS (SELECT k, CASE WHEN lag(k) OVER (ORDER BY k) IS NULL
      |                          OR k - lag(k) OVER (ORDER BY k) > 1
      |                         THEN 1 ELSE 0 END AS brk FROM arch),
      |isl AS (SELECT k, sum(brk) OVER (ORDER BY k) AS g FROM flags)
      |SELECT min(k) AS s, max(k) AS e, count(*) AS len
      |FROM isl GROUP BY g ORDER BY s""".stripMargin
  ) { (s, d) =>
    val arch = Tables.orders(s, d).filter(col("o_orderkey") % 7 =!= 0)
    Intervals.islands(arch, "o_orderkey")
      .withColumn("len", col("e") - col("s") + 1)
      .orderBy("s")
  }

  /** Concatenate the singles and ranges listings into one sorted stream
    * (reference: src/storage/objects.rs:79-98, sorted_files.rs:6-44).
    */
  val unionListings: Op = Op.sql(
    "union-listings",
    """WITH singles AS (
      |  SELECT 'single' AS shape, o_orderkey AS start_h, o_orderkey AS end_h,
      |         concat(lpad(CAST(o_orderkey AS VARCHAR), 9, '0'), '.block.avro') AS file
      |  FROM orders WHERE o_orderkey % 5 = 0),
      |ranges AS (
      |  SELECT DISTINCT 'range' AS shape,
      |         CAST(floor(o_orderkey / 100) AS BIGINT) * 100 AS start_h,
      |         CAST(floor(o_orderkey / 100) AS BIGINT) * 100 + 99 AS end_h,
      |         concat('range-', lpad(CAST(CAST(floor(o_orderkey / 100) AS BIGINT) * 100 AS VARCHAR), 9, '0'),
      |                '_', lpad(CAST(CAST(floor(o_orderkey / 100) AS BIGINT) * 100 + 99 AS VARCHAR), 9, '0'),
      |                '.blocks.avro') AS file
      |  FROM orders)
      |SELECT * FROM (SELECT * FROM singles UNION ALL SELECT * FROM ranges)
      |ORDER BY start_h, end_h, file""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d)
    val singles = o.filter(col("o_orderkey") % 5 === 0).select(
      lit("single").as("shape"),
      col("o_orderkey").as("start_h"),
      col("o_orderkey").as("end_h"),
      concat(lpad(col("o_orderkey").cast("string"), 9, "0"), lit(".block.avro")).as("file"))
    val chunk = floor(col("o_orderkey") / 100).cast("long") * 100
    val ranges = o.select(
      lit("range").as("shape"),
      chunk.as("start_h"),
      (chunk + 99).as("end_h"),
      concat(lit("range-"), lpad(chunk.cast("string"), 9, "0"), lit("_"),
        lpad((chunk + 99).cast("string"), 9, "0"), lit(".blocks.avro")).as("file"))
      .distinct()
    singles.union(ranges).orderBy("start_h", "end_h", "file")
  }

  /** `DataTables::intersect` — set intersection of requested kinds
    * (reference: src/archiver/datakind.rs:76-79), as a key-set intersect.
    */
  val intersectTables: Op = Op.sql(
    "intersect-tables",
    """SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 2 = 0
      |INTERSECT
      |SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 3 = 0
      |ORDER BY k""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d)
    o.filter(col("o_orderkey") % 2 === 0).select(col("o_orderkey").as("k"))
      .intersect(o.filter(col("o_orderkey") % 3 === 0).select(col("o_orderkey").as("k")))
      .orderBy("k")
  }

  /** As-of join (scale extension): every purchase event matched to the
    * same user's most recent click at-or-before it — the temporal lookup
    * behind feature attribution ("what did the user last see?") that
    * relational engines ship as ASOF JOIN and Spark famously lacks.
    *
    * Spark-first shape: NO join at all. Both event streams union into ONE
    * window partitioned by user (clicks sort before purchases at the same
    * instant; equal-ts clicks resolve to the max event id), and
    * `last(click, ignoreNulls)` over the running frame carries the
    * most-recent click to each purchase row. One shuffle on user_id,
    * user-grained frames, no per-row probe structure — at 100 TB this is
    * strictly cheaper than the inequality join + argmax the oracle runs,
    * which degrades as O(clicks × purchases) per user.
    */
  val joinAsof: Op = Op.sql(
    "join-asof",
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |m AS (SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts,
      |             max(CASE WHEN c.event_id IS NULL THEN NULL
      |                      ELSE struct_pack(ts := c.ts, id := c.event_id) END) AS best
      |      FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
      |      GROUP BY 1, 2, 3)
      |SELECT purchase_id, user_id,
      |       CAST(epoch_us(p_ts) AS BIGINT) AS p_ts_us,
      |       best.id AS click_id,
      |       CAST(epoch_us(best.ts) AS BIGINT) AS click_ts_us,
      |       CAST(epoch_us(p_ts) - epoch_us(best.ts) AS BIGINT) AS gap_us
      |FROM m ORDER BY purchase_id""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"),
        when(col("event_type") === "click", 0).otherwise(1), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val click = when(col("event_type") === "click",
      struct(col("ts_us"), col("event_id"))).otherwise(lit(null))
    ev.withColumn("best", last(click, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("p_ts_us"),
        col("best.event_id").as("click_id"),
        col("best.ts_us").as("click_ts_us"),
        (col("ts_us") - col("best.ts_us")).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** Range join via bin replication: every `error` event opens a 15-minute
    * incident window; count the events (and distinct users) landing inside
    * each window. The naive plan for an interval-containment join with no
    * equi key is a broadcast-nested-loop — O(events × windows), dead at
    * 100 TB with a corpus-sized window table. The scale shape used here is
    * the classic BINNED range join: pick a bin width ≥ the maximum window
    * length, replicate each window to the (≤2) bins it overlaps, map each
    * probe row to the single bin containing it, equi-join on the bin key,
    * and re-check exact containment after the join. The inequality join
    * becomes one shuffle on an integer key — AQE-skew-splittable when one
    * time bin is hot — and each (window, event) match is produced exactly
    * once because an event lives in exactly one bin.
    */
  val joinRangeBin: Op = Op.sql(
    "join-range-bin",
    """WITH e AS (SELECT event_id, user_id, event_type,
      |                  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),
      |w AS (SELECT event_id AS window_id, ts_us AS start_us,
      |             ts_us + 900000000 AS end_us
      |      FROM e WHERE event_type = 'error')
      |SELECT w.window_id, w.start_us, count(*) AS n_events,
      |       count(DISTINCT e.user_id) AS n_users
      |FROM w JOIN e ON e.ts_us >= w.start_us AND e.ts_us < w.end_us
      |GROUP BY 1, 2 ORDER BY window_id""".stripMargin
  ) { (s, d) =>
    val binUs = 900000000L // 15 min; must be >= the max window length
    val ev = Tables.events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      expr("ts div 1000").as("ts_us"))
    val wins = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("window_id"), col("ts_us").as("start_us"),
        (col("ts_us") + binUs).as("end_us"))
      .withColumn("bin",
        explode(expr(s"sequence(start_us div $binUs, (end_us - 1) div $binUs)")))
    val probes = ev.select(col("event_id"), col("user_id"),
      col("ts_us").as("e_ts_us"), expr(s"ts_us div $binUs").as("bin"))
    wins.join(probes, Seq("bin"))
      .filter(col("e_ts_us") >= col("start_us") && col("e_ts_us") < col("end_us"))
      .groupBy("window_id", "start_us")
      .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("n_users"))
      .orderBy("window_id")
  }

  /** Generic interval×interval overlap join — the interval-interval
    * generalization of join-range-bin's window×point shape, and the batch
    * planner query the reference runs per chunk ("which archive ranges
    * intersect the requested range", src/storage/mod.rs:143-207) asked for
    * N query ranges at once. Left side: per-(user, day) activity intervals
    * from events; right side: a deliberately grid-UNALIGNED window set
    * (4 h wide every 7 h) so the bucketing below is exercised as a real
    * algorithm, not an equi-join in disguise.
    *
    * Scale shape: both interval sets explode to the 6 h buckets they
    * touch (fan-out ≤ len/G + 1 — bounded by interval length, never by
    * the other side's cardinality), equi-join on the 8-byte bucket id,
    * refine with the exact overlap predicate, then DISTINCT collapses
    * multi-bucket matches (pair-table-sized). The naive inequality join
    * is O(|A|·|B|) and unplannable as anything but BNLJ at 100 TB; this
    * is one integer-keyed shuffle. AQE broadcasts the window side when it
    * is small — both plans are right at their scale.
    */
  val joinIntervalOverlap: Op = {
    val G = 21600000000000L // 6h bucket, ns
    val W = 25200000000000L // 7h window step
    val L = 14400000000000L // 4h window width
    Op.sql(
      "join-interval-overlap",
      s"""WITH a AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
         |                  min(epoch_ns(ts)) AS s, max(epoch_ns(ts)) AS e
         |           FROM events GROUP BY user_id, day),
         |g AS (SELECT min(epoch_ns(ts)) AS t0, max(epoch_ns(ts)) AS t1 FROM events),
         |wi AS (SELECT unnest(generate_series(0, CAST((t1 - t0) // $W AS BIGINT))) AS w_id,
         |              t0 FROM g),
         |w AS (SELECT w_id, t0 + w_id * $W AS ws, t0 + w_id * $W + $L AS we FROM wi)
         |SELECT a.user_id, a.day, w.w_id,
         |       (least(a.e, w.we) - greatest(a.s, w.ws)) // 1000 AS overlap_us
         |FROM a JOIN w ON a.s <= w.we AND w.ws <= a.e
         |ORDER BY user_id, day, w_id""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
      val a = ev.groupBy(col("user_id"), expr("ts div 86400000000000").as("day"))
        .agg(min("ts").as("s"), max("ts").as("e"))
      val w = ev.agg(min("ts").as("t0"), max("ts").as("t1"))
        .select(explode(expr(s"sequence(0L, (t1 - t0) div $W)")).as("w_id"), col("t0"))
        .select(col("w_id"), (col("t0") + col("w_id") * lit(W)).as("ws"))
        .withColumn("we", col("ws") + lit(L))
      val ab = a.withColumn("bucket", explode(expr(s"sequence(s div $G, e div $G)")))
      val wb = w.withColumn("bucket", explode(expr(s"sequence(ws div $G, we div $G)")))
      ab.join(wb, "bucket")
        .filter(col("s") <= col("we") && col("ws") <= col("e"))
        .select(col("user_id"), col("day"), col("w_id"),
          expr("(least(e, we) - greatest(s, ws)) div 1000").as("overlap_us"))
        .distinct()
        .orderBy("user_id", "day", "w_id")
    }
  }

  /** Star-schema revenue rollup — the canonical warehouse join chain
    * (fact ⋈ orders ⋈ customer ⋈ nation ⋈ region) that the reference's
    * single-table archive feeds once it lands in a lakehouse. Plan shape
    * at 100 TB: exactly ONE big-big exchange (lineitem ⋈ orders on the
    * order key — sort-merge at scale, and the key both tables should be
    * bucketed on); the dimension hops are explicit broadcasts so the
    * fact rows never shuffle again after the first join. nation/region
    * broadcast at any scale; customer is the borderline dim — it fits a
    * few-GB broadcast budget to ~10⁸ rows, beyond which that hop becomes
    * the plan's second bucketed join (drop the hint, AQE picks SMJ).
    * Revenue snaps to integer cents per row (identical expression tree
    * both engines) before the order-free sum.
    */
  val joinStarRevenue: Op = Op.sql(
    "join-star-revenue",
    """SELECT r_name, n_name, count(*) AS n_items,
      |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
      |            AS BIGINT) AS revenue_cents
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin
  ) { (s, d) =>
    val li = Tables.lineitem(s, d).select(col("l_orderkey"),
      expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)").as("cents"))
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
    val r = Tables.region(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_items"), sum("cents").as("revenue_cents"))
      .orderBy("r_name", "n_name")
  }

  /** MERGE/upsert — the lakehouse table-maintenance primitive (Delta
    * MERGE INTO, Iceberg upsert) the reference approximates with its
    * skip-existing + fix cycle (create-if-absent then heal,
    * src/command/fix.rs:39-69): a base snapshot keyed by user absorbs a
    * delta batch; matched keys update (counters add, last-seen takes the
    * max), unmatched delta keys insert, untouched base rows carry over
    * with their state intact. The split anchor (first 15 days = base,
    * rest = delta) comes from a 1-row broadcast of the global min ts.
    *
    * Scale shape: both sides reduce to per-key states map-side BEFORE
    * the merge, so the full-outer join — the honest MERGE shuffle —
    * moves key-state rows, not events. At rest the base would be
    * bucketed by user_id and the join co-located; engines with file
    * pruning skip base files whose key zones miss the delta
    * (index-zonemap is exactly that grade).
    */
  val joinMergeUpsert: Op = Op.sql(
    "join-merge-upsert",
    """WITH g AS (SELECT min(epoch_ns(ts)) // 86400000000000 + 15 AS split_day
      |           FROM events),
      |base AS (SELECT user_id, count(*) AS n,
      |                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
      |                max(epoch_ns(ts) // 1000) AS last_us
      |         FROM events, g
      |         WHERE epoch_ns(ts) // 86400000000000 < split_day
      |         GROUP BY user_id),
      |delta AS (SELECT user_id, count(*) AS n,
      |                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
      |                 max(epoch_ns(ts) // 1000) AS last_us
      |          FROM events, g
      |          WHERE epoch_ns(ts) // 86400000000000 >= split_day
      |          GROUP BY user_id)
      |SELECT COALESCE(b.user_id, d.user_id) AS user_id,
      |       CASE WHEN b.user_id IS NULL THEN 'inserted'
      |            WHEN d.user_id IS NULL THEN 'unchanged'
      |            ELSE 'updated' END AS status,
      |       COALESCE(b.n, 0) + COALESCE(d.n, 0) AS n,
      |       COALESCE(b.cents, 0) + COALESCE(d.cents, 0) AS cents,
      |       GREATEST(COALESCE(b.last_us, 0), COALESCE(d.last_us, 0)) AS last_us
      |FROM base b FULL OUTER JOIN delta d USING (user_id)
      |ORDER BY user_id""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val g = ev.agg((min(expr("ts div 86400000000000")) + 15).as("split_day"))
    val withDay = ev.crossJoin(broadcast(g))
      .select(col("user_id"), col("value"), col("ts"),
        (expr("ts div 86400000000000") < col("split_day")).as("is_base"))
    def state(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("user_id").agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100) as bigint)")).as("cents"),
        max(expr("ts div 1000")).as("last_us"))
    val base = state(withDay.filter(col("is_base")))
    val delta = state(withDay.filter(!col("is_base")))
    base.as("b").join(delta.as("d"),
        col("b.user_id") === col("d.user_id"), "full_outer")
      .select(
        coalesce(col("b.user_id"), col("d.user_id")).as("user_id"),
        when(col("b.user_id").isNull, "inserted")
          .when(col("d.user_id").isNull, "unchanged")
          .otherwise("updated").as("status"),
        (coalesce(col("b.n"), lit(0L)) + coalesce(col("d.n"), lit(0L))).as("n"),
        (coalesce(col("b.cents"), lit(0L)) + coalesce(col("d.cents"), lit(0L))).as("cents"),
        greatest(coalesce(col("b.last_us"), lit(0L)),
          coalesce(col("d.last_us"), lit(0L))).as("last_us"))
      .orderBy("user_id")
  }

  /** Salted equi-join: the skew-mitigation shape for a fact⋈dim join whose
    * key distribution is heavy-tailed (one hot user lands an entire reducer
    * at 100 TB). The dim side replicates 8× (one row per salt), the fact
    * side picks a salt by hashing a NON-key column, and the join runs on
    * (key, salt) — so the hottest key's rows spread over 8 reducers instead
    * of one. The salt provably cannot change the result: every fact row
    * still matches exactly one dim replica. The oracle is the UNSALTED
    * join+agg — identical output is the exactness proof.
    *
    * Compare AQE's skewedJoin (runtime split of oversized sort-merge
    * partitions): salting is the static variant that also covers
    * hash-aggregate skew and works when AQE cannot re-plan (streaming,
    * bucketed tables). Per-event value snaps to integer cents BEFORE the
    * sum so reducer order cannot move the hash.
    */
  val joinSkewSalted: Op = Op.sql(
    "join-skew-salted",
    """WITH dim AS (SELECT DISTINCT user_id, user_id % 10 AS segment FROM events)
      |SELECT dim.segment,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events e JOIN dim ON e.user_id = dim.user_id
      |GROUP BY dim.segment ORDER BY dim.segment""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val dim = ev.select("user_id").distinct()
      .withColumn("segment", col("user_id") % 10)
    val saltedDim = dim.withColumn("salt",
      explode(sequence(lit(0), lit(7))))
    ev.select(col("user_id"), col("event_id"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(8)).cast("int"))
      .join(saltedDim, Seq("user_id", "salt"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n"), sum("cents").as("value_cents"))
      .orderBy("segment")
  }

  /** As-of join with a STALENESS TOLERANCE — the production variant of
    * join-asof every feature/attribution pipeline actually runs: a match
    * older than the tolerance (2 h here) is worse than no match (stale
    * features poison training; stale clicks mis-credit campaigns), so
    * each purchase lands in exactly one of attributed / stale /
    * unmatched. Same single user-partitioned arrival-order window as
    * join-asof (no join at all); the tolerance is a post-window
    * predicate, so ANY tolerance re-uses the one windowed pass. Output
    * is the one-row coverage report with micro-snapped shares.
    */
  val joinAsofTolerance: Op = Op.sql(
    "join-asof-tolerance",
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |m AS (SELECT p.event_id, p.ts AS p_ts,
      |             max(CASE WHEN c.event_id IS NULL THEN NULL
      |                      ELSE struct_pack(ts := c.ts, id := c.event_id) END) AS best
      |      FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
      |      GROUP BY 1, 2),
      |g AS (SELECT CASE
      |               WHEN best IS NULL THEN 'unmatched'
      |               WHEN epoch_us(p_ts) - epoch_us(best.ts) <= 7200000000 THEN 'attributed'
      |               ELSE 'stale' END AS fate
      |      FROM m),
      |t AS (SELECT count(*) AS n FROM g)
      |SELECT fate, count(*) AS n_purchases,
      |       CAST(round(count(*) * 1000000.0 / t.n) AS BIGINT) AS share_micro
      |FROM g, t GROUP BY fate, t.n ORDER BY fate""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val tolUs = 7200000000L
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"),
        when(col("event_type") === "click", 0).otherwise(1), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val click = when(col("event_type") === "click",
      struct(col("ts_us"), col("event_id"))).otherwise(lit(null))
    val fates = ev.withColumn("best", last(click, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(when(col("best").isNull, "unmatched")
        .when(col("ts_us") - col("best.ts_us") <= tolUs, "attributed")
        .otherwise("stale").as("fate"))
    val tot = fates.agg(count(lit(1)).as("n"))
    fates.groupBy("fate").agg(count(lit(1)).as("n_purchases"))
      .crossJoin(broadcast(tot))
      .select(col("fate"), col("n_purchases"),
        round(col("n_purchases") * lit(1000000.0) / col("n")).cast("long")
          .as("share_micro"))
      .orderBy("fate")
  }

  /** Bloom-pruned big-big join: before shuffling the fact side into an
    * equi-join, a 3-hash bloom filter built from the (filtered) build
    * side's keys screens fact rows map-side — the shuffle then carries
    * only probable matches. The hash family is modular multiplication
    * (mod-first, so key·mult never overflows at any key range), identical
    * in both engines, so the prune is deterministic and the false-positive
    * overhead is directly observable: n_bloom_pass − n_join_rows is what
    * the bloom let through for nothing. The op's contract is the proof
    * obligation of every runtime-filter optimizer: the pruned join equals
    * the unpruned one (the oracle computes the join without the bloom).
    *
    * Scale shape: the three position sets are build-key-sized and
    * BROADCAST; the prune is three broadcast lookups inside the fact
    * scan's codegen stage (no exchange); the final join is hinted MERGE to
    * model the big-big case where neither side broadcasts — at 100 TB the
    * win is the shuffle-byte cut on the fact exchange (here ~4/5 of rows
    * drop map-side). The stats branch is one map-side aggregation.
    */
  val joinBloomPrune: Op = Op.sql(
    "join-bloom-prune",
    """WITH bk AS (SELECT DISTINCT o_orderkey AS k FROM orders
      |            WHERE o_orderpriority = '1-URGENT'),
      |b1 AS (SELECT DISTINCT ((k % 1000003) * 31415) % 1000003 AS p FROM bk),
      |b2 AS (SELECT DISTINCT ((k % 999983) * 27183) % 999983 AS p FROM bk),
      |b3 AS (SELECT DISTINCT ((k % 999979) * 9973) % 4096 AS p FROM bk),
      |f AS (SELECT l_orderkey AS k,
      |             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |             ((l_orderkey % 1000003) * 31415) % 1000003 AS p1,
      |             ((l_orderkey % 999983) * 27183) % 999983 AS p2,
      |             ((l_orderkey % 999979) * 9973) % 4096 AS p3
      |      FROM lineitem),
      |fp AS (SELECT f.k, f.cents,
      |              CASE WHEN b1.p IS NOT NULL AND b2.p IS NOT NULL
      |                    AND b3.p IS NOT NULL THEN 1 ELSE 0 END AS pass
      |       FROM f LEFT JOIN b1 ON f.p1 = b1.p
      |              LEFT JOIN b2 ON f.p2 = b2.p
      |              LEFT JOIN b3 ON f.p3 = b3.p),
      |stats AS (SELECT count(*) AS n_fact,
      |                 CAST(sum(pass) AS BIGINT) AS n_bloom_pass FROM fp),
      |j AS (SELECT count(*) AS n_join_rows,
      |             CAST(coalesce(sum(f.cents), 0) AS BIGINT) AS revenue_cents
      |      FROM f JOIN bk ON f.k = bk.k)
      |SELECT s.n_fact, s.n_bloom_pass, j.n_join_rows, j.revenue_cents
      |FROM stats s, j""".stripMargin
  ) { (s, d) =>
    def h(k: org.apache.spark.sql.Column, mult: Long, mod: Long) =
      ((k % mod) * mult) % mod
    // third family maps into a smaller space on purpose: a visibly lossier
    // hash keeps the false-positive column non-degenerate at fixture scale
    def h3(k: org.apache.spark.sql.Column) = ((k % 999979L) * 9973L) % 4096L
    val bk = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("k")).distinct()
    def bits(pos: org.apache.spark.sql.Column, name: String) =
      broadcast(bk.select(pos.as(name)).distinct()
        .withColumn(s"${name}_hit", lit(1)))
    val fact = Tables.lineitem(s, d).select(col("l_orderkey").as("k"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .withColumn("p1", h(col("k"), 31415L, 1000003L))
      .withColumn("p2", h(col("k"), 27183L, 999983L))
      .withColumn("p3", h3(col("k")))
    val screened = fact
      .join(bits(h(col("k"), 31415L, 1000003L), "p1"), Seq("p1"), "left")
      .join(bits(h(col("k"), 27183L, 999983L), "p2"), Seq("p2"), "left")
      .join(bits(h3(col("k")), "p3"), Seq("p3"), "left")
      .withColumn("pass",
        when(col("p1_hit").isNotNull && col("p2_hit").isNotNull &&
          col("p3_hit").isNotNull, 1L).otherwise(0L))
    val stats = screened.agg(count(lit(1)).as("n_fact"),
      sum("pass").cast("long").as("n_bloom_pass"))
    val joined = screened.filter(col("pass") === 1L)
      .join(bk.hint("merge"), Seq("k"))
      .agg(count(lit(1)).as("n_join_rows"),
        coalesce(sum("cents"), lit(0L)).cast("long").as("revenue_cents"))
    stats.crossJoin(broadcast(joined))
  }

  /** The local-supplier revenue rollup (the TPC-H Q5 join shape): revenue
    * per nation from line items whose CUSTOMER and SUPPLIER share that
    * nation, within one region — the canonical snowflake traversal with
    * a same-nation equality BETWEEN two dimension paths. Revenue is exact
    * integer centi-cents (price cents × (100 − discount cents)).
    *
    * Scale shape: ONE big-big exchange (lineitem ⋈ orders on the order
    * key — the bucketing key at rest, see layout-bucketed-join); every
    * dimension hop (customer, supplier, nation, region) BROADCASTS, and
    * the region filter prunes nations before the fact join, so the
    * same-nation check rides the broadcast hash joins — the fact table
    * never shuffles on a dimension key.
    */
  val joinLocalSupplier: Op = Op.sql(
    "join-local-supplier",
    """SELECT n.n_name,
      |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
      |                (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
      |         AS BIGINT) AS revenue_cc,
      |       count(*) AS n_items
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |              AND c.c_nationkey = s.s_nationkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |GROUP BY n.n_name ORDER BY n_name""".stripMargin
  ) { (s, d) =>
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
      round(col("l_extendedprice") * 100).cast("long").as("price_c"),
      round(col("l_discount") * 100).cast("long").as("disc_c"))
    val asiaNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    li.join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("price_c") * (lit(100L) - col("disc_c"))).cast("long")
        .as("revenue_cc"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Join-cardinality estimator calibration — the optimizer-statistics
    * audit run before trusting any cost-based plan choice: the EXACT
    * orders ⋈ customer output size next to the two estimates a planner
    * can afford, (a) a 512-bucket key histogram (upper-bounds the true
    * size; tight when buckets are near-single-key) and (b) the
    * independence/containment formula |A|·|B| / max(ndv_A, ndv_B) every
    * textbook optimizer starts from. Signed error in basis points makes
    * the over/under direction visible. All integers (counts, products,
    * one integer division each).
    *
    * Scale shape: per-key counts are map-side-combined groupBys; the
    * exact term joins the two KEY-GRAINED count tables (key-domain-sized,
    * not row-sized); the bucket histogram is 512 rows and broadcasts.
    */
  val joinCardEstimate: Op = Op.sql(
    "join-card-estimate",
    """WITH a AS (SELECT o_custkey AS k, count(*) AS ca FROM orders GROUP BY k),
      |b AS (SELECT c_custkey AS k, count(*) AS cb FROM customer GROUP BY k),
      |ex AS (SELECT CAST(sum(a.ca * b.cb) AS BIGINT) AS n_exact
      |       FROM a JOIN b ON a.k = b.k),
      |ha AS (SELECT k % 512 AS bk, CAST(sum(ca) AS BIGINT) AS ca FROM a GROUP BY bk),
      |hb AS (SELECT k % 512 AS bk, CAST(sum(cb) AS BIGINT) AS cb FROM b GROUP BY bk),
      |bu AS (SELECT CAST(sum(ha.ca * hb.cb) AS BIGINT) AS n_bucket
      |       FROM ha JOIN hb ON ha.bk = hb.bk),
      |ind AS (SELECT CAST((SELECT CAST(sum(ca) AS BIGINT) FROM a) *
      |                    (SELECT CAST(sum(cb) AS BIGINT) FROM b) //
      |                    greatest((SELECT count(*) FROM a),
      |                             (SELECT count(*) FROM b)) AS BIGINT) AS n_indep)
      |SELECT ex.n_exact, bu.n_bucket, ind.n_indep,
      |       CAST((bu.n_bucket - ex.n_exact) * 10000 // ex.n_exact AS BIGINT)
      |         AS bucket_err_bp,
      |       CAST((ind.n_indep - ex.n_exact) * 10000 // ex.n_exact AS BIGINT)
      |         AS indep_err_bp
      |FROM ex, bu, ind""".stripMargin
  ) { (s, d) =>
    val a = Tables.orders(s, d).groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("ca"))
    val b = Tables.customer(s, d).groupBy(col("c_custkey").as("k"))
      .agg(count(lit(1)).as("cb"))
    val ex = a.join(b, Seq("k"))
      .agg(sum(col("ca") * col("cb")).cast("long").as("n_exact"))
    val ha = a.groupBy((col("k") % 512).as("bk")).agg(sum("ca").cast("long").as("ca"))
    val hb = b.groupBy((col("k") % 512).as("bk")).agg(sum("cb").cast("long").as("cb"))
    val bu = ha.join(broadcast(hb), Seq("bk"))
      .agg(sum(col("ca") * col("cb")).cast("long").as("n_bucket"))
    val ind = a.agg(sum("ca").cast("long").as("na"), count(lit(1)).as("da"))
      .crossJoin(b.agg(sum("cb").cast("long").as("nb"), count(lit(1)).as("db")))
      .select(expr("(na * nb) div greatest(da, db)").as("n_indep"))
    ex.crossJoin(broadcast(bu)).crossJoin(broadcast(ind))
      .select(col("n_exact"), col("n_bucket"), col("n_indep"),
        expr("((n_bucket - n_exact) * 10000) div n_exact").as("bucket_err_bp"),
        expr("((n_indep - n_exact) * 10000) div n_exact").as("indep_err_bp"))
  }

  /** Late-arriving-dimension audit: facts joined against the dims that
    * have ARRIVED (here: customers with key % 10 ≠ 0 play the synced
    * subset), rolled up per order month — resolved vs unresolved counts
    * and the unresolved share in basis points. This is the
    * reconciliation table a warehouse loader emits every cycle so the
    * re-resolution job knows which months to re-join when the stragglers
    * land (the time-bucketed generalization of anti-join-missing).
    *
    * Scale shape: the dim key set BROADCASTS (keys only, not payload);
    * the fact side folds to the month grain in the same pass — one scan,
    * one catalog-sized exchange, no row-sized shuffle join.
    */
  val joinDimLate: Op = Op.sql(
    "join-dim-late",
    """WITH arrived AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 <> 0)
      |SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
      |       count(*) AS n_orders,
      |       CAST(sum(CASE WHEN a.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_unresolved,
      |       CAST((sum(CASE WHEN a.c_custkey IS NULL THEN 1 ELSE 0 END) * 10000)
      |            // count(*) AS BIGINT) AS unresolved_bp
      |FROM orders o LEFT JOIN arrived a ON o.o_custkey = a.c_custkey
      |GROUP BY month ORDER BY month""".stripMargin
  ) { (s, d) =>
    val arrived = Tables.customer(s, d)
      .filter(col("c_custkey") % 10 =!= 0)
      .select("c_custkey")
    Tables.orders(s, d)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_custkey"))
      .join(broadcast(arrived), col("o_custkey") === col("c_custkey"), "left")
      .groupBy("month")
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).cast("long")
          .as("n_unresolved"))
      .withColumn("unresolved_bp",
        expr("(n_unresolved * 10000) div n_orders"))
      .orderBy("month")
  }

  /** Join fan-out profile: the distribution of lineitems per order —
    * count histogram plus each depth's row share in basis points, and
    * childless orders as depth 0. This is the empirical per-key fan-out
    * behind join-card-estimate's totals: the max depth bounds worst-case
    * row amplification, the histogram shape decides whether a skew-salted
    * join is warranted (a flat profile never is), and depth-0 mass is
    * referential slack.
    *
    * Scale shape: one key-grained count (map-side combine) from a LEFT
    * join of keys onto the fact — childless keys survive — then a
    * depth-sized histogram fold with a broadcast total.
    */
  val joinFanoutProfile: Op = Op.sql(
    "join-fanout-profile",
    """WITH c AS (SELECT o.o_orderkey,
      |                  count(l.l_orderkey) AS n_items
      |           FROM orders o LEFT JOIN lineitem l
      |             ON l.l_orderkey = o.o_orderkey
      |           GROUP BY o.o_orderkey),
      |h AS (SELECT n_items, count(*) AS n_orders FROM c GROUP BY n_items),
      |t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM h)
      |SELECT CAST(h.n_items AS BIGINT) AS n_items, h.n_orders,
      |       CAST((h.n_orders * 10000) // t.total AS BIGINT) AS share_bp
      |FROM h, t ORDER BY n_items""".stripMargin
  ) { (s, d) =>
    // Aggregate BEFORE the join (round 13, §2.3): counting lineitem per
    // key first reduces the fact side map-side to order-grain partials,
    // so the join shuffles one row per key instead of every lineitem row
    // (the old left-join-then-count shape shuffled the whole fact table).
    // count(l_orderkey) over a no-match group was 0; coalesce keeps that.
    val lc = Tables.lineitem(s, d).select(col("l_orderkey"))
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    val c = Tables.orders(s, d).select(col("o_orderkey"))
      .join(lc, col("l_orderkey") === col("o_orderkey"), "left")
      .select(col("o_orderkey"), coalesce(col("n"), lit(0L)).as("n_items"))
    val h = c.groupBy(col("n_items").cast("long").as("n_items"))
      .agg(count(lit(1)).as("n_orders"))
    val t = h.agg(sum("n_orders").cast("long").as("total"))
    h.crossJoin(broadcast(t))
      .select(col("n_items"), col("n_orders"),
        expr("(n_orders * 10000) div total").as("share_bp"))
      .orderBy("n_items")
  }

  /** Allen-relation census over the interval join: every intersecting or
    * touching (activity-interval, window) pair from join-interval-
    * overlap's bucketed join, classified into Allen's interval algebra
    * (equals/meets/met_by/starts/started_by/finishes/finished_by/
    * during/contains/overlaps/overlapped_by) by one mutually-exclusive
    * CASE ladder written identically on both engines. The census is the
    * temporal-reasoning summary a scheduling/billing audit reads:
    * `contains` mass is activity fully covering a window (bill the whole
    * window), `during` is windows covering activity (one window
    * suffices), the rare exact-boundary classes flag clock-aligned
    * artifacts. Disjoint relations (before/after) are deliberately out —
    * counting them is the unbounded cross product.
    *
    * Scale shape: identical to join-interval-overlap (explode to 6h
    * buckets, 8-byte equi-join, exact predicate, DISTINCT collapses
    * multi-bucket matches); classification is a projection and the
    * census a ≤11-row map-side-combined groupBy.
    */
  val intervalAllenCensus: Op = {
    val G = 21600000000000L
    val W = 25200000000000L
    val L = 14400000000000L
    val caseSql =
      """CASE WHEN s = ws AND e = we THEN 'equals'
        |     WHEN e = ws THEN 'meets'
        |     WHEN s = we THEN 'met_by'
        |     WHEN s = ws AND e < we THEN 'starts'
        |     WHEN s = ws THEN 'started_by'
        |     WHEN e = we AND s > ws THEN 'finishes'
        |     WHEN e = we THEN 'finished_by'
        |     WHEN s > ws AND e < we THEN 'during'
        |     WHEN s < ws AND e > we THEN 'contains'
        |     WHEN s < ws THEN 'overlaps'
        |     ELSE 'overlapped_by' END""".stripMargin
    Op.sql(
      "interval-allen-census",
      s"""WITH a AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
         |                  min(epoch_ns(ts)) AS s, max(epoch_ns(ts)) AS e
         |           FROM events GROUP BY user_id, day),
         |g AS (SELECT min(epoch_ns(ts)) AS t0, max(epoch_ns(ts)) AS t1 FROM events),
         |wi AS (SELECT unnest(generate_series(0, CAST((t1 - t0) // $W AS BIGINT))) AS w_id,
         |              t0 FROM g),
         |w AS (SELECT w_id, t0 + w_id * $W AS ws, t0 + w_id * $W + $L AS we FROM wi),
         |p AS (SELECT a.user_id, a.day, w.w_id, a.s, a.e, w.ws, w.we
         |      FROM a JOIN w ON a.s <= w.we AND w.ws <= a.e)
         |SELECT $caseSql AS relation, count(*) AS n_pairs
         |FROM p GROUP BY relation ORDER BY relation""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
      val a = ev.groupBy(col("user_id"), expr("ts div 86400000000000").as("day"))
        .agg(min("ts").as("s"), max("ts").as("e"))
      val w = ev.agg(min("ts").as("t0"), max("ts").as("t1"))
        .select(explode(expr(s"sequence(0L, (t1 - t0) div $W)")).as("w_id"), col("t0"))
        .select(col("w_id"), (col("t0") + col("w_id") * lit(W)).as("ws"))
        .withColumn("we", col("ws") + lit(L))
      val ab = a.withColumn("bucket", explode(expr(s"sequence(s div $G, e div $G)")))
      val wb = w.withColumn("bucket", explode(expr(s"sequence(ws div $G, we div $G)")))
      ab.join(wb, "bucket")
        .filter(col("s") <= col("we") && col("ws") <= col("e"))
        .select("user_id", "day", "w_id", "s", "e", "ws", "we")
        .distinct()
        .select(expr(caseSql).as("relation"))
        .groupBy("relation").agg(count(lit(1)).as("n_pairs"))
        .orderBy("relation")
    }
  }

  /** Null-key bypass join — the production spelling of a LEFT join whose
    * key column is nullable (here: every 50th order's custkey is NULL,
    * the unresolved-reference shape of late-arriving dims): null keys can
    * never match, yet the naive plan still ships them through the
    * exchange where hash(NULL) lands EVERY null row in one partition —
    * the classic null-skew straggler. This spelling splits the stream:
    * non-null rows take the join, null rows bypass it entirely and union
    * back with null-filled right-side columns — same rows, no straggler.
    * Output is the per-month reconciliation (orders, matched, null-key).
    *
    * Scale shape: the join input carries an isnotnull filter, so the
    * exchange never sees a null key; the bypass branch is a filter +
    * projection (no shuffle at all); both feed one map-side-combined
    * month rollup. With a dim-sized right side AQE broadcasts and the
    * point is moot — the pattern is for big-big left joins where it is
    * not.
    */
  val joinNullBypass: Op = Op.sql(
    "join-null-bypass",
    """WITH o AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |                  CASE WHEN o_custkey % 50 = 0 THEN NULL
      |                       ELSE o_custkey END AS k
      |           FROM orders)
      |SELECT month, count(*) AS n_orders,
      |       CAST(sum(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_matched,
      |       CAST(sum(CASE WHEN o.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_null_key
      |FROM o LEFT JOIN customer c ON o.k = c.c_custkey
      |GROUP BY month ORDER BY month""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        when(col("o_custkey") % 50 === 0, lit(null).cast("long"))
          .otherwise(col("o_custkey")).as("k"))
    val c = Tables.customer(s, d).select(col("c_custkey"))
    val joined = o.filter(col("k").isNotNull)
      .join(c, col("k") === col("c_custkey"), "left")
    val bypass = o.filter(col("k").isNull)
      .withColumn("c_custkey", lit(null).cast("long"))
    joined.unionByName(bypass)
      .groupBy("month")
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("c_custkey").isNotNull, 1L).otherwise(0L)).cast("long")
          .as("n_matched"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).cast("long")
          .as("n_null_key"))
      .orderBy("month")
  }

  val ops: Seq[Op] = Seq(joinTxExpected, groupTables, semiJoinFork,
    intervalSubtract, intervalUnion, unionListings, intersectTables,
    joinAsof, joinRangeBin, joinIntervalOverlap, joinStarRevenue,
    joinMergeUpsert, joinSkewSalted, joinAsofTolerance, joinBloomPrune,
    joinLocalSupplier, joinCardEstimate, joinDimLate, joinFanoutProfile,
    joinNullBypass, intervalAllenCensus)
}
