package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Sorts / limits / top-k / windows (SURVEY.md §2.5).
  *
  * The chain-link check is deliberately a self-equi-join on (height = height+1)
  * rather than a global-order `lag` window: the join shuffles by height and
  * scales to any cluster width, while a single un-partitioned window funnels
  * everything through one task (reference semantics:
  * src/blockchain/block_seq.rs:58-180).
  */
object WindowOps {

  /** Restore height order after parallel fetches
    * (reference: src/archiver/block.rs:62-72).
    */
  val sortByHeight: Op = Op.sql(
    "sort-by-height",
    "SELECT o_orderkey AS height, o_totalprice FROM orders ORDER BY height"
  ) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey").as("height"), col("o_totalprice"))
      .orderBy("height")
  }

  /** k-way merge of sorted streams (reference: src/storage/sorted_files.rs:6-44)
    * — Spark's sort-merge does the interleave; the tag keeps provenance.
    */
  val mergeSorted: Op = Op.sql(
    "merge-sorted",
    """SELECT * FROM (
      |  SELECT 'even' AS src, o_orderkey AS k FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT 'odd' AS src, o_orderkey AS k FROM orders WHERE o_orderkey % 2 = 1)
      |ORDER BY k, src""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d)
    val even = o.filter(col("o_orderkey") % 2 === 0)
      .select(lit("even").as("src"), col("o_orderkey").as("k"))
    val odd = o.filter(col("o_orderkey") % 2 === 1)
      .select(lit("odd").as("src"), col("o_orderkey").as("k"))
    even.union(odd).orderBy("k", "src")
  }

  /** `max_by_key(range.len)` among duplicates → top-k per group
    * (reference: src/command/verify.rs:385-387). The sort covers every
    * output column, so tie groups are value-identical across engines.
    *
    * Two-phase (salted) top-k: the group key (`l_returnflag`) has only 3
    * distinct values, so a single `row_number` window would funnel the
    * whole table through 3 tasks. Phase 1 takes top-k per (salt, key) —
    * the shuffle spreads over `salts × keys` partitions — phase 2 takes
    * the final top-k over at most `k · salts` rows per key. A row in the
    * global top-k is necessarily in the top-k of its own salt bucket, so
    * the result is exact.
    */
  val topkLargestGroup: Op = Op.sql(
    "topk-largest-group",
    """SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber FROM (
      |  SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
      |         row_number() OVER (PARTITION BY l_returnflag
      |           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem) t
      |WHERE rn <= 3 ORDER BY l_returnflag, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    // prune to the 4 consumed columns BEFORE the salted windows: the
    // whole input flows through phase 1's exchange, and carrying the
    // other 7 lineitem columns tripled its bytes (scaling-harness fix;
    // the column prune alone cut the sf1 time ~2x)
    topkPerGroup(
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"),
      groupCols = Seq("l_returnflag"),
      orderCols = Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc),
      k = 3)
      .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
      .orderBy(col("l_returnflag"), col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
  }

  /** Shared salted two-phase top-k — see [[graft.functions.TopK]]. */
  private[graft] def topkPerGroup(
      df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column],
      k: Int,
      salts: Int = 64): org.apache.spark.sql.DataFrame =
    graft.functions.TopK.topkPerGroup(df, groupCols, orderCols, k, salts)

  /** `--tail N` — last N heights below head−4 (reference:
    * src/archiver/blocks_config.rs:28-45). Two-job literal pattern: job 1
    * is a cheap single-column max, job 2 filters with LITERAL bounds so
    * the range reaches the parquet reader as PushedFilters and row-group
    * statistics prune everything but the tail — at 100 TB this is the
    * difference between reading ~one file and scanning the archive.
    */
  val tailN: Op = Op.sql(
    "tail-n",
    """SELECT o_orderkey AS height, o_totalprice
      |FROM orders CROSS JOIN (SELECT max(o_orderkey) AS head FROM orders)
      |WHERE o_orderkey BETWEEN head - 4 - 100 AND head - 4
      |ORDER BY height""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d)
    val head = o.agg(max("o_orderkey").cast("long")).head().getLong(0)
    o.filter(col("o_orderkey").between(lit(head - 4 - 100), lit(head - 4)))
      .select(col("o_orderkey").as("height"), col("o_totalprice"))
      .orderBy("height")
  }

  /** Block-sequence check: every parentId equals the previous height's
    * blockId (reference: src/blockchain/block_seq.rs:58-180,
    * src/command/verify.rs:858-896). Breaks are planted at h%50==0
    * (corrupted hash) and at the %7 gaps.
    */
  val winChainLink: Op = Op.sql(
    "win-chain-link",
    """WITH b AS (
      |  SELECT o_orderkey AS h,
      |         CASE WHEN o_orderkey % 50 = 0
      |              THEN md5(concat('x', CAST(o_orderkey AS VARCHAR)))
      |              ELSE md5(CAST(o_orderkey AS VARCHAR)) END AS blockId,
      |         md5(CAST(o_orderkey - 1 AS VARCHAR)) AS parentId
      |  FROM orders WHERE o_orderkey % 7 <> 0)
      |SELECT b.h AS height,
      |       (p.blockId IS NOT NULL AND b.parentId = p.blockId) AS linked
      |FROM b LEFT JOIN b p ON b.h = p.h + 1
      |ORDER BY height""".stripMargin
  ) { (s, d) =>
    val blocks = Tables.orders(s, d)
      .filter(col("o_orderkey") % 7 =!= 0)
      .select(
        col("o_orderkey").as("h"),
        when(col("o_orderkey") % 50 === 0,
          md5(concat(lit("x"), col("o_orderkey").cast("string"))))
          .otherwise(md5(col("o_orderkey").cast("string"))).as("blockId"),
        md5((col("o_orderkey") - 1).cast("string")).as("parentId"))
    val prev = blocks.select((col("h") + 1).as("h"), col("blockId").as("prevBlockId"))
    blocks.join(prev, Seq("h"), "left")
      .select(col("h").as("height"),
        (col("prevBlockId").isNotNull && col("parentId") === col("prevBlockId")).as("linked"))
      .orderBy("height")
  }

  /** Missing-height reporting as gap intervals between islands
    * (reference: src/command/verify.rs:869-877). The window runs over
    * island rows (already reduced), not raw heights.
    */
  val winGapDetect: Op = Op.sql(
    "win-gap-detect",
    """WITH arch AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 7 <> 0),
      |flags AS (SELECT k, CASE WHEN lag(k) OVER (ORDER BY k) IS NULL
      |                          OR k - lag(k) OVER (ORDER BY k) > 1
      |                         THEN 1 ELSE 0 END AS brk FROM arch),
      |isl AS (SELECT k, sum(brk) OVER (ORDER BY k) AS g FROM flags),
      |iv AS (SELECT min(k) AS s, max(k) AS e FROM isl GROUP BY g)
      |SELECT e + 1 AS gap_start, next_s - 1 AS gap_end, next_s - 1 - e AS gap_len
      |FROM (SELECT s, e, lead(s) OVER (ORDER BY s) AS next_s FROM iv) t
      |WHERE next_s IS NOT NULL ORDER BY gap_start""".stripMargin
  ) { (s, d) =>
    val arch = Tables.orders(s, d).filter(col("o_orderkey") % 7 =!= 0)
    val iv = Intervals.islands(arch, "o_orderkey")
    val w = Window.orderBy("s")
    iv.withColumn("next_s", lead("s", 1).over(w))
      .filter(col("next_s").isNotNull)
      .select(
        (col("e") + 1).as("gap_start"),
        (col("next_s") - 1).as("gap_end"),
        (col("next_s") - 1 - col("e")).as("gap_len"))
      .orderBy("gap_start")
  }

  /** `get_head` — highest height having exactly one candidate
    * (reference: src/blockchain/block_seq.rs:141-150).
    */
  val winHeadSelect: Op = Op.sql(
    "win-head-select",
    """SELECT max(h) AS head FROM (
      |  SELECT l_orderkey AS h FROM lineitem GROUP BY l_orderkey HAVING count(*) = 1) t""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("h"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") === 1)
      .agg(max("h").as("head"))
  }

  /** Gap-based sessionization (scale extension): user activity split into
    * sessions at >30-minute silences (session_window's boundary is
    * CLOSED: two events exactly gap apart still merge — fuzz-probed,
    * and the oracle's lag test is strict `>` to match) — the canonical
    * sessionize, done with Spark's NATIVE `session_window` aggregation in
    * batch (the same operator Structured Streaming uses for stateful
    * sessions, so this plan lifts to the streaming path unchanged).
    * Session bounds reported as the first/last event micros; values
    * snapped to integer cents before summing (order-free).
    *
    * Scale shape: session_window is one shuffle on user_id with
    * merge-on-overlap inside each partition — no self-join, no
    * O(diameter) iteration; AQE splits hot users.
    */
  val winSessionize: Op = Op.sql(
    "win-sessionize",
    """WITH g AS (
      |  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
      |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (SELECT user_id, ts, cents,
      |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM g)
      |SELECT user_id,
      |       CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
      |       CAST(epoch_us(max(ts)) AS BIGINT) AS end_us,
      |       count(*) AS n_events,
      |       CAST(sum(cents) AS BIGINT) AS value_cents
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, start_us""".stripMargin
  ) { (s, d) =>
    graft.streaming.Streams.sessionize(
      Tables.events(s, d)
        .select(col("user_id"), timestamp_micros(expr("ts div 1000")).as("tsc"),
          round(col("value") * 100).cast("long").as("cents")))
      .orderBy("user_id", "start_us")
  }

  /** Event-transition matrix (the first-order Markov view of user
    * behavior): for every (event_type → next event_type) pair across all
    * per-user timelines, the transition count and probability — the table
    * behind funnel discovery, anomaly baselines and session simulators.
    * Transition probability snaps at micro grain after one integer
    * division (row count / from-state total).
    *
    * Scale shape: the lead() window partitions by user_id — user-grained,
    * never a corpus funnel (the same shape win-sessionize relies on);
    * both aggregations reduce to the (types × types) grid with map-side
    * combine, and the from-state totals join onto the grid (grid-sized,
    * broadcastable).
    */
  val winNextEvent: Op = Op.sql(
    "win-next-event",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |tr AS (SELECT event_type, next_type, count(*) AS n FROM seq
      |       WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |ft AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_from FROM tr GROUP BY 1)
      |SELECT tr.event_type, tr.next_type, tr.n, ft.n_from,
      |       CAST(round(tr.n * 1000000.0 / ft.n_from) AS BIGINT) / 1000000.0 AS p
      |FROM tr JOIN ft USING (event_type)
      |ORDER BY event_type, next_type""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tr = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
    val ft = tr.groupBy("event_type").agg(sum("n").as("n_from"))
    tr.join(broadcast(ft), Seq("event_type"))
      .select(col("event_type"), col("next_type"), col("n"), col("n_from"),
        (round(col("n") * lit(1000000.0) / col("n_from")).cast("long") /
          lit(1000000.0)).as("p"))
      .orderBy("event_type", "next_type")
  }

  /** Top event paths (sequence mining at depth 3): the 20 most frequent
    * consecutive 3-event sequences across all per-user timelines — the
    * "what do users actually do" table behind funnel design, next to
    * win-next-event's order-1 transitions.
    *
    * Scale shape: two lead() columns over the same user-grained window
    * (ONE window sort serves both); the path aggregation reduces to the
    * types³ grid with map-side combine; top-20 is TakeOrderedAndProject
    * (per-partition partials — the grid is never globally sorted), and
    * the rank window runs over the capped 20 rows only.
    */
  val winTopPaths: Op = Op.sql(
    "win-top-paths",
    """WITH seq AS (
      |  SELECT event_type AS e1,
      |         lead(event_type, 1) OVER w AS e2,
      |         lead(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |p AS (SELECT e1, e2, e3, count(*) AS n FROM seq
      |      WHERE e3 IS NOT NULL GROUP BY 1, 2, 3),
      |rk AS (SELECT *, row_number() OVER (ORDER BY n DESC, e1, e2, e3) AS rank
      |       FROM p)
      |SELECT CAST(rank AS BIGINT) AS rank, e1, e2, e3, n
      |FROM rk WHERE rank <= 20 ORDER BY rank""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val paths = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("e1"))
      .withColumn("e2", lead("e1", 1).over(w))
      .withColumn("e3", lead("e1", 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(20)
    paths
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))).cast("long"))
      .select("rank", "e1", "e2", "e3", "n")
      .orderBy("rank")
  }

  /** Leading-edge debounce / frequency capping (event-stream cleaning):
    * collapse each burst — a maximal chain of same-(user, type) events
    * whose inter-event gap stays under the debounce window — to its first
    * occurrence plus the burst length. The double-click / retry-storm /
    * repeated-impression scrubber every event pipeline runs before
    * counting anything; complements win-sessionize (which groups at
    * 30-min grain for session analytics, not cleaning). The window is
    * grain-matched to the fixture's hours-to-days event spacing (24 h —
    * the impression-capping setting); production tunes it per signal.
    *
    * Scale shape: the gap-islands pattern over a (user, type)-grained
    * window — the same bounded-partition shape as win-sessionize; the
    * burst reduction is a groupBy with map-side combine.
    */
  val winDebounce: Op = Op.sql(
    "win-debounce",
    """WITH s AS (
      |  SELECT user_id, event_type, ts, event_id,
      |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w < 86400000000
      |              THEN 0 ELSE 1 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
      |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id, event_type
      |                               ORDER BY ts, event_id) AS grp FROM s)
      |SELECT user_id, event_type,
      |       CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
      |       count(*) AS burst_len
      |FROM g GROUP BY user_id, event_type, grp
      |ORDER BY user_id, event_type, first_us""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    val us = expr("ts div 1000")
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("brk",
        when(us - lag(us, 1).over(w) < 86400000000L, lit(0)).otherwise(lit(1)))
      .withColumn("grp", sum("brk").over(w))
      .groupBy("user_id", "event_type", "grp")
      .agg(min(us).cast("long").as("first_us"), count(lit(1)).as("burst_len"))
      .select("user_id", "event_type", "first_us", "burst_len")
      .orderBy("user_id", "event_type", "first_us")
  }

  /** Gap-length distribution over the archive's missing-height intervals
    * (win-gap-detect lists them; this prices them): how many gaps exist
    * at each length, with the missing-height mass per length — the table
    * that decides whether to heal with per-height fetches (many 1-gaps)
    * or range re-archives (few long gaps). Reference behavior:
    * src/command/fix.rs heals per missing height; the histogram is the
    * planning view over the same interval algebra.
    *
    * Scale shape: rides the same islands pyramid as win-gap-detect
    * (interval rows, never raw heights after the pyramid); the histogram
    * is one map-side-combined groupBy over the gap table.
    */
  val winGapHistogram: Op = Op.sql(
    "win-gap-histogram",
    """WITH arch AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 7 <> 0),
      |flags AS (SELECT k, CASE WHEN lag(k) OVER (ORDER BY k) IS NULL
      |                          OR k - lag(k) OVER (ORDER BY k) > 1
      |                         THEN 1 ELSE 0 END AS brk FROM arch),
      |isl AS (SELECT k, sum(brk) OVER (ORDER BY k) AS g FROM flags),
      |iv AS (SELECT min(k) AS s, max(k) AS e FROM isl GROUP BY g),
      |gaps AS (SELECT next_s - 1 - e AS gap_len
      |         FROM (SELECT s, e, lead(s) OVER (ORDER BY s) AS next_s FROM iv) t
      |         WHERE next_s IS NOT NULL)
      |SELECT CAST(gap_len AS BIGINT) AS gap_len, count(*) AS n_gaps,
      |       CAST(gap_len * count(*) AS BIGINT) AS missing_heights
      |FROM gaps GROUP BY gap_len ORDER BY gap_len""".stripMargin
  ) { (s, d) =>
    val arch = Tables.orders(s, d).filter(col("o_orderkey") % 7 =!= 0)
    val iv = Intervals.islands(arch, "o_orderkey")
    val w = Window.orderBy("s")
    iv.withColumn("next_s", lead("s", 1).over(w))
      .filter(col("next_s").isNotNull)
      .select((col("next_s") - 1 - col("e")).as("gap_len"))
      .groupBy("gap_len").agg(count(lit(1)).as("n_gaps"))
      .select(col("gap_len"), col("n_gaps"),
        (col("gap_len") * col("n_gaps")).as("missing_heights"))
      .orderBy("gap_len")
  }

  /** CUSUM changepoint detection over per-type daily event counts — the
    * drift monitor a production ingest runs to catch a source going dark
    * or doubling (the batch analogue of agg-rate-anomaly's per-hour
    * z-flags: CUSUM finds WHERE the level shifted, not just which hours
    * are odd). The classic statistic max_k |S_k − k·T/D| is scaled by D
    * to stay in exact integers: score_k = |D·S_k − k·T| (same argmax).
    * Windows run over the per-type DAILY table — bounded by the time
    * span, never by corpus size; ties break to the earliest day, so the
    * argmax row_number is deterministic cross-engine.
    */
  val winCusumChangepoint: Op = Op.sql(
    "win-cusum-changepoint",
    """WITH c AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
      |                  count(*) AS n
      |           FROM events GROUP BY event_type, day),
      |w AS (SELECT event_type, day, n,
      |             sum(n) OVER (PARTITION BY event_type ORDER BY day) AS cum,
      |             row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
      |             CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total,
      |             count(*) OVER (PARTITION BY event_type) AS nd
      |      FROM c),
      |s AS (SELECT event_type, day, nd, total,
      |             abs(nd * cum - k * total) AS score,
      |             row_number() OVER (PARTITION BY event_type
      |               ORDER BY abs(nd * cum - k * total) DESC, day) AS pick
      |      FROM w)
      |SELECT event_type, day AS cp_day, CAST(score AS BIGINT) AS score,
      |       nd AS n_days, total
      |FROM s WHERE pick = 1 ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val c = Tables.events(s, d)
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy("event_type")
    val w = c
      .withColumn("cum", sum("n").over(byType.orderBy("day")))
      .withColumn("k", row_number().over(byType.orderBy("day")))
      .withColumn("total", sum("n").over(byType))
      .withColumn("nd", count(lit(1)).over(byType))
      .withColumn("score", abs(col("nd") * col("cum") - col("k") * col("total")))
    w.withColumn("pick",
        row_number().over(byType.orderBy(col("score").desc, col("day"))))
      .filter(col("pick") === 1)
      .select(col("event_type"), col("day").as("cp_day"), col("score"),
        col("nd").as("n_days"), col("total"))
      .orderBy("event_type")
  }

  /** Centered 7-day rolling median over per-type daily counts — the
    * robust trend smoother that pairs with win-cusum-changepoint
    * (changepoint says WHERE the level shifted; the rolling median is
    * the denoised level line monitoring dashboards plot). An aggregate
    * quantile as a window function over an explicit ROWS frame — exact
    * interpolated median, cross-engine equal, snapped last. Windows run
    * over the per-type DAILY table (span-bounded, never corpus-sized).
    */
  val winRollingMedian: Op = Op.sql(
    "win-rolling-median",
    """WITH c AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
      |                  count(*) AS n
      |           FROM events GROUP BY event_type, day)
      |SELECT event_type, day, n,
      |       CAST(round(quantile_cont(n, 0.5) OVER (
      |              PARTITION BY event_type ORDER BY day
      |              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) * 1000000)
      |            AS BIGINT) / 1000000.0 AS med7
      |FROM c ORDER BY event_type, day""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val c = Tables.events(s, d)
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    c.withColumn("med7",
        round(expr("percentile(n, 0.5D)").over(w) * lit(1000000)).cast("long") / lit(1e6))
      .orderBy("event_type", "day")
  }

  /** Last-touch attribution — every purchase's value is credited to the
    * user's most recent preceding non-purchase event ('direct' if none),
    * then revenue rolls up per channel. The as-of selection is ONE
    * user-partitioned running `last(ignoreNulls)` window over the merged
    * event stream (the join-asof pattern — never a per-purchase range
    * join); the rollup is channel-grained. Ordering (ts, is-purchase,
    * event_id) makes equal-timestamp credit deterministic on both
    * engines and matches the oracle's max(struct(ts, id)) pick.
    */
  val winAttribution: Op = Op.sql(
    "win-attribution",
    """WITH p AS (SELECT event_id, user_id, ts, value FROM events
      |           WHERE event_type = 'purchase'),
      |c AS (SELECT event_id, user_id, ts, event_type FROM events
      |      WHERE event_type <> 'purchase'),
      |m AS (SELECT p.event_id, p.value,
      |             max(CASE WHEN c.event_id IS NULL THEN NULL
      |                      ELSE struct_pack(ts := c.ts, id := c.event_id,
      |                                       ch := c.event_type) END) AS best
      |      FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
      |      GROUP BY 1, 2)
      |SELECT COALESCE(best.ch, 'direct') AS channel,
      |       count(*) AS n_purchases,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM m GROUP BY channel ORDER BY channel""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"),
        when(col("event_type") === "purchase", 1).otherwise(0), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touch = when(col("event_type") =!= "purchase",
      struct(col("ts"), col("event_id"), col("event_type").as("ch")))
      .otherwise(lit(null))
    ev.withColumn("best", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(coalesce(col("best.ch"), lit("direct")).as("channel"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"), sum("cents").as("cents"))
      .orderBy("channel")
  }

  /** Hour-of-day × day-of-week seasonality matrix — the load profile
    * capacity planning and anomaly baselines read (agg-rate-anomaly's
    * z-scores flag deviations FROM this matrix). One map-side-combined
    * groupBy to the 7×24 grain; the share denominator is a 1-row
    * broadcast. Bucket arithmetic is pure integer epoch math (epoch day
    * 0 = Thursday, so dow = (days + 4) % 7 with Sunday = 0 — identical
    * on both engines).
    */
  val winSeasonality: Op = Op.sql(
    "win-seasonality",
    """WITH e AS (SELECT (epoch_ns(ts) // 86400000000000 + 4) % 7 AS dow,
      |                  epoch_ns(ts) // 3600000000000 % 24 AS hod
      |           FROM events),
      |c AS (SELECT dow, hod, count(*) AS n FROM e GROUP BY dow, hod),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
      |SELECT dow, hod, n,
      |       CAST(round(CAST(n AS DOUBLE) * 1000000 / CAST(total AS DOUBLE))
      |            AS BIGINT) / 1000000.0 AS share
      |FROM c, t ORDER BY dow, hod""".stripMargin
  ) { (s, d) =>
    val c = Tables.events(s, d)
      .groupBy(expr("(ts div 86400000000000 + 4) % 7").as("dow"),
        expr("ts div 3600000000000 % 24").as("hod"))
      .agg(count(lit(1)).as("n"))
    val t = c.agg(sum("n").as("total"))
    c.crossJoin(broadcast(t))
      .select(col("dow"), col("hod"), col("n"),
        (round(col("n").cast("double") * lit(1000000) /
          col("total").cast("double")).cast("long") / lit(1e6)).as("share"))
      .orderBy("dow", "hod")
  }

  /** Fork run-length histogram — the reorg-depth planning view next to
    * win-gap-histogram's hole-length view: heights with multiple
    * candidate blocks (the fork set semi-join-fork settles, reference:
    * src/command/verify.rs:325-369) collapse into maximal CONSECUTIVE
    * runs, and the run-length distribution says how deep reorgs have cut
    * (one-off orphans vs multi-block rollbacks — which sets the stream
    * command's safe confirmation depth). Runs come from the bucketed
    * islands pyramid (ops/Intervals — never one global window over the
    * fork set); the histogram is one agg over island rows.
    */
  val winForkDepth: Op = Op.sql(
    "win-fork-depth",
    """WITH d AS (SELECT l_orderkey AS h FROM lineitem
      |           GROUP BY l_orderkey HAVING count(*) > 1),
      |g AS (SELECT h, h - row_number() OVER (ORDER BY h) AS grp FROM d),
      |runs AS (SELECT grp, count(*) AS depth FROM g GROUP BY grp)
      |SELECT depth, count(*) AS n_runs, depth * count(*) AS forked_heights
      |FROM runs GROUP BY depth ORDER BY depth""".stripMargin
  ) { (s, d) =>
    val dups = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("h"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .select("h")
    Intervals.islands(dups, "h")
      .select((col("e") - col("s") + 1).as("depth"))
      .groupBy("depth").agg(count(lit(1)).as("n_runs"))
      .select(col("depth"), col("n_runs"),
        (col("depth") * col("n_runs")).as("forked_heights"))
      .orderBy("depth")
  }

  /** Stationary distribution of the event-transition Markov chain
    * (win-next-event's matrix) by five unrolled power-iteration steps —
    * the long-run "where do users spend their time" vector behind the
    * transition probabilities. Iterative numerics are normally
    * irreproducible across engines (libm, summation order); here every
    * step is exact integer arithmetic: the matrix holds micro-unit
    * probabilities p6 = n·10⁶ // rowsum, the state vector stays in
    * micro-units, and each step is v'(j) = Σ v(i)·p6(i,j) // 10⁶ —
    * floor division, order-free integer sums, bit-identical everywhere.
    * The corpus is touched ONCE (the lead window); every iteration
    * joins the types-sized vector with the types²-sized broadcast
    * matrix. Floor leakage makes Σv6 drift a few ppm below 10⁶ per
    * step — documented, deterministic, and irrelevant to the ranking.
    */
  val aggMarkovStationary: Op = {
    val iters = 5
    val step = (i: Int) =>
      s"""v$i AS (SELECT p.next_type AS state,
         |        CAST(sum(v${i - 1}.v6 * p.p6) // 1000000 AS BIGINT) AS v6
         |        FROM v${i - 1} JOIN p ON v${i - 1}.state = p.event_type
         |        GROUP BY p.next_type)""".stripMargin
    Op.sql(
      "agg-markov-stationary",
      s"""WITH seq AS (
         |  SELECT user_id, event_type,
         |         lead(event_type) OVER (PARTITION BY user_id
         |                                ORDER BY ts, event_id) AS next_type
         |  FROM events),
         |tr AS (SELECT event_type, next_type, count(*) AS n FROM seq
         |       WHERE next_type IS NOT NULL GROUP BY 1, 2),
         |ft AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_from FROM tr GROUP BY 1),
         |p AS (SELECT tr.event_type, tr.next_type,
         |             tr.n * 1000000 // ft.n_from AS p6
         |      FROM tr JOIN ft USING (event_type)),
         |states AS (SELECT DISTINCT event_type AS state FROM tr),
         |v0 AS (SELECT state,
         |              CAST(1000000 // (SELECT count(*) FROM states) AS BIGINT) AS v6
         |       FROM states),
         |${(1 to iters).map(step).mkString(",\n")}
         |SELECT state, v6,
         |       CAST(v6 AS BIGINT) / 1000000.0 AS share
         |FROM v$iters ORDER BY state""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tr = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
      val ft = tr.groupBy("event_type").agg(sum("n").as("n_from"))
      val p = tr.join(broadcast(ft), Seq("event_type"))
        .select(col("event_type"), col("next_type"),
          expr("n * 1000000 div n_from").as("p6"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val states = p.select(col("event_type").as("state")).distinct()
      val nStates = states.crossJoin(states.agg(count(lit(1)).as("ns")))
      var v = nStates.select(col("state"), expr("1000000L div ns").as("v6")).distinct()
      for (_ <- 1 to iters) {
        v = v.join(broadcast(p), v("state") === p("event_type"))
          .groupBy(col("next_type").as("state2"))
          .agg(expr("cast(sum(v6 * p6) div 1000000 as bigint)").as("v6"))
          .withColumnRenamed("state2", "state")
      }
      v.select(col("state"), col("v6"),
          (col("v6").cast("long") / lit(1e6)).as("share"))
        .orderBy("state")
    }
  }

  /** Burst / rate-limit audit: per user, the trailing-6-hour event count at
    * every event (a RANGE frame over the event-time axis — the exact
    * semantics of a token-bucket rate check, evaluated offline), rolled up
    * to the per-user profile: peak trailing count, number of events that
    * arrived while the user was over the K=4 budget, and total events. The
    * flagged count is what a rate-limiting ingest (or an abuse gate in a
    * crawl pipeline) would have deferred or dropped.
    *
    * Scale shape: ONE shuffle on user_id; the RANGE frame is evaluated by
    * a single sliding pass per key (WindowExec keeps a moving frame — no
    * per-row rescan), and the rollup rides the same partitioning, so no
    * second exchange. All integer arithmetic on epoch-nanos.
    */
  val winBurstFlag: Op = Op.sql(
    "win-burst-flag",
    """WITH w AS (
      |  SELECT user_id,
      |         count(*) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)
      |           RANGE BETWEEN 21600000000000 PRECEDING AND CURRENT ROW) AS c
      |  FROM events)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(max(c) AS BIGINT) AS peak_6h,
      |       CAST(count(*) FILTER (WHERE c >= 4) AS BIGINT) AS n_burst
      |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"))
      .rangeBetween(-21600000000000L, 0L)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"))
      .withColumn("c", count(lit(1)).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max("c").as("peak_6h"),
        sum(when(col("c") >= 4, 1L).otherwise(0L)).as("n_burst"))
      .orderBy("user_id")
  }

  /** Hourly forward-fill (last observation carried forward) of the
    * per-type revenue series — the time-series gap-fill every downstream
    * consumer (rate anomaly, seasonality, changepoint) needs before it
    * can difference or z-score a sparse series. The corpus reduces
    * map-side to the (hour, type) grain FIRST; the dense grid explodes
    * from one min/max anchor row (sequence + distinct types), and the
    * fill window runs over GRID rows only — hours × types, never events.
    * Leading cells before a type's first observation stay null (LOCF has
    * nothing to carry); `is_observed` separates real from filled cells.
    */
  val winForwardFill: Op = Op.sql(
    "win-forward-fill",
    """WITH obs AS (
      |  SELECT epoch_us(ts) // 3600000000 AS hour_id, event_type,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY hour_id, event_type),
      |ext AS (SELECT min(hour_id) AS mn, max(hour_id) AS mx FROM obs),
      |grid AS (
      |  SELECT h.hour_id, t.event_type
      |  FROM (SELECT unnest(generate_series(mn, mx)) AS hour_id FROM ext) h,
      |       (SELECT DISTINCT event_type FROM obs) t),
      |j AS (SELECT g.hour_id, g.event_type, o.v
      |      FROM grid g LEFT JOIN obs o USING (hour_id, event_type))
      |SELECT hour_id, event_type,
      |       CAST(last_value(v IGNORE NULLS) OVER (
      |         PARTITION BY event_type ORDER BY hour_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS cents_filled,
      |       (v IS NOT NULL) AS is_observed
      |FROM j ORDER BY hour_id, event_type""".stripMargin
  ) { (s, d) =>
    val obs = Tables.events(s, d)
      .groupBy(expr("ts div 1000 div 3600000000").as("hour_id"),
        col("event_type"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
    val hours = obs.agg(min("hour_id").as("mn"), max("hour_id").as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("hour_id"))
    val grid = hours.crossJoin(obs.select("event_type").distinct())
    val w = Window.partitionBy("event_type").orderBy("hour_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("hour_id", "event_type"), "left")
      .select(col("hour_id"), col("event_type"),
        last("v", ignoreNulls = true).over(w).as("cents_filled"),
        col("v").isNotNull.as("is_observed"))
      .orderBy("hour_id", "event_type")
  }

  /** Hourly EWMA (half-life = 1 hour) of the per-type revenue series in
    * EXACT integer arithmetic: ewma_t = Σ_{l=0..20} v_{t−l} >> l. The
    * recursion every single-node EWMA uses (s_t = s_{t−1}/2 + v_t) is a
    * sequential scan no engine parallelizes; the kernel spelling converts
    * it to a TRUNCATED convolution — each grid cell contributes to ≤ 21
    * downstream cells (beyond lag 20 an integer-cents term shifts to 0
    * for any realistic magnitude), one explode + one grid-grained groupBy,
    * embarrassingly parallel. Per-term right-shift truncation is part of
    * the op's integer contract (bit-identical across engines, unlike any
    * float α-recursion).
    */
  val winEwma: Op = Op.sql(
    "win-ewma",
    """WITH obs AS (
      |  SELECT epoch_us(ts) // 3600000000 AS hour_id, event_type,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY hour_id, event_type),
      |ext AS (SELECT min(hour_id) AS mn, max(hour_id) AS mx FROM obs),
      |contrib AS (
      |  SELECT o.hour_id + l.l AS hour_id, o.event_type,
      |         o.v // (2 ** l.l)::BIGINT AS c
      |  FROM obs o, (SELECT unnest(generate_series(0, 20)) AS l) l),
      |ew AS (SELECT hour_id, event_type, CAST(sum(c) AS BIGINT) AS ewma_cents
      |       FROM contrib GROUP BY hour_id, event_type)
      |SELECT e.hour_id, e.event_type, e.ewma_cents
      |FROM ew e, ext WHERE e.hour_id <= ext.mx
      |ORDER BY e.hour_id, e.event_type""".stripMargin
  ) { (s, d) =>
    val obs = Tables.events(s, d)
      .groupBy(expr("ts div 1000 div 3600000000").as("hour_id"),
        col("event_type"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
    val ext = obs.agg(max("hour_id").as("mx"))
    obs
      .select(col("hour_id"), col("event_type"), col("v"),
        explode(sequence(lit(0L), lit(20L))).as("l"))
      .select((col("hour_id") + col("l")).as("hour_id"), col("event_type"),
        expr("v div shiftleft(1L, int(l))").as("c"))
      .groupBy("hour_id", "event_type")
      .agg(sum("c").as("ewma_cents"))
      .join(broadcast(ext), col("hour_id") <= col("mx"))
      .select("hour_id", "event_type", "ewma_cents")
      .orderBy("hour_id", "event_type")
  }

  /** SCD type-2 history build — the warehouse primitive that turns an
    * update stream into an effective-dated dimension: per customer, the
    * order-priority sequence collapses to CHANGE runs (islands via a
    * lag-flag running sum), each run becomes one history row
    * [valid_from, valid_to) with the open run flagged current. All
    * windows are customer-partitioned (natural key grain — hot keys
    * don't exist in a dimension build) and the second-tier windows run
    * over the RUNS table, which is change-count-sized, not
    * update-count-sized.
    */
  val winScd2History: Op = Op.sql(
    "win-scd2-history",
    """WITH o AS (SELECT o_custkey AS cust, o_orderpriority AS prio,
      |                  CAST(o_orderdate AS DATE) AS d, o_orderkey AS k
      |           FROM orders),
      |s AS (SELECT cust, prio, d, k,
      |             CASE WHEN lag(prio) OVER (PARTITION BY cust ORDER BY d, k)
      |                       IS DISTINCT FROM prio THEN 1 ELSE 0 END AS chg
      |      FROM o),
      |r AS (SELECT cust, prio, d,
      |             sum(chg) OVER (PARTITION BY cust ORDER BY d, k
      |                            ROWS UNBOUNDED PRECEDING) AS run
      |      FROM s),
      |runs AS (SELECT cust, run, prio, min(d) AS valid_from
      |         FROM r GROUP BY cust, run, prio),
      |h AS (SELECT cust, prio, valid_from, run,
      |             lead(valid_from) OVER (PARTITION BY cust
      |                                    ORDER BY valid_from, run)
      |               AS valid_to
      |      FROM runs)
      |SELECT cust, prio AS priority, valid_from, valid_to,
      |       (valid_to IS NULL) AS is_current
      |FROM h ORDER BY cust, valid_from, run""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cust").orderBy("d", "k")
    // date-cast: the fixture's orderdate is timestamp-NTZ at day grain;
    // DATE is the hash-safe grain (house ts invariant)
    val o = Tables.orders(s, d).select(
      col("o_custkey").as("cust"), col("o_orderpriority").as("prio"),
      col("o_orderdate").cast("date").as("d"), col("o_orderkey").as("k"))
    val runs = o
      .withColumn("chg",
        when(!lag("prio", 1).over(w).eqNullSafe(col("prio")), 1L).otherwise(0L))
      .withColumn("run", sum("chg").over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
      .groupBy("cust", "run", "prio")
      .agg(min("d").as("valid_from"))
    // lead ordered by (valid_from, run): two same-day priority flips give
    // two runs with one valid_from, and the run id (which follows the
    // (date, orderkey) arrival order) is the deterministic tie-break
    val wc = Window.partitionBy("cust").orderBy("valid_from", "run")
    runs
      .select(col("cust"), col("prio").as("priority"), col("valid_from"),
        col("run"), lead("valid_from", 1).over(wc).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("cust", "valid_from", "run")
      .drop("run")
  }

  /** Point-in-time (PIT) join against the SCD2 history — the consumer
    * side of win-scd2-history and the correctness backbone of any
    * feature-store / ML-training join: each lineitem resolves the
    * customer priority that was EFFECTIVE at its ship date (not today's,
    * not the order's), and the report counts shipments whose effective
    * priority had drifted from the priority the order was placed under.
    *
    * Scale shape: the version lookup is NOT a window over the fact
    * stream — facts join the runs table on (customer, 32-day
    * valid-from bucket) with the range predicate as a join residual,
    * and the as-of argmax is a struct-max groupBy
    * (partial-aggregatable; (valid_from, run) totalizes the order so
    * ties cannot diverge). The bucket key is the round-8 fan-out
    * prune (VERDICT r7 item 2): each run EXPLODES into the buckets of
    * its validity interval [its own bucket .. its successor's start
    * bucket] (last run → the global max ship bucket, a 1-row
    * broadcast), so a fact probes only the runs live around its ship
    * date instead of ALL of its customer's runs. The effective run —
    * max (valid_from, run) ≤ ship date — always covers the fact's
    * bucket (its successor's valid_from must exceed the ship date, or
    * it would itself be the argmax), so the prune is lossless;
    * coverage rows ≈ runs + customers × active-buckets, linear in the
    * dimension. Cuts the big-big exchange's fan-out from
    * O(preceding runs) to O(runs per bucket) per fact.
    */
  val joinPitScd2: Op = Op.sql(
    "join-pit-scd2",
    """WITH o AS (SELECT o_custkey AS cust, o_orderpriority AS prio,
      |                  o_orderdate AS d, o_orderkey AS k FROM orders),
      |s AS (SELECT cust, prio, d, k,
      |             CASE WHEN lag(prio) OVER (PARTITION BY cust ORDER BY d, k)
      |                       IS DISTINCT FROM prio THEN 1 ELSE 0 END AS chg
      |      FROM o),
      |r AS (SELECT cust, prio, d,
      |             sum(chg) OVER (PARTITION BY cust ORDER BY d, k
      |                            ROWS UNBOUNDED PRECEDING) AS run
      |      FROM s),
      |runs AS (SELECT cust, run, prio, min(d) AS valid_from
      |         FROM r GROUP BY cust, run, prio),
      |pit AS (
      |  SELECT li.l_orderkey, li.l_linenumber, ord.o_orderpriority AS order_prio,
      |         (max({'vf': rr.valid_from, 'run': rr.run, 'p': rr.prio})).p
      |           AS pit_prio
      |  FROM lineitem li
      |  JOIN orders ord ON li.l_orderkey = ord.o_orderkey
      |  JOIN runs rr ON rr.cust = ord.o_custkey AND rr.valid_from <= li.l_shipdate
      |  GROUP BY li.l_orderkey, li.l_linenumber, order_prio)
      |SELECT pit_prio AS priority, count(*) AS n_items,
      |       CAST(sum(CASE WHEN pit_prio <> order_prio THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_drifted
      |FROM pit GROUP BY priority ORDER BY priority""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cust").orderBy("d", "k")
    val runs = Tables.orders(s, d).select(
      col("o_custkey").as("cust"), col("o_orderpriority").as("prio"),
      col("o_orderdate").as("d"), col("o_orderkey").as("k"))
      .withColumn("chg",
        when(!lag("prio", 1).over(w).eqNullSafe(col("prio")), 1L).otherwise(0L))
      .withColumn("run", sum("chg").over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
      .groupBy("cust", "run", "prio")
      .agg(min("d").as("valid_from"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
    // 32-day validity buckets: a run covers [its bucket .. its
    // successor's start bucket] (the successor's bucket is included so
    // no midnight-alignment assumption is needed; the argmax discards
    // the overlap), the open-ended last run covers to the global max
    // ship bucket (1-row broadcast). unix_micros of the 1992+ fixture
    // dates is non-negative, so div == floor division on both engines.
    val maxB = li.agg(max(expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000 div 32"))
      .as("max_bkt"))
    val wc = Window.partitionBy("cust").orderBy("valid_from", "run")
    val cov = runs
      .withColumn("next_vf", lead("valid_from", 1).over(wc))
      .crossJoin(broadcast(maxB))
      .withColumn("b_from", expr("unix_micros(cast(valid_from as timestamp)) div 86400000000 div 32"))
      .withColumn("b_to", coalesce(
        expr("unix_micros(cast(next_vf as timestamp)) div 86400000000 div 32"), col("max_bkt")))
      .filter(col("b_from") <= col("max_bkt"))
      .withColumn("bkt", explode(expr("sequence(b_from, least(b_to, max_bkt))")))
      .select(col("cust"), col("bkt"), col("run"), col("prio"),
        col("valid_from"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey").as("cust"),
        col("o_orderpriority").as("order_prio"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("bkt", expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000 div 32"))
      .join(cov, Seq("cust", "bkt"))
      .filter(col("valid_from") <= col("l_shipdate"))
      .groupBy("l_orderkey", "l_linenumber", "order_prio")
      .agg(max(struct(col("valid_from").as("vf"), col("run"),
        col("prio").as("p"))).getField("p").as("pit_prio"))
      .groupBy(col("pit_prio").as("priority"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("pit_prio") =!= col("order_prio"), 1).otherwise(0))
          .cast("long").as("n_drifted"))
      .orderBy("priority")
  }

  /** Longest consecutive-active-day streak distribution — the gaps-and-
    * islands pattern at the engagement grain: distinct active days per
    * user, island id = day − row_number (constant within a consecutive
    * run), run lengths per island, per-user max, then a histogram. Every
    * window is user-partitioned over the user's DAY rows (≤ span days,
    * never events); the histogram is max-streak-sized.
    */
  val winStreak: Op = Op.sql(
    "win-streak",
    """WITH days AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |isl AS (SELECT user_id, day,
      |               day - row_number() OVER (PARTITION BY user_id
      |                                        ORDER BY day) AS grp
      |        FROM days),
      |runs AS (SELECT user_id, grp, count(*) AS len
      |         FROM isl GROUP BY user_id, grp),
      |best AS (SELECT user_id, max(len) AS streak FROM runs GROUP BY user_id)
      |SELECT CAST(streak AS BIGINT) AS streak_days, count(*) AS n_users
      |FROM best GROUP BY streak ORDER BY streak_days""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("day")
    Tables.events(s, d)
      .select(col("user_id"), expr("ts div 1000 div 86400000000").as("day"))
      .distinct()
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id").agg(max("len").as("streak"))
      .groupBy("streak").agg(count(lit(1)).as("n_users"))
      .select(col("streak").as("streak_days"), col("n_users"))
      .orderBy("streak_days")
  }

  /** Lag-1 autocorrelation of the hourly event-count series per type —
    * the time-series diagnostic that separates bursty/self-exciting load
    * (r₁ ≫ 0) from memoryless arrivals (r₁ ≈ 0): what a capacity planner
    * reads before trusting any hourly forecast. The corpus reduces to
    * the DENSE per-type hourly grid (missing hours count 0 — the honest
    * series), consecutive pairs come from one lead() over grid rows, and
    * Pearson's r₁ collapses to exact integer moments (n, Σx, Σy, Σx²,
    * Σy², Σxy) with ONE identical-tree IEEE closing expression, micro-
    * snapped. Counts are ≤ corpus size, so every moment fits a long.
    */
  val winAutocorr: Op = Op.sql(
    "win-autocorr",
    """WITH obs AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS x
      |  FROM events GROUP BY event_type, h),
      |ext AS (SELECT min(h) AS mn, max(h) AS mx FROM obs),
      |grid AS (
      |  SELECT t.event_type, g.h
      |  FROM (SELECT DISTINCT event_type FROM obs) t,
      |       (SELECT unnest(generate_series(mn, mx)) AS h FROM ext) g),
      |gx AS (
      |  SELECT grid.event_type, grid.h, coalesce(o.x, 0) AS x
      |  FROM grid LEFT JOIN obs o
      |    ON o.event_type = grid.event_type AND o.h = grid.h),
      |pairs AS (
      |  SELECT event_type, x,
      |         lead(x) OVER (PARTITION BY event_type ORDER BY h) AS y
      |  FROM gx),
      |mom AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(x * x) AS BIGINT) AS sxx,
      |         CAST(sum(y * y) AS BIGINT) AS syy,
      |         CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM pairs WHERE y IS NOT NULL GROUP BY event_type)
      |SELECT event_type, n AS n_pairs,
      |       CAST(round((n * sxy - sx * sy) * 1.0 /
      |                  (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |                   sqrt(CAST(n * syy - sy * sy AS DOUBLE))) * 1000000)
      |            AS BIGINT) AS r1_micro
      |FROM mom ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val obs = Tables.events(s, d)
      .groupBy(col("event_type"), expr("ts div 1000 div 3600000000").as("h"))
      .agg(count(lit(1)).as("xo"))
    val grid = obs.agg(min("h").as("mn"), max("h").as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("h"))
      .crossJoin(obs.select("event_type").distinct())
      .join(obs, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), coalesce(col("xo"), lit(0L)).as("x"))
    val w = Window.partitionBy("event_type").orderBy("h")
    val mom = grid
      .withColumn("y", lead("x", 1).over(w))
      .filter(col("y").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    mom.select(col("event_type"), col("n").as("n_pairs"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) * lit(1.0) /
        (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
          sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))) *
        1000000).cast("long").as("r1_micro"))
      .orderBy("event_type")
  }

  /** Maximum-drawdown series of daily purchase revenue: per day, the
    * running all-time-high and the drawdown below it (peak − revenue) —
    * the health metric behind "how far below the best day are we, and
    * when did it start". All arithmetic is exact integer cents; the
    * running max is the one genuinely sequential piece and runs over the
    * DAILY rollup, never the event stream.
    *
    * Scale shape: the corpus pass is one map-side-combined groupBy to the
    * day grain (span-bounded: 10 years ≈ 3,653 rows); the unpartitioned
    * running-max window costs one task over those rows — the same
    * span-bounded window contract as win-cusum-changepoint.
    */
  val winDrawdown: Op = Op.sql(
    "win-drawdown",
    """WITH d AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY day)
      |SELECT day, rev_cents,
      |       CAST(max(rev_cents) OVER (ORDER BY day
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS peak_cents,
      |       CAST(max(rev_cents) OVER (ORDER BY day
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |            - rev_cents AS BIGINT) AS dd_cents
      |FROM d ORDER BY day""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(expr("ts div 1000 div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("day").agg(sum("cents").cast("long").as("rev_cents"))
      .withColumn("peak_cents", max("rev_cents").over(w).cast("long"))
      .withColumn("dd_cents", (col("peak_cents") - col("rev_cents")).cast("long"))
      .orderBy("day")
  }

  val ops: Seq[Op] = Seq(sortByHeight, mergeSorted, topkLargestGroup, tailN,
    winChainLink, winGapDetect, winHeadSelect, winSessionize, winNextEvent,
    winTopPaths, winDebounce, winGapHistogram, winCusumChangepoint,
    winRollingMedian, winAttribution, winSeasonality, winForkDepth,
    aggMarkovStationary, winBurstFlag, winForwardFill, winEwma,
    winScd2History, joinPitScd2, winStreak, winAutocorr, winDrawdown,
    winVolatility, winForecastBaseline, winAttributionCompare,
    winChurnRisk, winSessionDepth, winDrawdownEpisodes)

  /** Drawdown EPISODES: each maximal run of days spent below the running
    * all-time-high, with its depth (worst gap to the peak, cents),
    * length, and whether the series recovered (made a new high) before
    * the data ended — the episode table behind win-drawdown's daily
    * series, and the one that answers "how long do slumps last and do we
    * come back". Episodes are gaps-and-islands over the daily drawdown
    * flags (islands machinery contract: the window runs over
    * span-bounded DAILY rows, never events).
    */
  lazy val winDrawdownEpisodes: Op = Op.sql(
    "win-drawdown-episodes",
    """WITH d AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
      |  FROM events WHERE event_type = 'purchase' GROUP BY day),
      |w AS (SELECT day, rev,
      |        CAST(max(rev) OVER (ORDER BY day
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |          AS peak
      |      FROM d),
      |f AS (SELECT day, rev, peak, CASE WHEN rev < peak THEN 1 ELSE 0 END AS dd,
      |        CASE WHEN lag(CASE WHEN rev < peak THEN 1 ELSE 0 END)
      |                  OVER (ORDER BY day) IS DISTINCT FROM
      |                  CASE WHEN rev < peak THEN 1 ELSE 0 END
      |             THEN 1 ELSE 0 END AS brk
      |      FROM w),
      |g AS (SELECT day, rev, peak, dd,
      |        sum(brk) OVER (ORDER BY day
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ep
      |      FROM f),
      |mx AS (SELECT max(day) AS last_day FROM d)
      |SELECT CAST(min(g.day) AS BIGINT) AS start_day,
      |       CAST(max(g.day) AS BIGINT) AS end_day,
      |       count(*) AS n_days,
      |       CAST(max(g.peak - g.rev) AS BIGINT) AS max_depth_cents,
      |       (max(g.day) < mx.last_day) AS recovered
      |FROM g, mx WHERE g.dd = 1
      |GROUP BY g.ep, mx.last_day ORDER BY start_day""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val wRun = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.orderBy("day")
    val daily = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(expr("ts div 1000 div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("day").agg(sum("cents").cast("long").as("rev"))
      .withColumn("peak", max("rev").over(wRun).cast("long"))
      .withColumn("dd", when(col("rev") < col("peak"), 1L).otherwise(0L))
    val mx = daily.agg(max("day").as("last_day"))
    daily
      .withColumn("brk",
        when(!lag("dd", 1).over(wLag).eqNullSafe(col("dd")), 1L).otherwise(0L))
      .withColumn("ep", sum("brk").over(wRun))
      .filter(col("dd") === 1)
      .crossJoin(broadcast(mx))
      .groupBy("ep", "last_day")
      .agg(min("day").cast("long").as("start_day"),
        max("day").cast("long").as("end_day"),
        count(lit(1)).as("n_days"),
        max(col("peak") - col("rev")).cast("long").as("max_depth_cents"))
      .withColumn("recovered", col("end_day") < col("last_day"))
      .select("start_day", "end_day", "n_days", "max_depth_cents", "recovered")
      .orderBy("start_day")
  }

  /** Churn-risk flag per repeat purchaser: current silence (time since
    * their last purchase, against the feed's end) compared to DOUBLE the
    * user's own median inter-purchase gap — the personalized-baseline
    * churn rule (a weekly shopper is at risk after two quiet weeks; a
    * quarterly one is not). The median gap stays exact across engines by
    * doubling it into an integer (2·median of integer micros is an exact
    * BIGINT for any gap list); only users with ≥ 2 gaps qualify.
    *
    * Scale shape: gaps via one user-partitioned lag window, medians via
    * exact per-user percentile over small groups (the agg-latency-
    * quantiles contract — switch to approx at extreme group sizes), all
    * joins user-grained.
    */
  lazy val winChurnRisk: Op = Op.sql(
    "win-churn-risk",
    """WITH p AS (
      |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, event_id
      |  FROM events WHERE event_type = 'purchase'),
      |mx AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS now_us FROM events),
      |g AS (SELECT user_id,
      |        us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |          AS gap
      |      FROM p),
      |m AS (SELECT user_id, count(*) AS n_gaps,
      |             CAST(quantile_cont(gap, 0.5) * 2 AS BIGINT) AS med2_us
      |      FROM g WHERE gap IS NOT NULL GROUP BY user_id
      |      HAVING count(*) >= 2),
      |l AS (SELECT user_id, max(us) AS last_us FROM p GROUP BY user_id)
      |SELECT m.user_id AS user_id,
      |       CAST(m.n_gaps + 1 AS BIGINT) AS n_purchases,
      |       m.med2_us,
      |       CAST(mx.now_us - l.last_us AS BIGINT) AS age_us,
      |       (mx.now_us - l.last_us > m.med2_us) AS at_risk
      |FROM m JOIN l ON l.user_id = m.user_id CROSS JOIN mx
      |ORDER BY m.user_id""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("us"), col("event_id"))
    val now = Tables.events(s, d)
      .agg(max(expr("ts div 1000")).as("now_us"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val g = p.withColumn("gap", col("us") - lag("us", 1).over(w))
      .filter(col("gap").isNotNull)
    val m = g.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        (expr("percentile(gap, 0.5D)") * 2).cast("long").as("med2_us"))
      .filter(col("n_gaps") >= 2)
    val l = p.groupBy("user_id").agg(max("us").as("last_us"))
    m.join(l, Seq("user_id"))
      .crossJoin(broadcast(now))
      .select(col("user_id"), (col("n_gaps") + 1).cast("long").as("n_purchases"),
        col("med2_us"),
        (col("now_us") - col("last_us")).cast("long").as("age_us"),
        (col("now_us") - col("last_us") > col("med2_us")).as("at_risk"))
      .orderBy("user_id")
  }

  /** Session-depth distribution: how many sessions contain N events — the
    * engagement shape behind win-sessionize's raw session table (a spike
    * at N=1 is bounce traffic; a heavy tail is power usage), with each
    * depth's share of sessions in basis points.
    *
    * Scale shape: rides the sessionize plan (session_window aggregation,
    * user-grained) and folds its session rows to a depth histogram; the
    * 1-row total broadcasts onto depth-histogram-sized rows.
    */
  lazy val winSessionDepth: Op = Op.sql(
    "win-session-depth",
    """WITH g AS (
      |  SELECT user_id, ts, CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
      |                                ORDER BY ts) > INTERVAL 30 MINUTE
      |                           THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (SELECT user_id, ts,
      |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM g),
      |ses AS (SELECT user_id, sid, count(*) AS n_events FROM s
      |        GROUP BY user_id, sid),
      |h AS (SELECT n_events, count(*) AS n_sessions FROM ses GROUP BY n_events),
      |t AS (SELECT CAST(sum(n_sessions) AS BIGINT) AS total FROM h)
      |SELECT h.n_events, h.n_sessions,
      |       CAST((h.n_sessions * 10000) // t.total AS BIGINT) AS share_bp
      |FROM h, t ORDER BY h.n_events""".stripMargin
  ) { (s, d) =>
    val ses = graft.streaming.Streams.sessionize(
      Tables.events(s, d)
        .select(col("user_id"), timestamp_micros(expr("ts div 1000")).as("tsc"),
          lit(0L).as("cents")))
    val h = ses.groupBy(col("n_events")).agg(count(lit(1)).as("n_sessions"))
    val t = h.agg(sum("n_sessions").cast("long").as("total"))
    h.crossJoin(broadcast(t))
      .select(col("n_events"), col("n_sessions"),
        expr("(n_sessions * 10000) div total").as("share_bp"))
      .orderBy("n_events")
  }

  /** First-touch vs last-touch attribution, side by side per channel —
    * the model-sensitivity table a marketing analysis shows before anyone
    * argues over budget: channels that win under last-touch but lose
    * under first-touch are closers, the reverse are openers; `delta_n`
    * quantifies it. BOTH models ride ONE user-partitioned window pass
    * (a running `last` and a running `first` over the same ordered
    * timeline — the win-attribution as-of pattern, never a per-purchase
    * range join), then two channel-grained rollups meet in a
    * channel-domain-sized outer join.
    */
  lazy val winAttributionCompare: Op = Op.sql(
    "win-attribution-compare",
    """WITH p AS (SELECT event_id, user_id, ts FROM events
      |           WHERE event_type = 'purchase'),
      |c AS (SELECT event_id, user_id, ts, event_type FROM events
      |      WHERE event_type <> 'purchase'),
      |m AS (SELECT p.event_id,
      |             max(CASE WHEN c.event_id IS NULL THEN NULL
      |                      ELSE struct_pack(ts := c.ts, id := c.event_id,
      |                                       ch := c.event_type) END) AS last_t,
      |             min(CASE WHEN c.event_id IS NULL THEN NULL
      |                      ELSE struct_pack(ts := c.ts, id := c.event_id,
      |                                       ch := c.event_type) END) AS first_t
      |      FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
      |      GROUP BY 1),
      |lf AS (SELECT COALESCE(last_t.ch, 'direct') AS channel,
      |              count(*) AS n_last FROM m GROUP BY channel),
      |ff AS (SELECT COALESCE(first_t.ch, 'direct') AS channel,
      |              count(*) AS n_first FROM m GROUP BY channel)
      |SELECT COALESCE(lf.channel, ff.channel) AS channel,
      |       CAST(COALESCE(lf.n_last, 0) AS BIGINT) AS n_last,
      |       CAST(COALESCE(ff.n_first, 0) AS BIGINT) AS n_first,
      |       CAST(COALESCE(lf.n_last, 0) - COALESCE(ff.n_first, 0) AS BIGINT)
      |         AS delta_n
      |FROM lf FULL OUTER JOIN ff ON lf.channel = ff.channel
      |ORDER BY channel""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"),
        when(col("event_type") === "purchase", 1).otherwise(0), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touch = when(col("event_type") =!= "purchase",
      struct(col("ts"), col("event_id"), col("event_type").as("ch")))
      .otherwise(lit(null))
    val m = ev
      .withColumn("last_t", last(touch, ignoreNulls = true).over(w))
      .withColumn("first_t", first(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
    val lf = m.groupBy(coalesce(col("last_t.ch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_last"))
    val ff = m.groupBy(coalesce(col("first_t.ch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_first"))
    lf.join(ff, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("n_last"), lit(0L)).cast("long").as("n_last"),
        coalesce(col("n_first"), lit(0L)).cast("long").as("n_first"),
        (coalesce(col("n_last"), lit(0L)) - coalesce(col("n_first"), lit(0L)))
          .cast("long").as("delta_n"))
      .orderBy("channel")
  }

  /** Seasonal-naive forecast error — the baseline every revenue forecast
    * must beat before it earns a deploy: predict each hour's purchase
    * revenue as the SAME HOUR LAST WEEK (lag 168 over the dense hourly
    * grid, zero-filled so silent hours forecast silent hours), then fold
    * the absolute error per hour-of-week. The output is the weekly error
    * profile (168 rows): which day/hour slots are predictable and which
    * carry all the surprise — and the denominator for any MASE-style
    * model score. Exact integer cents; the mean snaps via one integer
    * division.
    *
    * Scale shape: the win-forward-fill contract — one map-side-combined
    * rollup to the hour grain, a dense sequence-exploded grid
    * (span-bounded), lag(168) over grid rows, and a 168-row fold.
    */
  lazy val winForecastBaseline: Op = Op.sql(
    "win-forecast-baseline",
    """WITH obs AS (
      |  SELECT epoch_us(ts) // 3600000000 AS hour_id,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events WHERE event_type = 'purchase' GROUP BY hour_id),
      |ext AS (SELECT min(hour_id) AS mn, max(hour_id) AS mx FROM obs),
      |grid AS (SELECT unnest(generate_series(mn, mx)) AS hour_id FROM ext),
      |dense AS (SELECT g.hour_id, coalesce(o.v, 0) AS v
      |          FROM grid g LEFT JOIN obs o USING (hour_id)),
      |f AS (SELECT hour_id, v,
      |        lag(v, 168) OVER (ORDER BY hour_id) AS forecast
      |      FROM dense)
      |SELECT hour_id % 168 AS hour_of_week, count(*) AS n_hours,
      |       CAST(sum(abs(v - forecast)) AS BIGINT) AS abs_err_cents,
      |       CAST(sum(abs(v - forecast)) // count(*) AS BIGINT) AS mae_cents
      |FROM f WHERE forecast IS NOT NULL
      |GROUP BY hour_of_week ORDER BY hour_of_week""".stripMargin
  ) { (s, d) =>
    val obs = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("ts div 1000 div 3600000000").as("hour_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
    val grid = obs.agg(min("hour_id").as("mn"), max("hour_id").as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("hour_id"))
    val w = Window.orderBy("hour_id")
    grid.join(obs, Seq("hour_id"), "left")
      .select(col("hour_id"), coalesce(col("v"), lit(0L)).as("v"))
      .withColumn("forecast", lag("v", 168).over(w))
      .filter(col("forecast").isNotNull)
      .groupBy((col("hour_id") % 168).as("hour_of_week"))
      .agg(count(lit(1)).as("n_hours"),
        sum(abs(col("v") - col("forecast"))).cast("long").as("abs_err_cents"))
      .withColumn("mae_cents", expr("abs_err_cents div n_hours"))
      .orderBy("hour_of_week")
  }

  /** 7-day rolling volatility of daily purchase revenue as the exact
    * integer SAMPLE variance in cents² — (n·Σx² − (Σx)²) / (n·(n−1)) with
    * one trailing integer division, so engines cannot drift (no running
    * mean, no float accumulation; Σx² of cents stays under 2⁶³ to ~3·10⁹
    * cents/day — beyond that, snap the daily series to dollars first).
    * Window sizes shrink at the series head (sample variance needs n ≥ 2;
    * the first day reports 0) exactly as a monitoring chart expects.
    *
    * Scale shape: the day-grain rollup first (map-side partials), then
    * BOTH running sums ride ONE span-bounded 7-row window — the
    * win-drawdown contract.
    */
  lazy val winVolatility: Op = Op.sql(
    "win-volatility",
    """WITH d AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
      |  FROM events WHERE event_type = 'purchase' GROUP BY day),
      |w AS (SELECT day, rev,
      |        CAST(count(*) OVER t AS BIGINT) AS n,
      |        CAST(sum(rev) OVER t AS BIGINT) AS s,
      |        CAST(sum(rev * rev) OVER t AS BIGINT) AS s2
      |      FROM d WINDOW t AS (ORDER BY day
      |        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT day, rev AS rev_cents, n,
      |       CASE WHEN n >= 2
      |            THEN CAST((n * s2 - s * s) // (n * (n - 1)) AS BIGINT)
      |            ELSE 0 END AS var_cc
      |FROM w ORDER BY day""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val t = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(expr("ts div 1000 div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("day").agg(sum("cents").cast("long").as("rev"))
      .withColumn("n", count(lit(1)).over(t).cast("long"))
      .withColumn("s", sum("rev").over(t).cast("long"))
      .withColumn("s2", sum(col("rev") * col("rev")).over(t).cast("long"))
      .select(col("day"), col("rev").as("rev_cents"), col("n"),
        when(col("n") >= 2,
          expr("(n * s2 - s * s) div (n * (n - 1))")).otherwise(0L)
          .cast("long").as("var_cc"))
      .orderBy("day")
  }
}
