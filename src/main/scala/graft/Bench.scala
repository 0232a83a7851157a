package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered op at
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. A warm-up pass (session init,
  * codegen, parquet footer reads) runs before any timing so per-query
  * numbers measure the operator, not JVM startup.
  *
  * Contention awareness (VERDICT r11 item 2): the JSON carries
  * `loadavg_start`/`loadavg_end` (1-min system load) and `procs`
  * so a run on a busy box is self-identifying — BENCH_r11's 1700 s
  * driver total vs 351 s judge-reproduced idle-box total was pure
  * tenant contention, indistinguishable from a regression without
  * these fields. `wall_s` is the whole main's wall (incl. warm-up);
  * `value` stays the sum of per-entry times (the historical metric).
  */
object Bench {
  /** Connector-seam simulations: their wall time measures thread
    * scheduling of the seam's real in-flight budget, not engine work
    * (VERDICT r11 item 3) — timed under a `seam:` key (the `fill:`
    * convention) and excluded from `value_engine`.
    */
  private val seamIds = Set("src-grpc")

  /** Single-thread CPU calibration: wall ms for a fixed 50M-step integer
    * FNV fold. This box's EFFECTIVE cpu speed swings ~2x at constant
    * loadavg and ~0 steal (host-level contention the guest cannot see in
    * /proc) — measured 1.4 s vs 2.8 s for the same Python loop minutes
    * apart while a bench pass doubled. loadavg alone therefore cannot
    * adjudicate a slow pass; this probe can: spin_ms scales with the
    * slowdown, so pass totals are comparable after dividing by it.
    */
  private def spinProbeMs(): Double = {
    var w = 1469598103934665603L
    var i = 0
    while (i < 50000000) { w = (w ^ i) * 1099511628211L; i += 1 }
    val t0 = System.nanoTime()
    var h = 1469598103934665603L
    i = 0
    while (i < 50000000) { h = (h ^ i) * 1099511628211L; i += 1 }
    val ms = (System.nanoTime() - t0) / 1e6
    // fold BOTH loop results into the guard: an unread warm-up result is
    // legally removable by C2, leaving the timed loop partially un-warmed
    if ((h ^ w) == 42) print("")
    math.rint(ms * 10) / 10
  }

  /** Cross-thread wakeup latency: µs per synchronous queue handoff,
    * averaged over 10k. On this VM (gVisor-style syscall interception)
    * futex wake latency degrades independently of CPU speed — measured
    * 37-45 µs/handoff and 1-3 ms/thread-create in windows where the spin
    * probe read healthy, while identical bench passes ran 233 s vs 667 s.
    * Spark pays a handoff on every task launch/result/RPC hop, so THIS
    * probe — not loadavg, not steal, not spin — is what a slow pass
    * correlates with. Both probes together make any recorded pass
    * environment-attributable.
    */
  private def handoffProbeUs(): Double = {
    val q = new java.util.concurrent.SynchronousQueue[Integer]()
    val n = 10000
    val c = new Thread(() => {
      var i = 0
      while (i < n) { q.take(); i += 1 }
    })
    c.setDaemon(true)
    c.start()
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) { q.put(i); i += 1 }
    c.join()
    math.rint((System.nanoTime() - t0) / 1e3 / n * 10) / 10
  }

  def main(args: Array[String]): Unit = {
    val t0Main = System.nanoTime()
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = osBean.getSystemLoadAverage
    val spinStart = spinProbeMs()
    val handoffStart = handoffProbeUs()
    val procs = Runtime.getRuntime.availableProcessors
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // At 10-100x the bench SF the rig must scale like a cluster would:
    // more partitions per core or the fixed 32 saturate (each task holds
    // 100x the state; caches evict, aggregations spill). Overridable so
    // scale sweeps can separate plan growth from rig saturation.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: touch every table (footer + schema), force one shuffle and
    // one codegen'd aggregation through the engine.
    Tables.all.foreach { t =>
      try Tables.load(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => () }
    }
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }

    // Optional args = op ids to time (local profiling); the driver passes
    // none and gets the full registry.
    val ordered =
      if (args.nonEmpty) SparkEntry.allOps.map(_.id).filter(args.toSet)
      else SparkEntry.allOps.map(_.id)
    // The dedup family shares four persisted pipeline stages (shingles →
    // jaccard pairs / minhash pairs → clusters); un-warmed, whichever op
    // runs FIRST gets the whole fill attributed to it (ngram-jaccard
    // showed 9 s of which ~7 s was shared fill). Time the fills as their
    // own line items — the total stays honest (fills are inside it) and
    // per-op numbers become the marginal cost a pipeline actually pays.
    val dedupFills: Seq[(String, () => Unit)] =
      if (ordered.exists(o => o.startsWith("dedup-") ||
          o == "pipeline-curation-e2e")) // rides the cluster-table fill too
        Seq[(String, () => Unit)](
          "fill:shingles" -> (() => { ops.DedupOps.persistedShingles(spark, sfDir).count(); () }),
          "fill:jaccard-pairs" -> (() => { ops.DedupOps.persistedJaccardPairs(spark, sfDir).count(); () }),
          "fill:minhash-pairs" -> (() => { ops.DedupOps.persistedMinhashPairs(spark, sfDir).count(); () }),
          "fill:doc-clusters" -> (() => { ops.DedupOps.persistedDocClusters(spark, sfDir).count(); () }),
          "fill:md5-sig-base" -> (() => { ops.DedupOps.persistedMd5Base(spark, sfDir).count(); () }))
      else Seq.empty
    // The unigram-decile bucket table (scores + buckets persists inside
    // TextOps.unigramDecileBuckets) is shared by four ops; without an
    // explicit fill whichever consumer Bench times first pays the whole
    // model build and the rest read cache (VERDICT r13 item 2).
    val decileConsumers = Set("text-quality-deciles", "text-classifier-score",
      "pipeline-curation-e2e", "pipeline-order-sensitivity")
    val fills: Seq[(String, () => Unit)] = dedupFills ++
      (if (ordered.exists(decileConsumers)) Seq[(String, () => Unit)](
        "fill:unigram-deciles" ->
          (() => { ops.TextOps.unigramDecileBuckets(spark, sfDir).count(); () }))
       else Seq.empty)
    // Failed ops still record a time (the historical behavior — a slow op
    // must not sink the whole sweep) but are COUNTED: the BENCH_OK marker
    // carries the error count so a broken board can't read as healthy
    // (review r13: a missing sf dir used to produce a green marker over
    // 349 ~0s entries).
    val errCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val fillTimes = fills.map { case (name, run) =>
      val t0 = System.nanoTime()
      try run() catch { case _: Throwable => errCount.incrementAndGet() }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val results = fillTimes ++ ordered.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case _: Throwable => errCount.incrementAndGet() }
      val key = if (seamIds(name)) s"seam:$name" else name
      key -> (System.nanoTime() - t0) / 1e9
    }
    val total = results.map(_._2).sum
    // Engine-only total: fills stay in (they are real shared engine work a
    // pipeline pays once) but seam sims come out — their time is thread
    // scheduling of a simulated transport, not plan execution.
    val engineTotal = results.collect {
      case (k, v) if !k.startsWith("seam:") => v }.sum
    val loadEnd = osBean.getSystemLoadAverage
    val spinEnd = spinProbeMs()
    val handoffEnd = handoffProbeUs()
    val wall = (System.nanoTime() - t0Main) / 1e9
    def env: String =
      f""""value_engine":$engineTotal%.3f,"wall_s":$wall%.1f,""" +
      f""""loadavg_start":$loadStart%.2f,"loadavg_end":$loadEnd%.2f,""" +
      f""""spin_ms_start":$spinStart%.1f,"spin_ms_end":$spinEnd%.1f,""" +
      f""""handoff_us_start":$handoffStart%.1f,"handoff_us_end":$handoffEnd%.1f,"procs":$procs"""
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec",$env,"queries":$qs,"sf":"$sfDir"}"""
    println(fullLine)
    // Compact line (slowest ops only) that fits whole inside a short
    // captured tail and parses standalone.
    val slow = results.sortBy(-_._2).take(25)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec",$env,"n_ops":${results.size},"note":"slowest 25 of ${results.size}; full per-op map in the adjacent lines","queries":$slow,"sf":"$sfDir"}""")
    // File copy: no prefix, no truncation, survives any capture scheme.
    try {
      val w = new java.io.PrintWriter("bench_latest.json", "UTF-8")
      try w.println(fullLine)
      finally w.close()
    } catch { case _: Throwable => () }
    spark.stop()
    // Driver contract (VERDICT r13 item 1): the full one-line per-op JSON
    // must be the LAST data line on stdout — the driver's capture keeps the
    // tail of the output, and printing the full line only FIRST truncated
    // it away in every recorded round (BENCH_r01–r13 parsed=null). Printed
    // after spark.stop() so no late log line can land under it.
    println(fullLine)
    // Terminal health marker + explicit exit (VERDICT r12 item 3): the
    // driver's capture wrapper recorded rc=1 on a green r12 run, making
    // the artifact's one machine-readable health bit wrong. Any captured
    // tail that carries this line with errors=0 is a successful Bench
    // regardless of wrapper-level rc (tools/bench_rc_check.py asserts
    // it); a missing marker is a real Bench failure, a nonzero error
    // count a real op failure.
    println(s"BENCH_OK ${results.size} errors=${errCount.get}")
    sys.exit(0)
  }
}
