package graft.sources

/** Retry-with-backoff for the connector seam (reference:
  * src/blockchain/ethereum.rs:27-30,104-117 — `ExponentialFactorBackoff
  * ::from_millis(100, 1.75).max_delay(2s)`, jittered, `.take(10)` around
  * every fetch). In the Spark shape this wraps the per-element fetch
  * INSIDE a `mapPartitions` connector (one channel per partition); it is
  * task-side plumbing, never an engine operator — a failed element after
  * the budget fails the task and Spark's own task retry takes over.
  *
  * The schedule is fully deterministic: jitter comes from a polynomial
  * hash of (seed, attempt), not an RNG, so tests can pin exact delays and
  * two runs of the same partition back off identically.
  */
object Retry {

  /** Delay schedule in millis: base·factorⁿ capped at `capMs`, then a
    * multiplicative jitter in [0.5, 1.0) like tokio-retry2's `jitter`.
    * Length = attempts − 1 (no delay before the first try).
    */
  def schedule(attempts: Int = 10, baseMs: Long = 100, factor: Double = 1.75,
      capMs: Long = 2000, jitterSeed: Long = 0L): Seq[Long] =
    (0 until math.max(0, attempts - 1)).map { i =>
      val raw = math.min(capMs.toDouble, baseMs * math.pow(factor, i))
      val h = (jitterSeed * 31 + i) * 2654435761L % 1000003L
      val unit = 0.5 + 0.5 * (math.floorMod(h, 1000L) / 1000.0)
      math.max(1L, (raw * unit).toLong)
    }

  /** Run `fetch` with up to `delays.length + 1` attempts, sleeping the
    * scheduled delay between failures; rethrows the last error once the
    * budget is exhausted. `sleep` is injectable so specs run instantly.
    */
  def withRetries[T](delays: Seq[Long], sleep: Long => Unit = Thread.sleep)(
      fetch: () => T): T = {
    var remaining = delays
    while (true) {
      try return fetch()
      catch {
        case t: Throwable =>
          if (remaining.isEmpty) throw t
          sleep(remaining.head)
          remaining = remaining.tail
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
