package graft.sources

import java.util.concurrent.{ArrayBlockingQueue, Executors, Future => JFuture}

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
  */
object Concurrency {

  /** `--parallel`, clamped to the reference's allowed 1..512. */
  def apiParallel(requested: Int): Int = math.max(1, math.min(512, requested))

  /** Derived caps (global.rs:78-97). */
  def blocksParallel(api: Int): Int = math.min(64, math.max(1, api / 2))
  def txParallel(api: Int): Int = math.min(64, math.max(1, api / 2))
  def traceParallel(api: Int): Int = math.min(16, math.max(1, api / 4))

  def boundedFetch[A, B](it: Iterator[A], cap: Int)(f: A => B): Iterator[B] = {
    require(cap >= 1, s"cap: $cap")
    val pool = Executors.newFixedThreadPool(cap)
    val inFlight = new ArrayBlockingQueue[JFuture[B]](cap)
    new Iterator[B] {
      private def fill(): Unit =
        while (it.hasNext && inFlight.remainingCapacity() > 0) {
          val a = it.next()
          inFlight.put(pool.submit(() => f(a)))
        }
      fill()
      def hasNext: Boolean = {
        val more = !inFlight.isEmpty
        if (!more) pool.shutdown()
        more
      }
      def next(): B = {
        val b = inFlight.take().get()
        fill()
        b
      }
    }
  }
}
