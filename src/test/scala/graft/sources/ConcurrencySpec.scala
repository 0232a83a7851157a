package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** The connector seam's concurrency model vs the reference's
  * (`src/global.rs:59-97`): derived per-kind caps and the per-partition
  * in-flight bound.
  */
class ConcurrencySpec extends AnyFunSuite {

  test("derived caps reproduce the reference's formulas and clamps") {
    assert(Concurrency.apiParallel(16) === 16)
    assert(Concurrency.apiParallel(0) === 1)
    assert(Concurrency.apiParallel(10000) === 512)
    // api=16 → blocks/tx 8, trace 4
    assert(Concurrency.blocksParallel(16) === 8)
    assert(Concurrency.txParallel(16) === 8)
    assert(Concurrency.traceParallel(16) === 4)
    // the caps: tx/blocks ≤ 64, trace ≤ 16 even at api=512
    assert(Concurrency.txParallel(512) === 64)
    assert(Concurrency.blocksParallel(512) === 64)
    assert(Concurrency.traceParallel(512) === 16)
    // floors at tiny api
    assert(Concurrency.txParallel(1) === 1)
    assert(Concurrency.traceParallel(2) === 1)
  }

  test("boundedFetch holds the in-flight cap, runs parallel, preserves order") {
    val cap = 4
    val active = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val out = Concurrency.boundedFetch((1 to 200).iterator, cap, kind = "blocks") { i =>
      val now = active.incrementAndGet()
      maxSeen.updateAndGet(m => math.max(m, now))
      Thread.sleep(1)
      active.decrementAndGet()
      i * 2
    }.toSeq
    assert(out === (1 to 200).map(_ * 2), "order preserved")
    assert(maxSeen.get() <= cap, s"cap exceeded: ${maxSeen.get()}")
    assert(maxSeen.get() >= 2, "fetches actually overlap")
  }

  test("boundedFetch propagates a fetch failure and still terminates") {
    val it = Concurrency.boundedFetch((1 to 10).iterator, 3, kind = "tx") { i =>
      if (i == 7) throw new java.io.IOException("boom")
      i
    }
    val e = intercept[Exception](it.toList)
    assert(e.getMessage.contains("boom") ||
      Option(e.getCause).exists(_.getMessage.contains("boom")))
  }

  test("cap 1 degrades to strictly sequential fetching") {
    val active = new AtomicInteger(0)
    val overlapped = new AtomicInteger(0)
    val out = Concurrency.boundedFetch((1 to 50).iterator, 1, kind = "trace") { i =>
      if (active.incrementAndGet() > 1) overlapped.incrementAndGet()
      Thread.sleep(0, 1000)
      active.decrementAndGet()
      i
    }.toSeq
    assert(out === (1 to 50))
    assert(overlapped.get() === 0)
  }
}
