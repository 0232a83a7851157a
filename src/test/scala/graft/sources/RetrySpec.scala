package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's retry contract (ethereum.rs:27-30,104-117):
  * exponential factor backoff, capped, jittered, bounded attempts.
  */
class RetrySpec extends AnyFunSuite {

  test("schedule grows by the factor and caps at maxDelay") {
    // un-jittered check via ratios: value/unit-jitter stays within [0.5, 1)
    // of the raw curve, and the raw curve caps at 2000
    val s = Retry.schedule(attempts = 10, jitterSeed = 7)
    assert(s.length === 9)
    val raw = (0 until 9).map(i => math.min(2000.0, 100 * math.pow(1.75, i)))
    s.zip(raw).foreach { case (got, r) =>
      assert(got >= (r * 0.5).toLong - 1 && got <= r.toLong, s"$got vs $r")
    }
    // the tail is capped: raw hits 2000 from attempt 6 on
    assert(raw.drop(6).forall(_ === 2000.0))
  }

  test("schedules are deterministic per seed and differ across seeds") {
    assert(Retry.schedule(jitterSeed = 1) === Retry.schedule(jitterSeed = 1))
    assert(Retry.schedule(jitterSeed = 1) !== Retry.schedule(jitterSeed = 2))
  }

  test("withRetries retries through transient failures then succeeds") {
    var calls = 0
    val slept = Seq.newBuilder[Long]
    val out = Retry.withRetries(Seq(10L, 20L, 40L), sleep = slept += _) { () =>
      calls += 1
      if (calls < 3) throw new java.io.IOException("transient")
      "ok"
    }
    assert(out === "ok")
    assert(calls === 3)
    assert(slept.result() === Seq(10L, 20L))
  }

  test("withRetries rethrows once the budget is exhausted") {
    var calls = 0
    val e = intercept[java.io.IOException] {
      Retry.withRetries(Seq(1L, 1L), sleep = _ => ()) { () =>
        calls += 1
        throw new java.io.IOException(s"always failing ($calls)")
      }
    }
    assert(calls === 3) // initial try + 2 retries
    assert(e.getMessage.contains("always failing (3)"))
  }
}
