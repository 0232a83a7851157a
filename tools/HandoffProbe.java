// Standalone copy of graft.Bench's wakeup-latency probe (Bench.scala:59-73):
// us per SynchronousQueue handoff, averaged over 10k, plus the 50M-step spin
// probe (Bench.scala:34-47). Used by tools/bench_when_healthy.py to detect
// the healthy windows (handoff < 10 us) VERDICT r12 item 1 asks for, without
// paying a JVM-wide sbt launch per poll.
public final class HandoffProbe {
  static double spinMs() {
    long w = 1469598103934665603L;
    for (int i = 0; i < 50000000; i++) w = (w ^ i) * 1099511628211L;
    long t0 = System.nanoTime();
    long h = 1469598103934665603L;
    for (int i = 0; i < 50000000; i++) h = (h ^ i) * 1099511628211L;
    double ms = (System.nanoTime() - t0) / 1e6;
    if ((h ^ w) == 42) System.out.print("");
    return Math.rint(ms * 10) / 10;
  }

  static double handoffUs() throws Exception {
    final java.util.concurrent.SynchronousQueue<Integer> q =
        new java.util.concurrent.SynchronousQueue<>();
    final int n = 10000;
    Thread c = new Thread(() -> {
      try { for (int i = 0; i < n; i++) q.take(); }
      catch (InterruptedException e) { Thread.currentThread().interrupt(); }
    });
    c.setDaemon(true);
    c.start();
    long t0 = System.nanoTime();
    for (int i = 0; i < n; i++) q.put(i);
    c.join();
    return Math.rint((System.nanoTime() - t0) / 1e3 / n * 10) / 10;
  }

  public static void main(String[] args) throws Exception {
    double h1 = handoffUs();
    double s = spinMs();
    double h2 = handoffUs();
    System.out.println(String.format(
        "{\"handoff_us_1\":%.1f,\"handoff_us_2\":%.1f,\"spin_ms\":%.1f}",
        h1, h2, s));
  }
}
