package graft.archive

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Prometheus exposition edge cases the fixture gate can't reach. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("prometheus lines: empty durations still emit every bucket at zero") {
    val items = Seq(("blocks", "in", 3L, 1024L)).toDF("kind", "direction", "items", "bytes")
    val durations = Seq.empty[Double].toDF("seconds")
    val lines = Sinks.prometheusLines(items, durations).as[String].collect().sorted
    // 2 counter lines + 25 buckets + +Inf + count + sum
    assert(lines.length === 2 + 25 + 1 + 2)
    assert(lines.contains("""graft_archive_items_total{type="blocks",direction="in"} 3"""))
    assert(lines.contains("""graft_archive_bytes_total{type="blocks",direction="in"} 1024"""))
    assert(lines.count(_.contains("_bucket{")) === 26)
    assert(lines.filter(_.contains("_bucket{")).forall(_.endsWith(" 0")))
    assert(lines.contains("graft_archive_blockTime_seconds_count 0"))
    assert(lines.contains("graft_archive_blockTime_milliseconds_sum 0"))
  }

  test("prometheus histogram buckets are cumulative with the reference bounds") {
    val items = Seq.empty[(String, String, Long, Long)]
      .toDF("kind", "direction", "items", "bytes")
    // 0.05 → every bucket; 1.6 → from le=1.75 up; 99 → only +Inf
    val durations = Seq(0.05, 1.6, 99.0).toDF("seconds")
    val lines = Sinks.prometheusLines(items, durations).as[String].collect()
    def cum(le: String) = lines
      .find(_.contains(s"""le="$le"""")).get.split(' ').last.toLong
    assert(cum("0.1") === 1L)
    assert(cum("1.5") === 1L)
    assert(cum("1.75") === 2L)
    assert(cum("30.0") === 2L)
    assert(cum("+Inf") === 3L)
    assert(lines.contains("graft_archive_blockTime_seconds_count 3"))
    // 50 + 1600 + 99000 ms
    assert(lines.contains("graft_archive_blockTime_milliseconds_sum 100650"))
  }
}
