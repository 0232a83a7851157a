package graft.commands

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** End-to-end lifecycle over a temp archive: archive (with a planted gap)
  * → verify flags it → fix heals it → verify clean → compact → stream
  * appends a live tail idempotently.
  */
class CommandsSpec extends SparkSpec {
  import spark.implicits._

  private def rawChain(hs: Seq[Long]) = {
    def h(x: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.toString.getBytes).map("%02x".format(_)).mkString
    hs.map(x => (x, h(x), h(x - 1), s"payload-$x"))
      .toDF("height", "blockId", "parentId", "payload")
  }

  test("archive -> verify -> fix -> verify -> compact lifecycle") {
    val dir = Files.createTempDirectory("graft-arch").toString
    val raw = rawChain(0L to 299L)

    // archive with a planted gap (skip 120..129)
    val gappy = raw.filter(!col("height").between(120, 129))
    val summary = Commands.archive(spark, gappy, dir, 0L, 299L, chunkSize = 100L)
    assert(summary.filter(col("complete")).count() === 2) // chunks 0 and 2

    val v1 = Commands.verify(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v1("missing-heights") === 10L)
    assert(v1("chain-breaks") === 1L) // the gap breaks the chain once
    assert(v1("dup-heights") === 0L)

    // fix re-archives exactly the missing heights
    val missing = Commands.fix(spark, raw, dir, dir, 0L, 299L)
      .orderBy("height").as[Long].collect()
    assert(missing.toSeq === (120L to 129L))

    val v2 = Commands.verify(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v2("missing-heights") === 0L)
    assert(v2("chain-breaks") === 0L)
    assert(v2("total-blocks") === 300L)

    // compact: all three chunks now complete
    val out = Files.createTempDirectory("graft-compacted").toString
    val verdicts = Commands.compact(spark, dir, out, chunkSize = 100L)
    assert(verdicts.filter(col("complete")).count() === 3)
    assert(spark.read.parquet(out).count() === 300L)
  }

  test("verify audits an Avro-format archive (the reference's own format)") {
    import org.apache.spark.sql.Row
    import java.sql.Timestamp
    def blockRow(h: Long, parent: Long): Row = {
      def md5s(x: Long) = java.security.MessageDigest.getInstance("MD5")
        .digest(x.toString.getBytes).map("%02x".format(_)).mkString
      Row("BITCOIN", "BTC", new Timestamp(0L), h, md5s(h), md5s(parent),
        new Timestamp(h), Array.emptyByteArray, 0, null, null)
    }
    // gap at 15, plus a parent-hash corruption at 18
    val rows = ((10L to 20L).filterNot(_ == 15L)).map(h =>
      if (h == 18L) blockRow(h, 999L) else blockRow(h, h - 1))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), graft.model.Schemas.block)
    val dir = Files.createTempDirectory("graft-avro-verify").toString
    graft.sources.AvroArchiveSink.write(df, "blocks", dir, "snappy")
    val v = Commands.verify(spark, dir, format = "avro")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v("total-blocks") === 10L)
    assert(v("missing-heights") === 1L)
    assert(v("chain-breaks") === 2L) // the gap at 15→16 AND the bad parent at 18
    assert(v("dup-heights") === 0L)
  }

  test("stream appends live heads into the archive") {
    val dir = Files.createTempDirectory("graft-stream-arch").toString
    val heads = Files.createTempDirectory("graft-heads2").toString
    val ckpt = Files.createTempDirectory("graft-ckpt2").toString
    rawChain(500L to 509L).coalesce(1).write.mode("append").parquet(heads)
    val schema = StructType(Seq(
      StructField("height", LongType), StructField("blockId", StringType),
      StructField("parentId", StringType), StructField("payload", StringType)))
    Commands.stream(spark, heads, schema, dir, ckpt)
    val v = Commands.verify(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v("total-blocks") === 10L)
    assert(v("chain-breaks") === 0L)

    // replay: a fresh checkpoint re-delivers every batch (the worst-case
    // at-least-once recovery) — idempotent writes must not duplicate
    // heights (reference stream.rs:49-52 never overwrites)
    val ckpt2 = Files.createTempDirectory("graft-ckpt2b").toString
    Commands.stream(spark, heads, schema, dir, ckpt2)
    val v2 = Commands.verify(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v2("total-blocks") === 10L)
    assert(v2("dup-heights") === 0L)
  }
}
