package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Schemas

/** Round-trip: engine-written Avro archives decode back identically, and
  * reference-written golden files re-encode losslessly.
  */
class AvroArchiveSinkSpec extends SparkSpec {

  private def blockRow(h: Long): Row = Row(
    "BITCOIN", "BTC", new Timestamp(1700000000000L), h,
    s"hash-$h", s"hash-${h - 1}", new Timestamp(1600000000000L + h),
    s"""{"height":$h}""".getBytes("UTF-8"), 0, null, null)

  test("write then read round-trips records and codecs") {
    val rows = spark.createDataFrame(
      spark.sparkContext.parallelize((0L to 99L).map(blockRow), 4), Schemas.block)
    for (codec <- Seq("snappy", "zstd", "deflate")) {
      val out = Files.createTempDirectory(s"graft-avro-$codec").toString
      val n = AvroArchiveSink.write(rows, "blocks", out, codec)
      assert(n === 100L)
      val back = AvroArchiveSource.read(spark, s"$out/*.avro", "blocks")
      assert(back.count() === 100L)
      val r = back.filter(col("height") === 42L).head()
      assert(r.getAs[String]("blockId") === "hash-42")
      assert(new String(r.getAs[Array[Byte]]("json"), "UTF-8") === """{"height":42}""")
      assert(r.getAs[Timestamp]("archiveTimestamp").getTime === 1700000000000L)
      assert(r.isNullAt(r.fieldIndex("uncle0Json")))
    }
  }

  test("reference golden file re-encodes losslessly") {
    val golden = AvroArchiveSource.read(spark,
      "/root/reference/testdata/fullAvroFiles/000723744.txes.avro", "txes")
    val out = Files.createTempDirectory("graft-avro-reenc").toString
    val n = AvroArchiveSink.write(golden.repartition(2), "txes", out, "snappy")
    assert(n === 423L)
    val back = AvroArchiveSource.read(spark, s"$out/*.avro", "txes")
    assert(back.count() === 423L)
    // content-level equality: same txid set, same per-record payload sizes
    val origAgg = golden.agg(
      countDistinct("txid"), sum(length(col("json"))), sum(length(col("raw")))).head()
    val backAgg = back.agg(
      countDistinct("txid"), sum(length(col("json"))), sum(length(col("raw")))).head()
    assert(origAgg === backAgg)
  }
}
