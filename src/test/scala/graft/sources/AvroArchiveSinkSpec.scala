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
    // parallelize splits contiguously, so the 4 partitions carry disjoint
    // height ranges → 4 discoverable range files
    val rows = spark.createDataFrame(
      spark.sparkContext.parallelize((0L to 99L).map(blockRow), 4), Schemas.block)
    for (codec <- Seq("snappy", "zstd", "deflate")) {
      val out = Files.createTempDirectory(s"graft-avro-$codec").toString
      val n = AvroArchiveSink.write(rows, "blocks", out, codec)
      assert(n === 100L)
      // files land under the reference's L1 layout with parseable names
      // (the filename IS the metadata — src/archiver/filenames.rs:69-83)
      val files = AvroArchiveSource.listAvroFiles(spark, out)
      assert(files.size === 4)
      assert(files.forall(_.contains("/000000000/range-")), files.mkString(","))
      assert(files.forall(f =>
        AvroArchiveSource.parseKindS(f.substring(f.lastIndexOf('/') + 1))
          .contains("blocks")))
      val back = AvroArchiveSource.readArchive(spark, out, "blocks")
      assert(back.count() === 100L)
      val r = back.filter(col("height") === 42L).head()
      assert(r.getAs[String]("blockId") === "hash-42")
      assert(new String(r.getAs[Array[Byte]]("json"), "UTF-8") === """{"height":42}""")
      assert(r.getAs[Timestamp]("archiveTimestamp").getTime === 1700000000000L)
      assert(r.isNullAt(r.fieldIndex("uncle0Json")))
    }
  }

  test("reference golden file re-encodes losslessly to a reference name") {
    val golden = AvroArchiveSource.read(spark,
      "/root/reference/testdata/fullAvroFiles/000723744.txes.avro", "txes")
    val out = Files.createTempDirectory("graft-avro-reenc").toString
    val n = AvroArchiveSink.write(golden.coalesce(1), "txes", out, "snappy")
    assert(n === 423L)
    // one height → a single-file name the reference's parser accepts
    val files = AvroArchiveSource.listAvroFiles(spark, out)
    assert(files.size === 1)
    assert(files.head.endsWith("000000000/000723000/000723744.txes.avro"), files.head)
    val back = AvroArchiveSource.readArchive(spark, out, "txes")
    assert(back.count() === 423L)
    // content-level equality: same txid set, same per-record payload sizes
    val origAgg = golden.agg(
      countDistinct("txid"), sum(length(col("json"))), sum(length(col("raw")))).head()
    val backAgg = back.agg(
      countDistinct("txid"), sum(length(col("json"))), sum(length(col("raw")))).head()
    assert(origAgg === backAgg)
  }

  test("writeChunked splits co-located chunks into separate range files") {
    // 40 chunks into 32 shuffle partitions: the pigeonhole guarantees some
    // task holds several chunks — the in-partition split must still emit
    // one range file per chunk, never a merged file spanning two
    val rows = spark.createDataFrame(
      spark.sparkContext.parallelize((0L to 399L).map(blockRow), 8), Schemas.block)
    val out = Files.createTempDirectory("graft-avro-chunked").toString
    val n = AvroArchiveSink.writeChunked(
      rows.withColumn("chunk", org.apache.spark.sql.functions.floor(col("height") / 10)
        .cast("long")),
      "blocks", out, "chunk")
    assert(n === 400L)
    val files = AvroArchiveSource.listAvroFiles(spark, out)
      .map(p => p.substring(p.lastIndexOf('/') + 1))
    assert(files.size === 40)
    assert(files.forall(_.matches("range-\\d{9}_\\d{9}\\.blocks\\.avro")), files.take(3))
    // every file covers exactly one aligned 10-height chunk
    val spans = files.map { f =>
      val m = "range-(\\d+)_(\\d+)".r.findFirstMatchIn(f).get
      (m.group(1).toLong, m.group(2).toLong)
    }
    assert(spans.forall { case (s, e) => e - s === 9 && s % 10 === 0 })
    assert(AvroArchiveSource.readArchive(spark, out, "blocks").count() === 400L)
  }

  test("explicit file:// scheme routes through the Hadoop FileSystem end to end") {
    // the sink resolves the FS from the path URI (objects.rs's S3 backend
    // mounts the same way); an explicit scheme must behave identically to
    // a bare local path — including idempotent singles and the recursive
    // listing on the read side
    val out = "file://" + Files.createTempDirectory("graft-avro-hfs").toString
    val rows = spark.createDataFrame(
      spark.sparkContext.parallelize((0L to 19L).map(blockRow), 2), Schemas.block)
    val n = AvroArchiveSink.writeSingles(rows, "blocks", out)
    assert(n === 20L)
    // replay: every target exists → all skipped, nothing overwritten
    assert(AvroArchiveSink.writeSingles(rows, "blocks", out) === 0L)
    val files = AvroArchiveSource.listAvroFiles(spark, out)
    assert(files.size === 20)
    assert(files.forall(f => f.startsWith("file:") || f.startsWith("/")), files.head)
    // no temp orphans left behind under the scheme'd dir
    assert(!files.exists(_.contains(".graft-tmp-")))
    assert(AvroArchiveSource.readArchive(spark, out, "blocks").count() === 20L)
  }

  test("colliding file ranges are never overwritten") {
    // two partitions holding the same single height would produce the same
    // path — the write must refuse, like the reference's create(overwrite
    // = false) (src/storage/fs.rs:33-39)
    val rows = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(blockRow(7L), blockRow(7L)), 2), Schemas.block)
    val out = Files.createTempDirectory("graft-avro-collide").toString
    val e = intercept[org.apache.spark.SparkException] {
      AvroArchiveSink.write(rows, "blocks", out, "snappy")
    }
    assert(e.getMessage.contains("never overwritten") ||
      Option(e.getCause).exists(_.getMessage.contains("never overwritten")))
  }
}
