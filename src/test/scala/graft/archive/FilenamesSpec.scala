package graft.archive

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Mirrors the reference's filename round-trip tests
  * (src/archiver/filenames.rs:222-408).
  */
class FilenamesSpec extends SparkSpec {
  import spark.implicits._

  test("single path layout and round-trip parse") {
    val df = Seq(723743L, 0L, 999L, 1000L, 1000000L).toDF("h")
      .select(col("h"),
        Filenames.singlePath(col("h"), "block").as("path"),
        Filenames.singleFile(col("h"), "block").as("file"))
    val got = df.select(col("h"), col("path"),
        Filenames.parseStart(col("file")).as("s"),
        Filenames.parseEnd(col("file")).as("e"),
        Filenames.parseKind(col("file")).as("k"),
        Filenames.parseForkHash(col("file")).as("fh"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === r.getLong(0), "start round-trip")
      assert(r.getLong(3) === r.getLong(0), "end round-trip")
      assert(r.getString(4) === "block")
      assert(r.isNullAt(5), "no fork hash")
    }
    val p = got.find(_.getLong(0) == 723743L).get.getString(1)
    assert(p === "000000000/000723000/000723743.block.avro")
    assert(got.length === 5)
  }

  test("range file round-trip parse") {
    val df = Seq((723745L, 723749L)).toDF("s", "e")
      .select(Filenames.rangeFile(col("s"), col("e"), "blocks").as("file"),
        Filenames.rangePath(col("s"), col("e"), "blocks").as("path"))
    val r = df.select(col("file"), col("path"),
        Filenames.parseStart(col("file")).as("ps"),
        Filenames.parseEnd(col("file")).as("pe"),
        Filenames.parseKind(col("file")).as("k"),
        Filenames.isRange(col("file")).as("ir"))
      .head()
    assert(r.getString(0) === "range-000723745_000723749.blocks.avro")
    assert(r.getString(1) === "000000000/range-000723745_000723749.blocks.avro")
    assert(r.getLong(2) === 723745L && r.getLong(3) === 723749L)
    assert(r.getString(4) === "blocks" && r.getBoolean(5))
  }

  test("forked single carries its hash") {
    val df = Seq((723743L, "abc123")).toDF("h", "hash")
      .select(Filenames.singleFile(col("h"), "block", Some(col("hash"))).as("file"))
    val r = df.select(
        Filenames.parseForkHash(col("file")).as("fh"),
        Filenames.parseKind(col("file")).as("k"),
        Filenames.parseStart(col("file")).as("s"))
      .head()
    assert(r.getString(0) === "abc123")
    assert(r.getString(1) === "block")
    assert(r.getLong(2) === 723743L)
  }
}
