package graft.archive

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Mirrors the reference's find_incomplete_tables / range-group scenarios
  * (src/storage/mod.rs:260-611, src/archiver/range_group.rs).
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def catalogOf(files: String*) =
    Catalog.withParsedNames(files.toDF("path"))

  test("parse mixed singles and ranges from paths") {
    val c = catalogOf(
      "/a/000000000/000000000/000000100.blocks.avro",
      "/a/000000000/range-000000200_000000299.txes.avro",
      "/a/000000000/000000000/000000101.abc12f.blocks.avro")
      .orderBy("start_h").collect()
    assert(c.map(_.getAs[Long]("start_h")).toSeq === Seq(100L, 101L, 200L))
    assert(c.map(_.getAs[Long]("end_h")).toSeq === Seq(100L, 101L, 299L))
    assert(c.map(_.getAs[String]("kind")).toSeq === Seq("blocks", "blocks", "txes"))
    assert(c.map(_.getAs[String]("fork_hash")).toSeq === Seq(null, "abc12f", null))
  }

  test("groupTables flags duplicates and incomplete groups") {
    val g = Catalog.groupTables(catalogOf(
      "/a/000000100.blocks.avro", "/a/000000100.txes.avro",      // complete
      "/a/000000101.blocks.avro",                                 // missing txes
      "/a/000000102.blocks.avro", "/a/000000102.aa.blocks.avro",  // duplicate blocks
      "/a/000000102.txes.avro"))
      .orderBy("start_h").collect()
    assert(g.map(_.getAs[Boolean]("complete")).toSeq === Seq(true, false, true))
    assert(g.map(_.getAs[Boolean]("duplicate")).toSeq === Seq(false, false, true))
  }

  test("missingHeights: gaps vs mixed single+range coverage") {
    val c = catalogOf(
      "/a/000000010.blocks.avro",
      "/a/range-000000012_000000014.blocks.avro",
      "/a/000000017.blocks.avro")
    val missing = Catalog.missingHeights(spark, c, 10L, 18L)
      .orderBy("height").as[Long].collect().toSeq
    assert(missing === Seq(11L, 15L, 16L, 18L))
  }

  test("intersecting prunes non-overlapping ranges") {
    val c = catalogOf(
      "/a/range-000000000_000000099.blocks.avro",
      "/a/range-000000100_000000199.blocks.avro",
      "/a/range-000000200_000000299.blocks.avro")
    val hit = Catalog.intersecting(c, 150L, 210L)
      .select("start_h").as[Long].collect().sorted.toSeq
    assert(hit === Seq(100L, 200L))
  }
}
