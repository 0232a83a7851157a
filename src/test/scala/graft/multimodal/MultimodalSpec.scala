package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "a" * 100), (2L, "xyz")).toDF("doc_id", "text")

  test("decodeStub derives metadata from payload bytes per partition") {
    val media = Multimodal.withBinaryPayload(docs, "doc_id", "text")
    val meta = Multimodal.decodeStub(spark, media)
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).n_bytes === 100)
    assert(meta(1L).width === 100 % 640)
    assert(meta(1L).height === 700 % 480)
    assert(meta(2L).n_bytes === 3)
  }

  test("frameOffsets samples 5 evenly spaced frames") {
    val media = docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
    val frames = Multimodal.frameOffsets(media)
      .filter(col("doc_id") === 1L)
      .orderBy("frame_no")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(frames.toSeq === Seq((0L, 0L), (1L, 20L), (2L, 40L), (3L, 60L), (4L, 80L)))
  }
}
