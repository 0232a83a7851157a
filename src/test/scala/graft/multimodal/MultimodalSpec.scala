package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "a" * 100), (2L, "xyz")).toDF("doc_id", "text")

  test("ToyMedia header round-trips and rejects every corruption class") {
    val payload = "hello media".getBytes("UTF-8")
    val b = ToyMedia.wrap(3, 1280, 720, payload)
    assert(b.length === ToyMedia.HeaderLen + payload.length)
    assert(ToyMedia.parse(b) === Some((3, 1280, 720, payload.length)))
    // magic
    val m = b.clone(); m(0) = 'X'.toByte
    assert(ToyMedia.parse(m).isEmpty)
    // version
    val v = b.clone(); v(4) = 2
    assert(ToyMedia.parse(v).isEmpty)
    // kind out of range
    val k = b.clone(); k(5) = 9
    assert(ToyMedia.parse(k).isEmpty)
    // truncated payload disagrees with the declared length
    assert(ToyMedia.parse(b.dropRight(1)).isEmpty)
    // shorter than one header
    assert(ToyMedia.parse(Array[Byte]('G', 'R', 'F', 'T', 1)).isEmpty)
  }

  test("decodeStub parses real headers per partition; corrupt magic degrades to fallback") {
    val media = Multimodal.toyMedia(docs)
    val meta = Multimodal.decodeStub(spark, media)
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).header_ok === 1)
    assert(meta(1L).kind === Multimodal.kindFor(1L))
    assert(meta(1L).width === Multimodal.widthFor(1L))
    assert(meta(1L).height === Multimodal.heightFor(1L))
    assert(meta(1L).n_payload === 100)
    assert(meta(2L).n_payload === 3)
    // id 0 % 17 == 0 → corrupted magic → opaque-blob fallback
    val corrupt = Multimodal.toyMedia(Seq((0L, "zz")).toDF("doc_id", "text"))
    val c = Multimodal.decodeStub(spark, corrupt).collect().head
    assert(c.header_ok === 0 && c.kind === 0)
    assert(c.n_payload === ToyMedia.HeaderLen + 2)
    assert(c.width === (ToyMedia.HeaderLen + 2) % 640)
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
