package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native codegen'd per-payload byte-bucket histogram: counts of bytes
  * by `(b & 0xff) / width` over the whole payload, returned as a dense
  * `array<long>` of 256/width buckets — the feature-extraction kernel
  * of the multimodal tier (round 8).
  *
  * Replaces mm-feature-extract's per-CHARACTER explode: that spelling
  * materialized one row per byte with the FULL payload string carried
  * along (`O(len²)` bytes per document through the aggregate — the
  * scaling harness measured it at slope ~16, the worst non-fill curve
  * on the board, and a 100 KB media payload would emit 10 GB). This is
  * one tight byte loop inside whole-stage codegen, zero shuffle before
  * the (doc, bucket) posexplode. Byte contract matches DuckDB's
  * `ascii(substr(text, i, 1)) // width` for single-byte payloads — the
  * opaque-bytes contract of the multimodal column (same caveat as
  * [[GradientSampleHash]]).
  */
case class ByteBucketHistogram(child: Expression, width: Int)
    extends UnaryExpression {

  private def nBuckets: Int = 256 / width

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if width >= 1 && width <= 256 && 256 % width == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"byte_bucket_histogram needs a string payload and a width dividing 256, got $t / $width")
  }

  override def nullSafeEval(input: Any): Any =
    ByteBucketHistogram.histogram(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteBucketHistogram.histogram($c, $width);")

  override protected def withNewChildInternal(newChild: Expression): ByteBucketHistogram =
    copy(child = newChild)
}

object ByteBucketHistogram {
  import org.apache.spark.sql.graft.Bridge

  def apply(payload: Column, width: Int = 16): Column =
    Bridge.column(ByteBucketHistogram(Bridge.expression(payload), width))

  /** Static kernel (janino-resolvable from generated code). */
  def histogram(s: org.apache.spark.unsafe.types.UTF8String,
      width: Int): GenericArrayData = {
    val b = s.getBytes
    val counts = new Array[Long](256 / width)
    var i = 0
    while (i < b.length) {
      counts((b(i) & 0xff) / width) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }
}
