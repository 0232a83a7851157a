package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd dHash-style gradient fingerprint: `bits` sign bits
  * (sampled byte i < sampled byte i+1) over `bits`+1 evenly spaced byte
  * positions of the payload — bit i at position (i*(n-1))/bits.
  *
  * Replaces the `aggregate(sequence(...), substr, ascii)` higher-order
  * chain in mm-phash-dedup: the HOF evaluates 2·bits interpreted substr
  * calls per row AND re-appears verbatim in every derived join-key filter
  * (each a separate janino compile of the giant lambda tree); this is one
  * tight byte loop inside whole-stage codegen. Semantics match the
  * `ascii(substr(...))` oracle for single-byte (ASCII/binary) payloads —
  * exactly the opaque-bytes contract of the multimodal column
  * (reference stores media as raw bytes: src/storage/avro_reader.rs).
  */
case class GradientSampleHash(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && bits >= 1 && bits <= 62)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gradient_sample_hash needs a string payload and 1..62 bits, got ${child.dataType} / $bits")

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    val n = b.length
    if (n == 0) 0L
    else {
      val nm1 = (n - 1).toLong
      var acc = 0L
      var i = 0
      while (i < bits) {
        val p1 = ((i * nm1) / bits).toInt
        val p2 = (((i + 1) * nm1) / bits).toInt
        if ((b(p1) & 0xff) < (b(p2) & 0xff)) acc |= (1L << i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val nm1 = ctx.freshName("nm1")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |byte[] $b = $c.getBytes();
         |int $n = $b.length;
         |long $acc = 0L;
         |if ($n > 0) {
         |  long $nm1 = (long) ($n - 1);
         |  for (int $i = 0; $i < $bits; $i++) {
         |    int p1 = (int) (($i * $nm1) / $bits);
         |    int p2 = (int) ((($i + 1) * $nm1) / $bits);
         |    if (($b[p1] & 0xff) < ($b[p2] & 0xff)) $acc |= (1L << $i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GradientSampleHash =
    copy(child = newChild)
}

object GradientSampleHash {
  import org.apache.spark.sql.graft.Bridge
  def apply(payload: Column, bits: Int = 48): Column =
    Bridge.column(GradientSampleHash(Bridge.expression(payload), bits))
}
