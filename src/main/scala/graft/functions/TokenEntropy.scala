package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd per-document lexical-diversity statistics: given the
  * token array, returns struct(n_tokens, n_types, sum_e6) where n_types is
  * the distinct-token count and sum_e6 = Σ_types c·round(ln(n/c)·10⁶) — the
  * integer micro-nat numerator of the doc's Shannon token entropy
  * H = Σ (c/n)·ln(n/c). The caller divides by n_tokens once and snaps,
  * so the only floating-point steps are one libm ln per TYPE (snapped
  * before any summation — order-free) and one final division, the same
  * engine-parity discipline as text-unigram-logprob.
  *
  * Every token of a document lives in ONE row's array, so the whole
  * computation is row-local — zero shuffle, inside whole-stage codegen —
  * where the naive spelling (explode → groupBy(doc_id, w) →
  * groupBy(doc_id)) shuffles the corpus token stream twice.
  * Training-pipeline extension op (no reference analogue; the reference
  * archives blocks, not documents).
  */
case class TokenEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("sum_e6", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_entropy needs array<string> tokens, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    EntropyStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.EntropyStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenEntropy =
    copy(child = newChild)
}

object TokenEntropy {
  import org.apache.spark.sql.graft.Bridge
  def apply(tokens: Column): Column =
    Bridge.column(TokenEntropy(Bridge.expression(tokens)))
}

/** Row-local entropy kernel (static so generated code calls it directly —
  * same janino-visible forwarder shape as [[GramStats]]).
  */
object EntropyStats {

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer](math.max(8, n * 2))
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val c = counts.get(s)
      counts.put(s, if (c == null) Integer.valueOf(1) else Integer.valueOf(c.intValue() + 1))
      i += 1
    }
    var sumE6 = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().longValue()
      // round(ln(n/c)·1e6) per TYPE, then integer-weighted sum: Math.round
      // (half-up for the non-negative ln(n/c)) matches DuckDB's
      // round-half-away, and the double division n/c is IEEE-identical on
      // both engines — the one libm call per type is the only fp step.
      sumE6 += c * Math.round(Math.log(n.toDouble / c) * 1e6)
    }
    new GenericInternalRow(Array[Any](n.toLong, counts.size.toLong, sumE6))
  }
}
