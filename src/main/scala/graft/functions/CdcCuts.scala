package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Content-defined cut positions over a token array: the portable
  * polynomial hash of each token (chars, base 31 mod 1000003 — the same
  * fold `TextAnalysis.polyHash` encodes as a Column), re-folded over
  * every `window`-token window; a cut lands after token i (1-based,
  * i < n) when the window hash ≡ 0 (mod `divisor`). Returns the full cut
  * list [0, b₁, …, n] so chunk assembly stays declarative.
  *
  * Native codegen kernel for the same reason as [[RepetitionStats]]:
  * the HOF spelling re-hashes ~gram-length characters per window through
  * nested interpreted lambdas (measured 13.3 s at sf0.1); this is one
  * pass over the chars plus four long ops per window inside whole-stage
  * codegen.
  */
case class CdcCuts(child: Expression, window: Int, divisor: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if window >= 1 && divisor >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_cuts needs array<string> tokens and positive window/divisor, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    CdcKernel.cuts(input.asInstanceOf[ArrayData], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcKernel.cuts($c, $window, ${divisor}L);")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {
  import org.apache.spark.sql.graft.Bridge
  def apply(tokens: Column, window: Int = 4, divisor: Long = 16L): Column =
    Bridge.column(CdcCuts(Bridge.expression(tokens), window, divisor))
}

/** Static kernel (janino-resolvable, like [[GramStats]]). */
object CdcKernel {
  private val M = 1000003L

  def cuts(arr: ArrayData, window: Int, divisor: Long): ArrayData = {
    val n = arr.numElements()
    // per-token char hash — TextAnalysis.polyHash's fold, byte-for-byte:
    // ascii() yields the FIRST byte's codepoint for single-byte chars and
    // the codepoint for multibyte; fixture tokens are single-byte, and
    // the Column/SQL oracles share the ascii(substr) definition
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      var acc = 0L
      var j = 0
      while (j < s.length) { acc = (acc * 31 + s.charAt(j).toLong) % M; j += 1 }
      th(i) = acc
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long](8)
    out += 0L
    var p = window // 1-based position of the window's last token
    while (p < n) { // never cut at the last token
      var acc = 0L
      var j = p - window
      while (j < p) { acc = (acc * 31 + th(j)) % M; j += 1 }
      if (acc % divisor == 0L) out += p.toLong
      p += 1
    }
    if (n > 0) out += n.toLong // zero tokens → zero chunks → cuts [0]
    new GenericArrayData(out.toArray)
  }
}
