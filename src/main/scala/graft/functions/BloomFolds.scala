package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The bloom-filter hash family over a string in ONE character pass:
  * k=3 independent polynomial folds ((h·m + char) mod p for
  * (31, 1000003), (37, 999983), (41, 999979)) returned as array<long>.
  * Each fold is the portable [[graft.text.TextAnalysis.polyHash]] shape —
  * DuckDB's list_reduce over the ascii list computes identical values —
  * with distinct multiplier/modulus pairs so position collisions are
  * independent across the family.
  *
  * Native codegen kernel for the same reason as [[CdcCuts]]: the HOF
  * spelling walks the string through an interpreted lambda per character
  * PER FOLD (3 aggregate() calls — measured 2.4 s at sf0.1 for
  * dedup-bloom-screen); this is one pass inside whole-stage codegen.
  * Character semantics: charAt matches ascii(substr) for single-byte
  * payloads — the same contract as [[GradientSampleHash]]/[[CdcKernel]].
  */
case class BloomFolds(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bloom_folds needs a string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    BloomKernel.folds(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomKernel.folds($c);")

  override protected def withNewChildInternal(newChild: Expression): BloomFolds =
    copy(child = newChild)
}

object BloomFolds {
  import org.apache.spark.sql.graft.Bridge
  def apply(s: Column): Column = Bridge.column(BloomFolds(Bridge.expression(s)))
}

/** Static kernel (janino-resolvable, like [[CdcKernel]]). */
object BloomKernel {
  def folds(s: UTF8String): ArrayData = {
    val str = s.toString
    var h1 = 0L; var h2 = 0L; var h3 = 0L
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i).toLong
      h1 = (h1 * 31 + c) % 1000003L
      h2 = (h2 * 37 + c) % 999983L
      h3 = (h3 * 41 + c) % 999979L
      i += 1
    }
    new GenericArrayData(Array(h1, h2, h3))
  }
}
