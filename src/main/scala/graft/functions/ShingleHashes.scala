package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Native codegen'd n-gram shingle hashes over a token array: one
  * chained xxhash64 per gram position, hashing the n word tuples'
  * UTF8String bytes IN PLACE — no gram-string concat, no array slice,
  * and (the reason this is an Expression and not a `transform` lambda)
  * no per-element interpreted evaluation: higher-order functions are
  * CodegenFallback, so a lambda body of `xxhash64(get, get, get)` runs
  * through the interpreted `InterpretedHashFunction` per gram — the
  * round-14 A/B measured that spelling 1.8–2.2× SLOWER than the string
  * kernel it replaced (fill:shingles 3.88 → 6.84 s min), while this
  * kernel is one static call inside whole-stage codegen.
  *
  * Hash semantics are bit-identical to the builtin multi-arg
  * `xxhash64(w_i, …, w_{i+n-1})` (seed 42, per-child
  * `XXH64.hashUTF8String(w, prevHash)`, null children skipped), pinned
  * by a unit test — so the values agree with the lambda spelling
  * `TextAnalysis.shingleHashedStructs` keeps for its member-sized
  * consumer. Short arrays (size < n) emit ONE gram over the available
  * prefix — the same degradation `slice` gave the string kernel and the
  * null-skip gave the lambda spelling (equivalence classes:
  * [[graft.text.TextAnalysis.shingleHashes]]'s scaladoc).
  *
  * (Training-pipeline extension scope; the reference archives blocks,
  * not documents — no analogue.)
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1 && n <= 64, s"shingle width must be in [1, 64], got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs array<string> tokens, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    GramHashKernel.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramHashKernel.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  import org.apache.spark.sql.graft.Bridge
  /** Column API over a TOKEN ARRAY column (not text — callers that
    * already hold the split array, e.g. the substring-spans 8-gram
    * stream, pass it directly).
    */
  def apply(tokens: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(tokens), n))
}

/** Row-local gram-hash kernel (static object → scalac emits a static
  * forwarder janino resolves from generated code).
  */
object GramHashKernel {

  private val Seed = 42L // Spark's hash-expression seed

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val m = math.max(1, len - (n - 1))
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = Seed
      val end = math.min(i + n, len)
      var k = i
      while (k < end) {
        // split-produced tokens are never null, but the builtin hash
        // SKIPS null children — match it exactly for any caller.
        if (!arr.isNullAt(k)) h = XXH64.hashUTF8String(arr.getUTF8String(k), h)
        k += 1
      }
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
