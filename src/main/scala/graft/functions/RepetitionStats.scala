package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd per-document word-gram repetition statistics (the
  * Gopher-style repetition signals): given the token array, returns
  * struct(n2, dup2, top2, n3, dup3) where nK = number of word K-grams,
  * dupK = total occurrences of K-grams appearing more than once, top2 =
  * occurrences of the single most frequent 2-gram.
  *
  * Gram semantics match DuckDB `ws[i:i+K-1]` slicing for i in
  * 1..max(1, n-K+1): when the document has fewer than K tokens the single
  * clipped gram is the whole array (nK=1, dupK=0, topK=1).
  *
  * This replaces two corpus-wide explode→groupBy(doc_id, gram) shuffles:
  * every gram of a document lives in ONE row's token array, so the whole
  * computation is row-local — zero shuffle, stays inside whole-stage
  * codegen (one static call per row, no gram strings ever materialize:
  * tokens intern to int ids and grams pack into one long each).
  * Training-pipeline extension op (no reference analogue; the reference
  * archives blocks, not documents).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n2", LongType, nullable = false),
    StructField("dup2", LongType, nullable = false),
    StructField("top2", LongType, nullable = false),
    StructField("n3", LongType, nullable = false),
    StructField("dup3", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats needs array<string> tokens, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    GramStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  import org.apache.spark.sql.graft.Bridge
  def apply(tokens: Column): Column =
    Bridge.column(RepetitionStats(Bridge.expression(tokens)))
}

/** Row-local gram counting kernel (static so generated code can call it
  * directly — `GramStats` has no companion class, so scalac emits a static
  * forwarder janino resolves like any Java static method).
  */
object GramStats {

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    // Intern tokens to dense int ids; a K-gram then packs into one long
    // (base-n positional code), so counting never concatenates strings.
    val ids = new Array[Int](n)
    val intern = new java.util.HashMap[UTF8String, Integer](math.max(8, n * 2))
    var i = 0
    var next = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val id = intern.get(s)
      if (id == null) { intern.put(s, Integer.valueOf(next)); ids(i) = next; next += 1 }
      else ids(i) = id.intValue()
      i += 1
    }
    val r2 = gramStats(ids, 2)
    val r3 = gramStats(ids, 3)
    new GenericInternalRow(Array[Any](r2(0), r2(1), r2(2), r3(0), r3(1)))
  }

  // (nGrams, dupOccurrences, topCount) for word k-grams over interned ids.
  // Base-n packing needs n^k < 2^63; docs beyond ~2M tokens (k=3) fall back
  // to boxed-tuple keys rather than silently overflowing.
  private def gramStats(ids: Array[Int], k: Int): Array[Long] = {
    val n = ids.length
    if (n < k) return Array(1L, 0L, 1L)
    val m = n - k + 1
    val counts = new java.util.HashMap[AnyRef, Integer](m * 2)
    val packable = n < 2000000 || k < 3
    var i = 0
    while (i < m) {
      val key: AnyRef =
        if (packable) {
          var acc = 0L
          var j = 0
          while (j < k) { acc = acc * n + ids(i + j); j += 1 }
          java.lang.Long.valueOf(acc)
        } else {
          val a = new Array[Int](k)
          System.arraycopy(ids, i, a, 0, k)
          a.mkString(",")
        }
      val c = counts.get(key)
      counts.put(key, if (c == null) Integer.valueOf(1) else Integer.valueOf(c.intValue() + 1))
      i += 1
    }
    var dup = 0L
    var top = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().longValue()
      if (c > 1) dup += c
      if (c > top) top = c
    }
    Array(m.toLong, dup, top)
  }
}
