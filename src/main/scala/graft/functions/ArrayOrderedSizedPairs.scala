package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All ordered pairs (i < j) of an array of (id, n) structs, with the
  * set-similarity LENGTH FILTER fused into the generator: a pair whose
  * set sizes satisfy min(n1,n2) < t·max(n1,n2) can never reach jaccard
  * ≥ t (|A∩B| ≤ min ⇒ j ≤ min/max — the length filter of the
  * similarity-join literature, e.g. Arasu et al. VLDB'06 §4 / Xiao et
  * al. PPJoin) and is dropped BEFORE it is ever materialized — before
  * the pair shuffle, which round-13 profiling showed dominates the
  * jaccard path at 100× (125M pair rows vs 26M shingle rows at sf10;
  * the post-agg size joins this fusion replaces were two more full
  * sorts of that table).
  *
  * `ratioMicro` is ⌊t·10⁶⌋ − 1 (see the companion apply): the final
  * filter downstream compares round(jac, 6) ≥ t, which admits true jac
  * as low as t − 5·10⁻⁷, so the prefilter bound must be at least that
  * much looser — ⌊t·10⁶⌋ − 1 ≤ ⌊(t − 5·10⁻⁷)·10⁶⌋ is conservative for
  * every t (an unrounded ⌊t·10⁶⌋ bound would drop a pair whose exact
  * ratio sits just under t but ROUNDS to t, e.g. |A|=999999,
  * |B|=2·10⁶ at t=0.5 — review r13). The comparison is exact long
  * arithmetic (min·10⁶ ≥ ratioMicro·max), skipped for sets past 9·10⁶
  * elements where it could overflow (such pairs pass through to the
  * exact filter downstream).
  *
  * Input must be sorted ascending by id (array_sort of the collect_list;
  * ids are distinct within a list) so d1 < d2 holds for every pair.
  * Output: `array<struct<d1,n1,d2,n2>>` — the sizes ride along so the
  * jaccard needs NO join back to a per-doc size table.
  *
  * (The reference has no set-similarity ops; this backs the
  * scale-extension dedup operators, SURVEY.md §7 phase 8.)
  */
case class ArrayOrderedSizedPairs(child: Expression, ratioMicro: Long)
    extends UnaryExpression {

  require(ratioMicro >= 0L && ratioMicro <= 1000000L,
    s"ratioMicro must be in [0, 1e6], got $ratioMicro")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("d1", LongType, nullable = false),
      StructField("n1", LongType, nullable = false),
      StructField("d2", LongType, nullable = false),
      StructField("n2", LongType, nullable = false))),
    containsNull = false)

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fields), _)
          if fields.length == 2 && fields.forall(_.dataType == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_ordered_sized_pairs needs array<struct<bigint,bigint>>, got $other")
    }

  // Overflow guard bound for the exact long-arithmetic ratio test:
  // min·10⁶ and ratioMicro·max both stay < 2⁶³ while max ≤ 9e6.
  private val MaxN = 9000000L

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val ri = a.getStruct(i, 2)
      val id1 = ri.getLong(0)
      val n1 = ri.getLong(1)
      var j = i + 1
      while (j < n) {
        val rj = a.getStruct(j, 2)
        val n2 = rj.getLong(1)
        val mn = math.min(n1, n2)
        val mx = math.max(n1, n2)
        if (mx > MaxN || mn * 1000000L >= ratioMicro * mx) {
          out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](id1, n1, rj.getLong(0), n2))
          k += 1
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(if (k == out.length) out else out.take(k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val id1 = ctx.freshName("id1")
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val mn = ctx.freshName("mn")
      val mx = ctx.freshName("mx")
      val ri = ctx.freshName("ri")
      val rj = ctx.freshName("rj")
      val out = ctx.freshName("out")
      val row = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
      val ir = "org.apache.spark.sql.catalyst.InternalRow"
      s"""
         |int $n = $a.numElements();
         |Object[] $out = new Object[$n * ($n - 1) / 2];
         |int $k = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $ir $ri = $a.getStruct($i, 2);
         |  long $id1 = $ri.getLong(0);
         |  long $n1 = $ri.getLong(1);
         |  for (int $j = $i + 1; $j < $n; $j++) {
         |    $ir $rj = $a.getStruct($j, 2);
         |    long $n2 = $rj.getLong(1);
         |    long $mn = Math.min($n1, $n2);
         |    long $mx = Math.max($n1, $n2);
         |    if ($mx > ${MaxN}L || $mn * 1000000L >= ${ratioMicro}L * $mx) {
         |      $out[$k++] = new $row(new Object[]{$id1, $n1, $rj.getLong(0), $n2});
         |    }
         |  }
         |}
         |if ($k != $out.length) $out = java.util.Arrays.copyOf($out, $k);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayOrderedSizedPairs =
    copy(child = newChild)
}

object ArrayOrderedSizedPairs {
  import org.apache.spark.sql.graft.Bridge
  /** Column API: length-filtered (i < j) pairs of an (id, n) struct
    * array; `threshold` is the jaccard threshold the filter serves.
    * ⌊t·10⁶⌋ − 1, clamped at 0: conservative against the downstream
    * round(jac, 6) ≥ t compare (see the class scaladoc).
    */
  def apply(a: Column, threshold: Double): Column =
    Bridge.column(ArrayOrderedSizedPairs(Bridge.expression(a),
      math.max(0L, math.floor(threshold * 1000000.0).toLong - 1L)))
}
