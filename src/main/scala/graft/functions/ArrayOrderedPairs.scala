package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All ordered pairs (i < j) of a long array, as `array<struct<d1,d2>>`.
  *
  * Backs the shingle-list pair generation in the jaccard path: after
  * `groupBy(shingle).collect_list(id)` the co-occurring doc ids sit in one
  * (df-pruned, ≤ maxDf) array, and this expression expands the C(n,2)
  * pairs in a tight generated loop. The higher-order-function spelling
  * (`transform` with index + `slice` + nested `transform` + `flatten`)
  * allocates an interpreter frame per element; this is one loop and one
  * output array. With the input sorted ascending, d1 < d2 holds for every
  * emitted pair.
  *
  * (The reference has no set-similarity ops; this backs the scale-extension
  * dedup operators, SURVEY.md §7 phase 8.)
  */
case class ArrayOrderedPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("d1", LongType, nullable = false),
      StructField("d2", LongType, nullable = false))),
    containsNull = false)

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_ordered_pairs needs array<bigint>, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](x, a.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      val row = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
      s"""
         |int $n = $a.numElements();
         |Object[] $out = new Object[$n * ($n - 1) / 2];
         |int $k = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $a.getLong($i);
         |  for (int $j = $i + 1; $j < $n; $j++) {
         |    $out[$k++] = new $row(new Object[]{$x, $a.getLong($j)});
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayOrderedPairs =
    copy(child = newChild)
}

object ArrayOrderedPairs {
  import org.apache.spark.sql.graft.Bridge
  /** Column API: all (i < j) pairs of a long array. */
  def apply(a: Column): Column =
    Bridge.column(ArrayOrderedPairs(Bridge.expression(a)))
}
