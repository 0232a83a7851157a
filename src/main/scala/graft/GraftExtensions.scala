package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{ArrayDot, ArrayOrderedPairs}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  *
  * (SURVEY.md §4 concluded no custom optimizer Rules/Strategies are needed
  * for the reference's surface — the extension point carries only function
  * registrations.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayDot(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("array_ordered_pairs"),
      new ExpressionInfo(classOf[ArrayOrderedPairs].getName, "array_ordered_pairs"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayOrderedPairs(exprs(0))))
  }
}

object GraftExtensions {
  /** Register the same functions on an ALREADY-RUNNING session
    * (`withExtensions` only applies when the session is first built —
    * getOrCreate on an existing JVM session silently ignores it).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_ordered_pairs", exprs => ArrayOrderedPairs(exprs(0)), "built-in")
    }
}
