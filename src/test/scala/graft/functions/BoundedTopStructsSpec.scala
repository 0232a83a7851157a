package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Direct tests for the bounded top-k aggregate's buffer machinery: the
  * serialize/deserialize/merge path only executes when ObjectHashAggregate
  * spills or falls back to sort-based aggregation (> 128 distinct groups
  * per partition by default), so an end-to-end green board could hide a
  * broken serde. These call the TypedImperativeAggregate methods
  * directly, and one end-to-end case forces the sort-based fallback with
  * a low threshold so the UnsafeRow framing runs inside a real query.
  */
class BoundedTopStructsSpec extends SparkSpec {

  private val structType = StructType(Seq(
    StructField("a", LongType), StructField("b", DoubleType)))

  private def agg(k: Int) = BoundedTopStructs(
    org.apache.spark.sql.catalyst.expressions.CreateStruct(Seq(
      BoundReference(0, LongType, nullable = false),
      BoundReference(1, DoubleType, nullable = false))), k)

  private def row(a: Long, b: Double): InternalRow = InternalRow(a, b)

  test("update keeps the k smallest in sorted order; hot path rejects") {
    val a = agg(3)
    val buf = a.createAggregationBuffer()
    Seq(5L, 1L, 9L, 3L, 7L, 2L, 8L).foreach(v => a.update(buf, row(v, v * 0.5)))
    assert(buf.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    val a = agg(4)
    val buf = a.createAggregationBuffer()
    Seq(4L, 2L, 8L, 6L, 1L).foreach(v => a.update(buf, row(v, -v * 1.25)))
    val back = a.deserialize(a.serialize(buf))
    assert(back.length == buf.length)
    buf.zip(back).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0) && x.getDouble(1) == y.getDouble(1))
    }
    // deserialized rows must still merge/compare correctly (UnsafeRow vs
    // GenericInternalRow orderings agree)
    val merged = a.merge(a.createAggregationBuffer(), back)
    assert(merged.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 6L))
  }

  test("merge of disjoint buffers equals top-k of the union") {
    val a = agg(3)
    val b1 = a.createAggregationBuffer()
    val b2 = a.createAggregationBuffer()
    Seq(10L, 30L, 50L).foreach(v => a.update(b1, row(v, 0.0)))
    Seq(20L, 5L, 40L).foreach(v => a.update(b2, row(v, 0.0)))
    val m = a.merge(b1, a.deserialize(a.serialize(b2)))
    assert(m.map(_.getLong(0)).toSeq == Seq(5L, 10L, 20L))
  }

  test("empty buffer serializes, merges and evals to an empty array") {
    val a = agg(2)
    val empty = a.deserialize(a.serialize(a.createAggregationBuffer()))
    assert(empty.isEmpty)
    val m = a.merge(a.createAggregationBuffer(), empty)
    assert(a.eval(m).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .numElements() == 0)
  }

  test("descending keys with NULLs match the window spelling (NULLS LAST)") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 1000)
      .select((col("id") % 7).as("g"),
        when(col("id") % 11 === 0, lit(null)).otherwise(col("id") * 13 % 97)
          .as("v"),
        col("id"))
    val got = graft.functions.TopK.topkPerGroup(
      df, Seq("g"), Seq(col("v").desc, col("id").asc), k = 4)
      .select("g", "v", "id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).sortBy(_.toString)
    val want = df
      .withColumn("_rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)))
      .filter(col("_rn") <= 4).select("g", "v", "id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).sortBy(_.toString)
    assert(got.toSeq == want.toSeq,
      "aggregate top-k diverges from the window spelling under NULL keys")
    // sanity: some group's top-4 actually contains a NULL (small groups
    // of 7 with 1-in-11 nulls — make the test mean something)
    assert(got.exists(_._2.isEmpty) || want.forall(_._2.nonEmpty))
  }

  test("unorderable payloads: aggregate rejects at analysis, TopK routes to the fallback") {
    // a map-typed payload column can't participate in RowOrdering; the
    // aggregate's own check must fail analysis, not the executor
    // (ADVICE r8) ...
    val mapStruct = StructType(Seq(
      StructField("a", LongType),
      StructField("m", MapType(StringType, LongType))))
    val a = BoundedTopStructs(
      BoundReference(0, mapStruct, nullable = false), 3)
    assert(a.checkInputDataTypes().isFailure)
    // and the plain orderable struct still passes
    assert(agg(3).checkInputDataTypes().isSuccess)
    // ... while topkPerGroup detects the unorderable payload up front
    // and routes to the salted-window spelling, which never orders the
    // payload — the caller gets the exact result, not an error
    val df = spark.range(0, 100)
      .select((col("id") % 4).as("g"), (col("id") * 17 % 31).as("v"),
        map(lit("x"), col("id")).as("m"))
    // v = id*17 % 31 is injective per group (ids 4 apart, span < 124),
    // so (g, v) is a total order and k=2 is deterministic
    val got = graft.functions.TopK.topkPerGroup(
      df, Seq("g"), Seq(col("v").asc), k = 2)
    assert(!got.queryExecution.optimizedPlan.toString
      .contains("bounded_top_structs"), "map payload must not reach the aggregate")
    val rows = got.select("g", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = (0L until 100L).map(i => (i % 4, i * 17 % 31))
      .groupBy(_._1).toSeq
      .flatMap { case (g, xs) => xs.map(_._2).sorted.take(2).map(v => (g, v)) }
      .sorted
    assert(rows == want, s"fallback top-k wrong: $rows vs $want")
  }

  test("end-to-end under forced sort-based fallback (serde in-query)") {
    val prev = spark.conf.getOption(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2")
    try {
      // 200 groups >> threshold 2: every partition falls back to the
      // sort-based path, serializing partial buffers between operators
      val df = spark.range(0, 20000)
        .select((col("id") % 200).as("g"), (col("id") * 37 % 1000).as("v"))
      val got = graft.functions.TopK.topkPerGroup(
        df, Seq("g"), Seq(col("v").asc), k = 2)
        .groupBy("g").agg(min("v").as("v1"), max("v").as("v2"), count(lit(1)).as("n"))
        .collect()
      assert(got.length == 200)
      got.foreach { r =>
        val g = r.getLong(0)
        // brute-force expected 2 smallest v for this group
        val vs = (0L until 20000L).filter(_ % 200 == g).map(i => i * 37 % 1000)
          .sorted.take(2)
        assert(r.getLong(3) == 2, s"group $g row count")
        assert(r.getLong(1) == vs.head && r.getLong(2) == vs(1),
          s"group $g: got (${r.getLong(1)}, ${r.getLong(2)}), want $vs")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v)
        case None => spark.conf.unset(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
      }
    }
  }
}
