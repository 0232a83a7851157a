package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Kernel-level tests for the RepetitionStats codegen expression: both
  * evaluation paths (whole-stage codegen and interpreted nullSafeEval),
  * the clipped-gram edge semantics that must match the DuckDB oracle's
  * `ws[i:i+K-1]` slicing, and a brute-force cross-check.
  */
class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(texts: String*): Seq[(Long, Long, Long, Long, Long)] =
    texts.toDF("text")
      .select(RepetitionStats(split(col("text"), " ")).as("r"))
      .select("r.n2", "r.dup2", "r.top2", "r.n3", "r.dup3")
      .collect()
      .toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  // Brute force mirroring the oracle: grams are ws[i..min(i+k-1,n)] for
  // i in 1..max(1, n-k+1), space-joined.
  private def brute(text: String, k: Int): (Long, Long, Long) = {
    val ws = text.split(" ", -1)
    val n = ws.length
    val grams = (1 to math.max(1, n - k + 1))
      .map(i => ws.slice(i - 1, math.min(i + k - 1, n)).mkString(" "))
    val counts = grams.groupBy(identity).map(_._2.size.toLong)
    (grams.size.toLong, counts.filter(_ > 1).sum, counts.max)
  }

  test("matches brute force on representative texts") {
    val texts = Seq(
      "a b a b a b",              // heavy 2-gram repetition
      "x",                        // single token → clipped grams
      "x y",                      // two tokens → one real 2-gram, clipped 3-gram
      "a a a a a a a a",          // one gram repeated
      "the quick brown fox jumps over the lazy dog",
      "a b c a b c a b c d",
      "")                         // empty text → one empty token
    val got = stats(texts: _*)
    texts.zip(got).foreach { case (t, (n2, dup2, top2, n3, dup3)) =>
      val (bn2, bdup2, btop2) = brute(t, 2)
      val (bn3, bdup3, _) = brute(t, 3)
      assert((n2, dup2, top2) === (bn2, bdup2, btop2), s"2-grams of '$t'")
      assert((n3, dup3) === (bn3, bdup3), s"3-grams of '$t'")
    }
  }

  test("clipped-gram semantics: n<k yields exactly one whole-array gram") {
    val Seq(one, two) = stats("solo", "two words")
    // (n2, dup2, top2, n3, dup3): the one clipped gram is unique → dup = 0
    assert(one === ((1L, 0L, 1L, 1L, 0L)))   // 1 token: both gram sizes clip
    assert(two === ((1L, 0L, 1L, 1L, 0L)))   // 2 tokens: one real 2-gram, clipped 3-gram
  }

  test("interning distinguishes multi-byte tokens (UTF8String equality)") {
    // tokens that share prefixes/bytes must not collide in the intern map
    val Seq(r) = stats("é è é è é")
    val (bn2, bdup2, btop2) = brute("é è é è é", 2)
    assert((r._1, r._2, r._3) === ((bn2, bdup2, btop2)))
  }

  test("interpreted eval path agrees with codegen") {
    val texts = Seq("a b a b", "q w e r t y", "z z z")
    val cg = stats(texts: _*)
    val interp = texts.map { t =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        t.split(" ", -1).map(org.apache.spark.unsafe.types.UTF8String.fromString))
      val row = GramStats.compute(arr)
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    }
    assert(cg === interp)
  }

  test("null text yields null struct (nullIntolerant)") {
    val r = Seq[Option[String]](None, Some("a b"))
      .toDF("text")
      .select(RepetitionStats(split(col("text"), " ")).as("r"))
      .collect()
    assert(r.exists(_.isNullAt(0)))
    assert(r.exists(!_.isNullAt(0)))
  }

  test("stays inside whole-stage codegen") {
    // non-constant input (a literal folds at plan time via nullSafeEval);
    // the project carrying the expression must sit inside a
    // WholeStageCodegenExec, not fall back to interpreted projection
    val plan = spark.range(3)
      .select(concat_ws(" ", lit("a"), col("id").cast("string")).as("text"))
      .select(RepetitionStats(split(col("text"), " ")).as("r"))
      .queryExecution.executedPlan
    val inCodegen = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("repetitionstats") => w
    }
    assert(inCodegen.nonEmpty, plan.toString)
  }
}
