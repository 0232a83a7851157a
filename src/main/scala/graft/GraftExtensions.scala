package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{ArrayDot, ArrayDotLong, ArrayOrderedPairs, BloomFolds,
  ByteBucketHistogram, CdcCuts, GradientSampleHash, RepetitionStats,
  SimhashFingerprint, TokenEntropy, WinnowFingerprints}

/** SparkSessionExtensions entry point: registers the engine's native
  * codegen expressions for SQL use. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  *
  * (SURVEY.md §4 concluded no custom optimizer Rules/Strategies are needed
  * for the reference's surface — the extension point carries only function
  * registrations; the full kernel tier is exposed so a SQL-only user can
  * reach every native function the DataFrame ops use.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.builders

  override def apply(e: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        (exprs: Seq[Expression]) => b(exprs)))
    }
}

object GraftExtensions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** name → SQL builder for every registered native function. */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "array_dot" -> (es => ArrayDot(es(0), es(1))),
    "array_dot_long" -> (es => ArrayDotLong(es(0), es(1))),
    "array_ordered_pairs" -> (es => ArrayOrderedPairs(es(0))),
    "array_ordered_sized_pairs" -> { es =>
      val ratioMicro = if (es.size > 1) litInt(es(1), "ratioMicro").toLong else 0L
      graft.functions.ArrayOrderedSizedPairs(es(0), ratioMicro)
    },
    "bloom_folds" -> (es => BloomFolds(es(0))),
    "repetition_stats" -> (es => RepetitionStats(es(0))),
    "token_entropy" -> (es => TokenEntropy(es(0))),
    "simhash_fingerprint" -> { es =>
      val bits = if (es.size > 1) litInt(es(1), "bits") else 20
      val remix = es.size > 2 && litInt(es(2), "remix") != 0
      SimhashFingerprint(es(0), bits, remix)
    },
    "byte_bucket_histogram" -> { es =>
      val width = if (es.size > 1) litInt(es(1), "width") else 16
      ByteBucketHistogram(es(0), width)
    },
    "gradient_sample_hash" -> { es =>
      val bits = if (es.size > 1) litInt(es(1), "bits") else 48
      GradientSampleHash(es(0), bits)
    },
    "cdc_cuts" -> { es =>
      val window = if (es.size > 1) litInt(es(1), "window") else 4
      val divisor = if (es.size > 2) litInt(es(2), "divisor").toLong else 16L
      CdcCuts(es(0), window, divisor)
    },
    "winnow_fingerprints" -> { es =>
      val k = if (es.size > 1) litInt(es(1), "k") else 4
      val w = if (es.size > 2) litInt(es(2), "w") else 4
      WinnowFingerprints(es(0), k, w)
    })

  /** Register the same functions on an ALREADY-RUNNING session
    * (`withExtensions` only applies when the session is first built —
    * getOrCreate on an existing JVM session silently ignores it).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}
