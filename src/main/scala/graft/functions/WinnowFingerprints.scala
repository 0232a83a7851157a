package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowing fingerprint selection (Schleimer et al. 2003, the MOSS
  * sketch) over a token array, row-local and fully native: the portable
  * polynomial hash (fold (h·31 + char) mod (2³¹−1) — the same fold family
  * [[graft.text.TextAnalysis.polyHash]] encodes columnar-ly, here over
  * each space-joined `k`-token gram) replaces the md5 the op used
  * through round 6, and the window-minimum selection plus the
  * first-window-per-fingerprint dedup run in one pass over the gram
  * hashes. Returns `array<struct<win_pos, fp>>` — one element per
  * distinct selected hash with the 1-based first window that selected
  * it, ordered by window.
  *
  * Native kernel for the same reason as [[CdcCuts]]: the HOF spelling
  * (transform → md5 per gram → array_sort of structs → indexed filter)
  * paid an md5 digest per gram plus interpreted lambda frames per
  * window (8.8 s at sf0.1, the round-6 bench's largest pure-CPU line);
  * this is ~gram-length long ops per gram inside whole-stage codegen.
  * Character contract: hashes UTF-16 code units, which equals DuckDB's
  * `ascii(substr(g, i, 1))` codepoint fold for all single-byte text —
  * identical on the ASCII fixture (same contract as [[CdcKernel]]).
  *
  * Forward guarantee preserved from the md5 spelling: every window of
  * `w` consecutive gram hashes contributes its minimum, so any match of
  * ≥ k+w−1 consecutive tokens between two documents shares a
  * fingerprint, while the sketch stays ~1/w of the gram stream. The
  * CONVERSE weakens with the hash width: fingerprints live in a
  * 2³¹−1 space (vs md5's 2¹²⁸), so a shared fingerprint is evidence,
  * not proof, of shared text — per-pair false-positive odds are
  * ~|sketch_a|·|sketch_b|/2³¹ (≈3e-5 for 250-fp docs); a match-verify
  * step (as MOSS itself does) or two independent folds restores
  * certainty where it matters. (Training-pipeline extension op; the
  * reference archives blocks, not documents.)
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("win_pos", LongType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 && w >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints needs array<string> tokens and positive k/w, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.select(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowKernel.select($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  import org.apache.spark.sql.graft.Bridge
  def apply(tokens: Column, k: Int = 4, w: Int = 4): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(tokens), k, w))
}

/** Static kernel (janino-resolvable, like [[CdcKernel]]). */
object WinnowKernel {
  private val M = 2147483647L

  /** Gram hashes → window minima → first-window-per-fp, one pass.
    * Fewer than k tokens → no grams → empty sketch; fewer than w grams
    * → one window over all grams (the oracle's greatest(1, m−w+1)).
    */
  def select(arr: ArrayData, k: Int, w: Int): ArrayData = {
    val n = arr.numElements()
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val g = new Array[Long](m)
    var t = 0
    while (t < m) {
      var acc = 0L
      var j = t
      while (j < t + k) {
        if (j > t) acc = (acc * 31 + 32L) % M // the joining space
        val s = toks(j)
        var c = 0
        while (c < s.length) { acc = (acc * 31 + s.charAt(c).toLong) % M; c += 1 }
        j += 1
      }
      g(t) = acc
      t += 1
    }
    val nw = math.max(1, m - w + 1)
    val first = new java.util.LinkedHashMap[java.lang.Long, java.lang.Long]()
    var p = 0
    while (p < nw) {
      var mn = java.lang.Long.MAX_VALUE
      var x = p
      val end = math.min(p + w, m)
      while (x < end) { if (g(x) < mn) mn = g(x); x += 1 }
      if (!first.containsKey(mn)) first.put(mn, (p + 1).toLong)
      p += 1
    }
    val out = new Array[Any](first.size())
    val it = first.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getValue.longValue(), e.getKey.longValue()))
      o += 1
    }
    new GenericArrayData(out)
  }
}
