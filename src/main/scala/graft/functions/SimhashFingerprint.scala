package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd per-document simhash fingerprint: given the token
  * array, dedups tokens, polynomial-hashes each distinct token
  * (fold (h*31 + char) mod 1000003 — the same portable hash
  * [[graft.text.TextAnalysis.polyHash]] computes columnar-ly and DuckDB
  * computes via list_reduce over an ascii list), accumulates the classic
  * bit-vote tally over the low `bits` bits, and packs the majority votes
  * into one long.
  *
  * This is row-local: a document's simhash depends only on its own token
  * set, so the explode(distinct words) × explode(bits) → groupBy(id, j) →
  * groupBy(id) formulation it replaces (a 20× corpus-token-stream shuffle
  * through two exchanges) collapses to ZERO shuffle — one static call per
  * row inside whole-stage codegen.
  *
  * Character contract: hashes Unicode code points, which equals Spark's
  * `ascii(substr(w, i, 1))` and DuckDB's `ascii(substr(...))` for all BMP
  * text and makes the three implementations identical on the ASCII test
  * fixture. Training-pipeline extension op (no reference analogue; the
  * reference archives blocks, not documents).
  */
case class SimhashFingerprint(child: Expression, bits: Int, remix: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if bits > 0 && bits <= 62 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_fingerprint needs array<string> tokens and 0 < bits <= 62, got $t / $bits")
  }

  override def nullSafeEval(input: Any): Any =
    SimhashKernel.compute(input.asInstanceOf[ArrayData], bits, remix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashKernel.compute($c, $bits, $remix);")

  override protected def withNewChildInternal(newChild: Expression): SimhashFingerprint =
    copy(child = newChild)
}

object SimhashFingerprint {
  import org.apache.spark.sql.graft.Bridge
  def apply(tokens: Column, bits: Int = 20): Column =
    Bridge.column(SimhashFingerprint(Bridge.expression(tokens), bits, remix = false))
  /** Remixed variant: each bit j comes from the affine family member
    * (h·a_j + b_j) mod P (P = 2³¹−1, same family as the minhash
    * signatures) over the 20-bit base hash, so fingerprints wider than
    * the base hash's 20 bits stay balanced — without the remix every bit
    * ≥ 20 of the raw polynomial hash is constant-zero and a wide
    * fingerprint silently degenerates to the narrow one.
    */
  def mixed(tokens: Column, bits: Int): Column =
    Bridge.column(SimhashFingerprint(Bridge.expression(tokens), bits, remix = true))
}

/** Row-local simhash kernel (static object → scalac emits a static
  * forwarder janino resolves from generated code).
  */
object SimhashKernel {

  private val HashMod = 1000003L
  private val P = 2147483647L // Mersenne prime 2^31−1 (minhash's family)

  def compute(arr: ArrayData, bits: Int): Long = compute(arr, bits, false)

  def compute(arr: ArrayData, bits: Int, remix: Boolean): Long = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[UTF8String](math.max(8, n * 2))
    val votes = new Array[Int](bits)
    // affine family coefficients, hoisted out of the token loop
    val as = if (remix) Array.tabulate(bits)(j => ((j * 2654435761L) % P) | 1L) else null
    val bs = if (remix) Array.tabulate(bits)(j => (j * 40503L * 65537L) % P) else null
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (seen.add(w)) {
        val h = polyHash(w)
        var j = 0
        while (j < bits) {
          val bit =
            if (remix) ((h * as(j) + bs(j)) % P) & 1L
            else (h >>> j) & 1L
          if (bit == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  // fold (h*31 + codePoint) mod 1000003 over the string's code points —
  // identical to TextAnalysis.polyHash (ascii(substr(i,1)) per char) on
  // BMP text, and to DuckDB's list_reduce formulation.
  private def polyHash(w: UTF8String): Long = {
    val s = w.toString
    var h = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % HashMod
      i += Character.charCount(cp)
    }
    h
  }
}
