package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline, all built from
  * codegen'd `functions._` (no UDFs): tokenization, shingling, quality
  * ratios, language heuristics, fingerprinting. Everything is exact and
  * engine-portable (integer arithmetic or rounded doubles) so results can
  * be cross-checked against a SQL oracle.
  */
object TextAnalysis {

  /** Whitespace tokens (documents.text is single-spaced). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** n-word shingles as space-joined strings, 1-based positions.
    * transform(sequence(...)) keeps the whole thing inside codegen.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val ws = tokens(text)
    transform(
      sequence(lit(1), greatest(lit(1), size(ws) - (n - 1))),
      i => concat_ws(" ", slice(ws, i, lit(n))))
  }

  /** n-word shingles hashed straight off the token array (round 14):
    * multi-arg xxhash64 over the word tuple replaces
    * xxhash64(concat_ws(" ", slice(...))) — per gram this deletes one
    * array slice + one string concat allocation/copy and hashes the
    * token bytes in place. Equivalence classes match [[wordShingles]]
    * exactly: tokens contain no spaces (they come from split on " "),
    * so tuple equality ⟺ joined-string equality, and Spark's hash
    * expressions SKIP null inputs, so the trailing out-of-range `get`s
    * of a short document (size < n) drop out and the gram degrades to
    * the available prefix tuple — the same class the string spelling's
    * short `slice` produced. Hash VALUES differ from the old spelling
    * (chained multi-arg seeding vs one hash over the joined bytes) —
    * fine everywhere the hash is an internal equality/grouping key,
    * which is the only way shingle hashes are used; collision class
    * unchanged (64-bit, p ≈ n²/2⁶⁵, bounded by the string-exact oracles
    * at test SF).
    *
    * Implemented as the native codegen kernel
    * [[graft.functions.ShingleHashes]] — a `transform` lambda of
    * `xxhash64(get, get, get)` evaluates INTERPRETED per gram (HOFs are
    * CodegenFallback) and measured 1.8–2.2× slower than even the string
    * kernel in the round-14 A/B; the kernel is one static call inside
    * whole-stage codegen and produces bit-identical values (pinned by
    * TextAnalysisSpec).
    */
  def shingleHashes(text: Column, n: Int): Column =
    graft.functions.ShingleHashes(tokens(text), n)

  /** Per-position struct of ([[shingleHashes]] hash, [[wordShingles]]
    * string) — for the one consumer (persistedMd5Base) that must join
    * the hashed-shingle cache on `s` while keeping the gram STRING for
    * an oracle-visible md5. Struct distinctness ≡ string distinctness
    * (the hash is a function of the tuple, tuple ⟺ string).
    */
  def shingleHashedStructs(text: Column, n: Int): Column = {
    val ws = tokens(text)
    transform(
      sequence(lit(1), greatest(lit(1), size(ws) - (n - 1))),
      i => struct(
        xxhash64((0 until n).map(k => get(ws, i + lit(k - 1))): _*).as("s"),
        concat_ws(" ", slice(ws, i, lit(n))).as("sraw")))
  }

  /** Exact integer polynomial hash of a string: fold (h*31 + ascii) mod p.
    * Portable: DuckDB's list_reduce over a 0-prepended ascii list computes
    * the identical value. p fits the product in a long (p*31+255 < 2^63).
    */
  val HashMod = 1000003L
  def polyHash(s: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(s)), i => ascii(s.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % HashMod)

  /** Stopword ratio / punctuation density / mean token length — the
    * classic quality-score trio. Ratios are rounded for cross-engine hash
    * stability.
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def stopwordCount(text: Column): Column = {
    val stops = array(Stopwords.map(lit): _*)
    size(filter(tokens(text), w => array_contains(stops, w)))
  }

  def quality(text: Column): (Column, Column, Column) = {
    val nTok = tokenCount(text)
    val stopRatio = round(stopwordCount(text).cast("double") / nTok, 4)
    val meanTokLen = round((length(text) - (nTok - 1)).cast("double") / nTok, 4)
    val distinctRatio = round(distinctTokenCount(text).cast("double") / nTok, 4)
    (stopRatio, meanTokLen, distinctRatio)
  }

  /** Stopword-marker language heuristic: score English markers; 'unk' when
    * no marker hits. (A real n-gram model plugs into the same shape: one
    * score column per language, argmax.)
    */
  def langGuess(text: Column): Column = {
    val enScore = stopwordCount(text)
    when(enScore > 0, lit("en")).otherwise(lit("unk"))
  }

  /** Document fingerprints: full-text digest + winnowing-lite — the min
    * digest over 64-char windows stepping 32 (rolling-window analogue of
    * MOSS winnowing; robust to local edits).
    */
  def fingerprintFull(text: Column): Column = md5(text)

  def fingerprintWindows(text: Column, window: Int = 64, step: Int = 32): Column =
    array_min(transform(
      sequence(lit(1), greatest(lit(1), length(text) - (window - 1)), lit(step)),
      i => md5(text.substr(i, lit(window)))))
}
