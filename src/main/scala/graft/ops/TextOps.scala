package graft.ops

import org.apache.spark.sql.functions._
import graft.{Op, Tables}
import graft.text.TextAnalysis

/** Text-analysis ops over the documents table (scale extensions —
  * BASELINE.json north star: LLM-data-pipeline operators).
  */
object TextOps {

  /** Token counting: whitespace tokens, distinct tokens, char check. */
  val textTokens: Op = Op.sql(
    "text-tokens",
    """SELECT doc_id,
      |       len(string_split(text, ' ')) AS n_tokens,
      |       len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_subtokens,
      |       length(text) AS n_chars_check
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.distinctTokenCount(col("text")).as("n_distinct"),
      // BPE-ish pre-tokenization: letter runs | digit runs | single symbol
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).as("n_subtokens"),
      length(col("text")).as("n_chars_check"))
      .orderBy("doc_id")
  }

  /** Quality scoring: stopword ratio, mean token length, distinct ratio. */
  val textQuality: Op = Op.sql(
    "text-quality",
    """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
      |SELECT doc_id,
      |  round(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is'))) * 1.0
      |        / len(ws), 4) AS stop_ratio,
      |  round((length(text) - (len(ws) - 1)) * 1.0 / len(ws), 4) AS mean_tok_len,
      |  round(len(list_distinct(ws)) * 1.0 / len(ws), 4) AS distinct_ratio
      |FROM t ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val (stopRatio, meanTokLen, distinctRatio) = TextAnalysis.quality(col("text"))
    Tables.documents(s, d).select(
      col("doc_id"),
      stopRatio.as("stop_ratio"),
      meanTokLen.as("mean_tok_len"),
      distinctRatio.as("distinct_ratio"))
      .orderBy("doc_id")
  }

  /** Language-ID heuristic (stopword markers) + agreement with the label. */
  val textLangId: Op = Op.sql(
    "text-lang-id",
    """WITH t AS (SELECT doc_id, lang,
      |  len(list_filter(string_split(text, ' '),
      |      w -> w IN ('the','a','of','and','to','in','is'))) AS en_score
      |FROM documents)
      |SELECT doc_id, lang,
      |       CASE WHEN en_score > 0 THEN 'en' ELSE 'unk' END AS lang_guess,
      |       (CASE WHEN en_score > 0 THEN 'en' ELSE 'unk' END = lang) AS agrees
      |FROM t ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val guess = TextAnalysis.langGuess(col("text"))
    Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      guess.as("lang_guess"),
      (guess === col("lang")).as("agrees"))
      .orderBy("doc_id")
  }

  /** Document fingerprinting: full digest + winnowing-lite min-window
    * digest (64-char windows, step 32).
    */
  val textFingerprint: Op = Op.sql(
    "text-fingerprint",
    """SELECT doc_id, md5(text) AS fp_full,
      |       list_min([md5(substr(text, i, 64))
      |                 FOR i IN generate_series(1, greatest(1, length(text) - 63), 32)]) AS fp_window
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.fingerprintFull(col("text")).as("fp_full"),
      TextAnalysis.fingerprintWindows(col("text")).as("fp_window"))
      .orderBy("doc_id")
  }

  /** Normalization (the step before shingling/fingerprinting): lowercase,
    * strip non-alphanumerics, collapse runs of spaces, trim. Pure per-row
    * projection — trivially scalable.
    */
  val textNormalize: Op = Op.sql(
    "text-normalize",
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
      |                      ' +', ' ', 'g')) AS norm_text,
      |  length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
      |                             ' +', ' ', 'g'))) AS n_chars_norm
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    Tables.documents(s, d)
      .select(col("doc_id"), norm.as("norm_text"), length(norm).as("n_chars_norm"))
      .orderBy("doc_id")
  }

  /** Sequence packing ("concat then chunk"): documents concatenated per
    * shard in doc_id order and cut into 512-token training sequences; each
    * doc gets the pack its first token falls in + its offset there. The
    * running sum windows per shard — never a global cumsum
    * (graft.text.Packing).
    */
  val textPackSequences: Op = Op.sql(
    "text-pack-sequences",
    """WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
      |                  len(string_split(text, ' ')) AS n_tokens FROM documents),
      |c AS (SELECT doc_id, shard, n_tokens,
      |             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |                                 ROWS UNBOUNDED PRECEDING) AS cum FROM t)
      |SELECT doc_id, shard, n_tokens,
      |       CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id,
      |       CAST((cum - n_tokens) % 512 AS BIGINT) AS tok_offset
      |FROM c ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    graft.text.Packing.packSequences(Tables.documents(s, d), "doc_id", "text",
      budget = 512L, shards = 8)
      .orderBy("doc_id")
  }

  /** Deterministic stratified sampling for domain/language mixing: keep a
    * document iff its hash bucket (first two hex chars of md5(doc_id) —
    * 256 uniform buckets) falls below the stratum's rate (en 50%, others
    * 20%). Hash-based Bernoulli is THE scale shape for data mixing: a
    * pure per-row projection, reproducible across runs/engines, no RNG
    * state, and re-runs keep the exact same sample (unlike rand()-based
    * sampling which can never be re-verified).
    */
  val textSampleStratified: Op = Op.sql(
    "text-sample-stratified",
    """SELECT doc_id, lang,
      |       substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      |FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      |      CASE WHEN lang = 'en' THEN '80' ELSE '33' END
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
    val rate = when(col("lang") === "en", lit("80")).otherwise(lit("33"))
    Tables.documents(s, d)
      .filter(bucket < rate)
      .select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: flag corpus documents sharing any 5-word
    * shingle with the benchmark set (here: doc_id < 50 plays the held-out
    * benchmark), with the shared-shingle count per flagged doc — the
    * classic n-gram-overlap contamination check run before training. The
    * benchmark side is tiny by nature → its distinct shingle set
    * BROADCASTS and the corpus never shuffles; at 100 TB this is one
    * map-side semi-join pass over the corpus shingles.
    */
  val textContamination: Op = Op.sql(
    "text-contamination",
    """WITH sh5 AS (
      |  SELECT DISTINCT doc_id AS id, array_to_string(ws[i:i+4], ' ') AS s
      |  FROM (SELECT doc_id, ws,
      |               unnest(generate_series(1, greatest(1, len(ws) - 4))) AS i
      |        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))),
      |bench AS (SELECT DISTINCT s FROM sh5 WHERE id < 50)
      |SELECT id AS doc_id, count(*) AS n_shared
      |FROM sh5 JOIN bench USING (s)
      |WHERE id >= 50
      |GROUP BY id ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    def sh5(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id").as("id"),
      explode(array_distinct(TextAnalysis.wordShingles(col("text"), 5))).as("s"))
    val bench = sh5(docs.filter(col("doc_id") < 50)).select("s").distinct()
    sh5(docs.filter(col("doc_id") >= 50))
      .join(broadcast(bench), Seq("s"))
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  val ops: Seq[Op] = Seq(textTokens, textQuality, textLangId, textFingerprint,
    textNormalize, textPackSequences, textSampleStratified, textContamination)
}
