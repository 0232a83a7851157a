package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation: documents are
  * concatenated in a deterministic order and cut into fixed token-budget
  * training sequences ("concat then chunk"); each document is assigned the
  * pack its FIRST token falls in, plus its token offset inside that pack —
  * everything a downstream batch assembler needs to materialize the
  * sequences.
  *
  * Scale shape: packing is per SHARD (`pmod(doc_id, shards)` by default) —
  * the running token sum is a window partitioned by shard, so no task ever
  * scans more than one shard's documents and shard count scales the
  * parallelism. A global (unsharded) cumulative sum would funnel the whole
  * corpus through one task; real pipelines pack per output shard/file
  * anyway, and the shard is part of the pack key. Deterministic: same
  * inputs → same packs, independent of partitioning.
  *
  * (The reference has no training-data ops; this backs the scale-extension
  * LLM-pipeline operators, SURVEY.md §7 phase 8.)
  */
object Packing {

  /** Assign each document to (shard, pack_id, tok_offset) under a token
    * `budget` per sequence. Output: doc_id, shard, n_tokens, pack_id,
    * tok_offset — ordered within a shard by doc_id.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Long = 512L, shards: Int = 8): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol).as("doc_id"),
        pmod(col(idCol), lit(shards)).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("_cum", sum("n_tokens").over(w))
      .withColumn("pack_id", floor((col("_cum") - col("n_tokens")) / budget))
      .withColumn("tok_offset", (col("_cum") - col("n_tokens")) % budget)
      .drop("_cum")
  }
}
