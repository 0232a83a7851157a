package graft.model

import org.apache.spark.sql.{DataFrame, Row}

/** Connector-side transform: a per-block `trace_replayBlockTransactions`
  * response → the reference's per-tx trace records (reference:
  * src/blockchain/ethereum.rs:287-346 builds TX_TRACE_SCHEMA records from
  * per-tx `trace`/`stateDiff` fetches; a replay response carries every
  * tx's entry in one block-level payload, so the splitter IS the fetch
  * boundary here — testdata/blockTraces-1.json is the reference's own
  * fixture of that shape).
  *
  * Runs as `mapPartitions` at the sanctioned connector/decode seam; the
  * JSON work uses Jackson from Spark's own classpath (no new dependency).
  * Each entry's `trace`/`stateDiff` subtree re-serializes to the
  * `traceJson`/`stateDiffJson` payload bytes, `transactionHash` becomes
  * `txid`, and the entry position becomes `index` — exactly the fields
  * the verify command later reconciles.
  */
object TraceReplay {

  /** `blocks`: (height: long, blockId: string, timestamp: timestamp,
    * replayJson: string). Output: rows in the trace archive schema
    * (graft.model.Schemas.trace). Options mirror the reference's
    * `--fields.trace` (datakind.rs TraceOptions): an excluded side is a
    * null column, matching fetch_traces' null unions.
    */
  def toTraceRecords(blocks: DataFrame, blockchainId: String,
      includeTrace: Boolean = true, includeStateDiff: Boolean = true): DataFrame = {
    require(includeTrace || includeStateDiff,
      "at least one of trace/stateDiff must be included (ethereum.rs:292)")
    val spark = blocks.sparkSession
    val in = blocks.selectExpr("height", "blockId",
      "CAST(timestamp AS TIMESTAMP) AS timestamp", "replayJson")
    val rows = in.rdd.mapPartitions { it =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      it.flatMap { r =>
        val height = r.getLong(0)
        val blockId = r.getString(1)
        val ts = r.getAs[java.sql.Timestamp](2)
        val root = mapper.readTree(r.getString(3))
        (0 until root.size()).iterator.map { i =>
          val entry = root.get(i)
          val txid = entry.get("transactionHash").asText()
          def sub(name: String): Array[Byte] = {
            val n = entry.get(name)
            if (n == null || n.isNull) null
            else mapper.writeValueAsBytes(n)
          }
          Row("ETHEREUM", blockchainId, new java.sql.Timestamp(0L),
            height, blockId, ts, i.toLong, txid,
            if (includeTrace) sub("trace") else null,
            if (includeStateDiff) sub("stateDiff") else null)
        }
      }
    }
    spark.createDataFrame(rows, Schemas.trace)
  }
}
