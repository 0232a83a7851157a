package graft.model

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Chain-specific JSON parsing (FIXTURES.md §A shapes; reference:
  * src/blockchain/bitcoin.rs:109-118 and the hex-number parsing in
  * src/blockchain/ethereum.rs:369-372).
  */
class SchemasSpec extends SparkSpec {
  import spark.implicits._

  test("EthereumAdapter parses hex-encoded block JSON") {
    val json =
      """{"hash":"0xaaa","parentHash":"0xbbb","number":"0x10",
        |"timestamp":"0x5f5e100","transactions":["0xt1","0xt2"],"uncles":[]}"""
        .stripMargin.replaceAll("\n", "")
    val df = Seq(json).toDF("json")
      .withColumn("p", EthereumAdapter.parseBlock(col("json")))
      .select(
        EthereumAdapter.blockHash(col("p")).as("h"),
        EthereumAdapter.parentHash(col("p")).as("ph"),
        EthereumAdapter.height(col("p")).as("n"),
        EthereumAdapter.timestampSec(col("p")).as("t"),
        EthereumAdapter.txIds(col("p")).as("txs"))
    val r = df.head()
    assert(r.getString(0) === "0xaaa")
    assert(r.getString(1) === "0xbbb")
    assert(r.getLong(2) === 16L)
    assert(r.getLong(3) === 100000000L)
    assert(r.getSeq[String](4) === Seq("0xt1", "0xt2"))
  }

  test("BitcoinAdapter parses decimal block JSON") {
    val json =
      """{"hash":"000abc","previousblockhash":"000abb","height":723744,
        |"tx":["t1","t2","t3"],"time":1644000000}"""
        .stripMargin.replaceAll("\n", "")
    val df = Seq(json).toDF("json")
      .withColumn("p", BitcoinAdapter.parseBlock(col("json")))
      .select(
        BitcoinAdapter.blockHash(col("p")).as("h"),
        BitcoinAdapter.parentHash(col("p")).as("ph"),
        BitcoinAdapter.height(col("p")).as("n"),
        BitcoinAdapter.timestampSec(col("p")).as("t"),
        size(BitcoinAdapter.txIds(col("p"))).as("ntx"))
    val r = df.head()
    assert(r.getString(0) === "000abc")
    assert(r.getString(1) === "000abb")
    assert(r.getLong(2) === 723744L)
    assert(r.getLong(3) === 1644000000L)
    assert(r.getInt(4) === 3)
  }

  test("static schemas carry the reference's exact column sets") {
    assert(Schemas.block.fieldNames.toSeq === Seq(
      "blockchainType", "blockchainId", "archiveTimestamp", "height",
      "blockId", "parentId", "timestamp", "json", "unclesCount",
      "uncle0Json", "uncle1Json"))
    assert(Schemas.transaction.fieldNames.toSeq === Seq(
      "blockchainType", "blockchainId", "archiveTimestamp", "height",
      "blockId", "timestamp", "index", "txid", "json", "raw",
      "from", "to", "receiptJson"))
    assert(Schemas.trace.fieldNames.toSeq === Seq(
      "blockchainType", "blockchainId", "archiveTimestamp", "height",
      "blockId", "timestamp", "index", "txid", "traceJson", "stateDiffJson"))
    assert(ChainAdapter.forType("ETHEREUM") === EthereumAdapter)
    assert(ChainAdapter.forType("BITCOIN") === BitcoinAdapter)
    intercept[IllegalArgumentException](ChainAdapter.forType("DOGE"))
    intercept[IllegalArgumentException](Schemas.schemaFor("nope"))
  }
}
