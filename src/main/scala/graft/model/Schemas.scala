package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Static archive-table schemas (reference: src/avros.rs:6-237 — the Avro
  * schemas are parsed at startup and never inferred; readers pass the same
  * static schema, src/storage/avro_reader.rs:28-34). Spark mapping per
  * SURVEY.md §1.2: timestamps as TimestampType (millis grain), payloads as
  * BinaryType, enum as a CHECK-constrained string.
  */
object Schemas {

  val blockchainTypes: Seq[String] = Seq("ETHEREUM", "BITCOIN")

  private val common = Seq(
    StructField("blockchainType", StringType, nullable = false),
    StructField("blockchainId", StringType, nullable = false),
    StructField("archiveTimestamp", TimestampType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("blockId", StringType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false))

  /** blocks (reference: src/avros.rs:7-78) */
  val block: StructType = StructType(
    common.take(5) ++ Seq(
      StructField("parentId", StringType, nullable = false),
      common.last,
      StructField("json", BinaryType, nullable = false),
      StructField("unclesCount", IntegerType, nullable = false),
      StructField("uncle0Json", BinaryType, nullable = true),
      StructField("uncle1Json", BinaryType, nullable = true)))

  /** transactions (reference: src/avros.rs:80-165) */
  val transaction: StructType = StructType(
    common ++ Seq(
      StructField("index", LongType, nullable = false),
      StructField("txid", StringType, nullable = false),
      StructField("json", BinaryType, nullable = false),
      StructField("raw", BinaryType, nullable = false),
      StructField("from", StringType, nullable = true),
      StructField("to", StringType, nullable = true),
      StructField("receiptJson", BinaryType, nullable = true)))

  /** transaction traces (reference: src/avros.rs:167-236; Ethereum-only) */
  val trace: StructType = StructType(
    common ++ Seq(
      StructField("index", LongType, nullable = false),
      StructField("txid", StringType, nullable = false),
      StructField("traceJson", BinaryType, nullable = true),
      StructField("stateDiffJson", BinaryType, nullable = true)))

  val kinds: Seq[String] = Seq("blocks", "txes", "traces")

  def schemaFor(kind: String): StructType = kind match {
    case "blocks" => block
    case "txes"   => transaction
    case "traces" => trace
    case other    => throw new IllegalArgumentException(s"unknown kind: $other")
  }
}

/** Chain-specific JSON parsing — the Spark equivalent of the reference's
  * `BlockchainData` trait family (src/blockchain/mod.rs:31-108): per-chain
  * `from_json` schemas + column extractors. DataFrames stay untyped with
  * `blockchainType` as the discriminator column.
  */
sealed trait ChainAdapter {
  def chainType: String

  /** Schema of the opaque block `json` payload, limited to the structure
    * the reference itself relies on (SURVEY.md §1.2).
    */
  def blockJsonSchema: StructType

  /** Parsed struct column out of a raw block-json string column. */
  def parseBlock(json: Column): Column = from_json(json, blockJsonSchema)

  def blockHash(parsed: Column): Column
  def parentHash(parsed: Column): Column
  def height(parsed: Column): Column
  def txIds(parsed: Column): Column
  def timestampSec(parsed: Column): Column
}

/** Ethereum payloads: hex-encoded numbers, `parentHash`/`transactions`
  * (reference: src/blockchain/mod.rs:53-64 via alloy's Block).
  */
object EthereumAdapter extends ChainAdapter {
  val chainType = "ETHEREUM"
  val blockJsonSchema: StructType = StructType(Seq(
    StructField("hash", StringType),
    StructField("parentHash", StringType),
    StructField("number", StringType),
    StructField("timestamp", StringType),
    StructField("transactions", ArrayType(StringType)),
    StructField("uncles", ArrayType(StringType))))

  def blockHash(p: Column): Column = p.getField("hash")
  def parentHash(p: Column): Column = p.getField("parentHash")
  /** "0x…" hex → long (reference: src/blockchain/ethereum.rs:369-372) */
  def height(p: Column): Column =
    conv(substring(p.getField("number"), 3, 16), 16, 10).cast(LongType)
  def txIds(p: Column): Column = p.getField("transactions")
  def timestampSec(p: Column): Column =
    conv(substring(p.getField("timestamp"), 3, 16), 16, 10).cast(LongType)
}

/** Bitcoin payloads: decimal numbers, `previousblockhash`/`tx`
  * (reference: src/blockchain/bitcoin.rs:109-118).
  */
object BitcoinAdapter extends ChainAdapter {
  val chainType = "BITCOIN"
  val blockJsonSchema: StructType = StructType(Seq(
    StructField("hash", StringType),
    StructField("previousblockhash", StringType),
    StructField("height", LongType),
    StructField("tx", ArrayType(StringType)),
    StructField("time", LongType)))

  def blockHash(p: Column): Column = p.getField("hash")
  def parentHash(p: Column): Column = p.getField("previousblockhash")
  def height(p: Column): Column = p.getField("height")
  def txIds(p: Column): Column = p.getField("tx")
  def timestampSec(p: Column): Column = p.getField("time")
}

object ChainAdapter {
  def forType(t: String): ChainAdapter = t match {
    case "ETHEREUM" => EthereumAdapter
    case "BITCOIN"  => BitcoinAdapter
    case other      => throw new IllegalArgumentException(s"unknown chain: $other")
  }
}
