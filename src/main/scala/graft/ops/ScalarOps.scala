package graft.ops

import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Projections / filters / scalar functions (SURVEY.md §2.2).
  *
  * All of these stay inside whole-stage codegen: built-in `functions._`
  * only, no UDFs. Filename/padding ops mirror the reference's archive
  * layout (src/archiver/filenames.rs); JSON/hex ops mirror the record
  * builders (src/blockchain/ethereum.rs, src/blockchain/bitcoin.rs).
  */
object ScalarOps {

  /** Regex-parse archive filenames → (kind, height | range start/end)
    * (reference: src/archiver/filenames.rs:29-49). Filenames are built from
    * orders keys (singles) and chunk ids (ranges), then parsed back.
    */
  val parseFilename: Op = Op.sql(
    "parse-filename",
    """WITH files AS (
      |  SELECT concat(lpad(CAST(o_orderkey AS VARCHAR), 9, '0'), '.block.avro') AS file
      |  FROM orders WHERE o_orderkey % 5 = 0
      |  UNION ALL
      |  SELECT DISTINCT concat('range-',
      |       lpad(CAST(CAST(floor(o_orderkey / 100) AS BIGINT) * 100 AS VARCHAR), 9, '0'), '_',
      |       lpad(CAST(CAST(floor(o_orderkey / 100) AS BIGINT) * 100 + 99 AS VARCHAR), 9, '0'),
      |       '.txes.avro') AS file
      |  FROM orders)
      |SELECT file,
      |  CASE WHEN file LIKE 'range-%' THEN 'range' ELSE 'single' END AS shape,
      |  regexp_extract(file, '\.(block|txes|traces)\.avro$', 1) AS kind,
      |  CASE WHEN file LIKE 'range-%'
      |       THEN CAST(regexp_extract(file, '^range-(\d{9})_(\d{9})', 1) AS BIGINT)
      |       ELSE CAST(regexp_extract(file, '^(\d{9})\.', 1) AS BIGINT) END AS start_h,
      |  CASE WHEN file LIKE 'range-%'
      |       THEN CAST(regexp_extract(file, '^range-(\d{9})_(\d{9})', 2) AS BIGINT)
      |       ELSE CAST(regexp_extract(file, '^(\d{9})\.', 1) AS BIGINT) END AS end_h
      |FROM files
      |ORDER BY file""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d)
    val singles = o.filter(col("o_orderkey") % 5 === 0)
      .select(concat(lpad(col("o_orderkey").cast("string"), 9, "0"), lit(".block.avro")).as("file"))
    val chunk = floor(col("o_orderkey") / 100).cast("long") * 100
    val ranges = o.select(
        concat(lit("range-"),
          lpad(chunk.cast("string"), 9, "0"), lit("_"),
          lpad((chunk + 99).cast("string"), 9, "0"),
          lit(".txes.avro")).as("file"))
      .distinct()
    singles.union(ranges)
      .select(
        col("file"),
        when(col("file").startsWith("range-"), lit("range")).otherwise(lit("single")).as("shape"),
        regexp_extract(col("file"), "\\.(block|txes|traces)\\.avro$", 1).as("kind"),
        when(col("file").startsWith("range-"),
          regexp_extract(col("file"), "^range-(\\d{9})_(\\d{9})", 1).cast("long"))
          .otherwise(regexp_extract(col("file"), "^(\\d{9})\\.", 1).cast("long")).as("start_h"),
        when(col("file").startsWith("range-"),
          regexp_extract(col("file"), "^range-(\\d{9})_(\\d{9})", 2).cast("long"))
          .otherwise(regexp_extract(col("file"), "^(\\d{9})\\.", 1).cast("long")).as("end_h"))
      .orderBy("file")
  }

  /** Field exists, non-null, non-empty, and not the literal `"null"`
    * (reference: src/command/verify.rs:579-621). Nulls are planted
    * deterministically on k%5==0 to exercise every branch.
    */
  val validateNonNull: Op = Op.sql(
    "validate-non-null",
    """WITH x AS (
      |  SELECT event_id,
      |    CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) % 5 = 0 THEN NULL
      |         WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) % 5 = 1 THEN ''
      |         WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) % 5 = 2 THEN 'null'
      |         ELSE json_extract_string(props, '$.k') END AS v
      |  FROM events)
      |SELECT event_id, v,
      |       (v IS NOT NULL AND length(v) > 0 AND v <> 'null') AS valid
      |FROM x ORDER BY event_id""".stripMargin
  ) { (s, d) =>
    val k = get_json_object(col("props"), "$.k").cast("int")
    Tables.events(s, d)
      .select(col("event_id"),
        when(k % 5 === 0, lit(null).cast("string"))
          .when(k % 5 === 1, lit(""))
          .when(k % 5 === 2, lit("null"))
          .otherwise(get_json_object(col("props"), "$.k")).as("v"))
      .withColumn("valid",
        col("v").isNotNull && length(col("v")) > 0 && col("v") =!= "null")
      .orderBy("event_id")
  }

  /** Hex string → bytes round-trip (reference: src/blockchain/ethereum.rs:91-102,
    * src/blockchain/bitcoin.rs:99-105). Encodes part names, decodes back.
    */
  val hexDecode: Op = Op.sql(
    "hex-decode",
    """SELECT p_partkey, lower(hex(p_name)) AS h,
      |       decode(unhex(lower(hex(p_name)))) AS decoded,
      |       octet_length(unhex(lower(hex(p_name)))) AS n_bytes
      |FROM part ORDER BY p_partkey""".stripMargin
  ) { (s, d) =>
    val h = lower(hex(col("p_name")))
    Tables.part(s, d).select(
      col("p_partkey"), h.as("h"),
      unhex(h).cast("string").as("decoded"),
      length(unhex(h)).cast("int").as("n_bytes"))
      .orderBy("p_partkey")
  }

  /** `"0x…"` hex → u64 (reference: src/blockchain/ethereum.rs:369-372).
    * The oracle proves the round-trip is the identity.
    */
  val hexNumber: Op = Op.sql(
    "hex-number",
    """SELECT o_orderkey,
      |       concat('0x', lower(hex(o_orderkey))) AS hex_str,
      |       o_orderkey AS parsed
      |FROM orders ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    val hx = concat(lit("0x"), lower(hex(col("o_orderkey"))))
    Tables.orders(s, d).select(
      col("o_orderkey"), hx.as("hex_str"),
      conv(substring(hx, 3, 16), 16, 10).cast("long").as("parsed"))
      .orderBy("o_orderkey")
  }

  /** Zero-pad height to 9 digits + two-level directory scheme
    * (reference: src/archiver/filenames.rs:110-135).
    */
  val fmtPadded: Op = Op.sql(
    "fmt-padded",
    """SELECT o_orderkey AS height,
      |       lpad(CAST(o_orderkey AS VARCHAR), 9, '0') AS padded,
      |       lpad(CAST(CAST(floor(o_orderkey / 1000000) AS BIGINT) * 1000000 AS VARCHAR), 9, '0') AS l1,
      |       lpad(CAST(CAST(floor(o_orderkey / 1000) AS BIGINT) * 1000 AS VARCHAR), 9, '0') AS l2
      |FROM orders ORDER BY height""".stripMargin
  ) { (s, d) =>
    val h = col("o_orderkey")
    Tables.orders(s, d).select(
      h.as("height"),
      lpad(h.cast("string"), 9, "0").as("padded"),
      lpad((floor(h / 1000000).cast("long") * 1000000).cast("string"), 9, "0").as("l1"),
      lpad((floor(h / 1000).cast("long") * 1000).cast("string"), 9, "0").as("l2"))
      .orderBy("height")
  }

  /** Unix-seconds → epoch-millis on record build (reference:
    * src/blockchain/ethereum.rs:211,240, src/blockchain/bitcoin.rs:155).
    * events.ts is epoch-nanos (long); derive seconds and millis.
    */
  val tsMillis: Op = Op.sql(
    "ts-millis",
    """SELECT event_id,
      |       epoch_ns(ts) // 1000000000 AS sec,
      |       (epoch_ns(ts) // 1000000000) * 1000 AS millis
      |FROM events ORDER BY event_id""".stripMargin
  ) { (s, d) =>
    // Integer division: ts is epoch-nanos (~1.7e18) which exceeds double's
    // 53-bit mantissa, so float division would be boundary-unsafe.
    val sec = expr("ts div 1000000000")
    Tables.events(s, d).select(
      col("event_id"), sec.as("sec"), (sec * 1000).as("millis"))
      .orderBy("event_id")
  }

  /** Strip/parse JSON string values natively (reference:
    * src/blockchain/mod.rs:172-208) — `get_json_object` on events.props.
    */
  val jsonUnquote: Op = Op.sql(
    "json-unquote",
    """SELECT event_id,
      |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |FROM events ORDER BY event_id""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")
  }

  /** Deserialize the `json` payload into structure with a fixed schema
    * (reference: src/command/compact.rs:330-341, src/command/verify.rs:852-860).
    * `from_json` with an explicit StructType (never schema inference).
    */
  val parseJsonBlock: Op = Op.sql(
    "parse-json-block",
    """SELECT event_id, user_id,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |       (CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL) AS parsed_ok
      |FROM events WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType)))
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .withColumn("j", from_json(col("props"), schema))
      .select(col("event_id"), col("user_id"),
        col("j.k").as("k"), col("j.k").isNotNull.as("parsed_ok"))
      .orderBy("event_id")
  }

  /** Extract + format-check the txid (reference: src/command/compact.rs:394-404).
    * txid is synthesized as md5(orderkey-linenumber); `rlike` checks shape.
    */
  val projectTxid: Op = Op.sql(
    "project-txid",
    """SELECT l_orderkey, l_linenumber,
      |       md5(concat(CAST(l_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR))) AS txid,
      |       regexp_matches(md5(concat(CAST(l_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR))), '^[0-9a-f]{32}$') AS wellformed
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, txid""".stripMargin
  ) { (s, d) =>
    val txid = md5(concat(col("l_orderkey").cast("string"), lit("-"), col("l_linenumber").cast("string")))
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"), txid.as("txid"),
      txid.rlike("^[0-9a-f]{32}$").as("wellformed"))
      .orderBy("l_orderkey", "l_linenumber", "txid")
  }

  /** Construct an output record: constants, derived hashes, timestamps
    * (reference: src/blockchain/ethereum.rs:205-284, bitcoin.rs:141-185).
    * archiveTimestamp is a pinned literal — current_timestamp() would break
    * replay determinism (the reference stamps wall-clock; we don't hash it).
    */
  val buildRecord: Op = Op.sql(
    "build-record",
    """SELECT 'ETHEREUM' AS blockchainType, 'ETH' AS blockchainId,
      |       o_orderkey AS height,
      |       md5(CAST(o_orderkey AS VARCHAR)) AS blockId,
      |       md5(CAST(o_orderkey - 1 AS VARCHAR)) AS parentId,
      |       epoch_ms(o_orderdate) AS ts_ms
      |FROM orders ORDER BY height""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d).select(
      lit("ETHEREUM").as("blockchainType"),
      lit("ETH").as("blockchainId"),
      col("o_orderkey").as("height"),
      md5(col("o_orderkey").cast("string")).as("blockId"),
      md5((col("o_orderkey") - 1).cast("string")).as("parentId"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("ts_ms"))
      .orderBy("height")
  }

  /** Parse the event stream's JSON props payload and profile the
    * extracted field per event type — the semi-structured side-channel
    * every event pipeline carries (parse-json-block's little sibling:
    * per-event property bags instead of block payloads). Extraction is
    * `get_json_object` (codegen'd Jackson path eval) against DuckDB's
    * json_extract; the mean snaps at micro grain from integer sums.
    *
    * Scale shape: per-row JSON extraction in the scan projection, then a
    * handful-of-types groupBy with map-side combine.
    */
  val parseEventProps: Op = Op.sql(
    "parse-event-props",
    """WITH e AS (SELECT event_type,
      |                  CAST(json_extract(props, '$.k') AS BIGINT) AS k
      |           FROM events WHERE props IS NOT NULL)
      |SELECT event_type, count(*) AS n,
      |       min(k) AS k_min, max(k) AS k_max,
      |       CAST(sum(k) AS BIGINT) AS k_sum,
      |       CAST(round(sum(k) * 1000000.0 / count(*)) AS BIGINT) / 1000000.0 AS k_avg
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d)
      .filter(col("props").isNotNull)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("k").as("k_min"), max("k").as("k_max"),
        sum("k").as("k_sum"))
      .select(col("event_type"), col("n"), col("k_min"), col("k_max"), col("k_sum"),
        (round(col("k_sum") * lit(1000000.0) / col("n")).cast("long")
          / lit(1000000.0)).as("k_avg"))
      .orderBy("event_type")
  }

  val ops: Seq[Op] = Seq(parseFilename, validateNonNull, hexDecode, hexNumber,
    fmtPadded, tsMillis, jsonUnquote, parseJsonBlock, projectTxid, buildRecord,
    parseEventProps)
}
