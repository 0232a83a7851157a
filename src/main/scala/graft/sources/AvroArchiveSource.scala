package graft.sources

import java.nio.ByteBuffer

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.model.Schemas

/** Reader for the reference's ACTUAL storage format — Avro object-container
  * files (reference writer: src/storage/fs.rs:135-219; reader:
  * src/storage/avro_reader.rs:28-70). The container ships no spark-avro
  * datasource, so this decodes via the core avro jar inside
  * `binaryFiles` partitions: one archive file per task — the natural unit,
  * since range files are ≤1000 blocks by construction (chunk size,
  * src/args.rs:136).
  *
  * Records map by FIELD NAME onto the static Spark schemas
  * (graft.model.Schemas); the reference's readers use the same fixed
  * schemas, never inference.
  */
object AvroArchiveSource {

  /** Read one-or-many `.avro` archive files (glob ok) as the given kind
    * ("blocks" | "txes" | "traces").
    */
  def read(spark: SparkSession, pathGlob: String, kind: String): DataFrame =
    read(spark, pathGlob, Schemas.schemaFor(kind))

  /** All `.avro` files under `dir`, at any L1/(L2) nesting level — the
    * recursive walk the reference's listing does (src/storage/fs.rs:62-132).
    * The listing is catalog-sized: one RPC stream, no data reads.
    */
  def listAvroFiles(spark: SparkSession, dir: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Seq.empty
    val out = Seq.newBuilder[String]
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".avro"))
        out += f.getPath.toString
    }
    out.result()
  }

  /** Read every `<kind>` container file under an archive directory tree,
    * filtered by parsed filename kind. Empty-archive-safe: a missing or
    * empty dir yields an empty DataFrame (the reference verify's
    * does-nothing-on-empty-archive, src/command/verify.rs:951-970) instead
    * of `binaryFiles` failing on a matchless glob.
    */
  def readArchive(spark: SparkSession, dir: String, kind: String): DataFrame =
    readArchiveFiles(spark,
      filesOfKind(spark, listAvroFiles(spark, dir), kind), kind)

  /** The subset of `files` whose basename parses to `kind`. */
  def filesOfKind(spark: SparkSession, files: Seq[String], kind: String): Seq[String] = {
    val want = graft.archive.Filenames.normalizeKind(kind)
    files.filter { p =>
      val base = p.substring(p.lastIndexOf('/') + 1)
      parseKindS(base).contains(want)
    }
  }

  private val SingleReS = "^(\\d+)(?:\\.([0-9a-f]{64}))?\\.(\\w+)(?:\\.\\w+)?\\.avro$".r
  private val RangeReS = "^range-(\\d+)_(\\d+)\\.(\\w+)(?:\\.\\w+)?\\.avro$".r

  /** Plain-Scala twin of Filenames.parseKind for catalog-sized listings. */
  def parseKindS(base: String): Option[String] = {
    val raw = base match {
      case SingleReS(_, _, k) => Some(k)
      case RangeReS(_, _, k)  => Some(k)
      case _                  => None
    }
    raw.flatMap(k => scala.util.Try(graft.archive.Filenames.normalizeKind(k)).toOption)
  }

  /** Plain-Scala twin of Filenames.parseStart/End — the covered height
    * range of an archive filename, for catalog-sized driver listings.
    */
  def parseRangeS(base: String): Option[(Long, Long)] = base match {
    case SingleReS(h, _, _) => Some((h.toLong, h.toLong))
    case RangeReS(s, e, _)  => Some((s.toLong, e.toLong))
    case _                  => None
  }

  /** Read an explicit list of container files (empty-safe). */
  def readArchiveFiles(spark: SparkSession, files: Seq[String], kind: String): DataFrame = {
    val schema = Schemas.schemaFor(kind)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else read(spark, files.mkString(","), schema)
  }

  /** Like [[readArchiveFiles]] but with a `_path` column attributing every
    * record to its source container — the content verifier needs to mark
    * whole FILES broken, not rows (reference FileReference,
    * src/storage/mod.rs:231-258).
    *
    * `lenient = true` turns an unreadable or mid-stream-corrupt container
    * into "the records stop here" instead of a task failure: the verify
    * pipeline then SURFACES the damage through its coverage/duplicate
    * checks and dooms the file set, exactly like the reference's per-batch
    * decode-error handling (verify.rs treats an avro read error as a
    * failed batch, never a crashed command). Strict reads (the default)
    * keep failing fast — silently truncating data outside a verifier
    * would mask corruption.
    */
  def readArchiveFilesWithPath(spark: SparkSession, files: Seq[String],
      kind: String, lenient: Boolean = false): DataFrame = {
    val schema = Schemas.schemaFor(kind).add(StructField("_path", StringType, nullable = false))
    if (files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val fields = Schemas.schemaFor(kind).fields
    val rows = spark.sparkContext
      .binaryFiles(files.mkString(","))
      .flatMap { case (path, pds) =>
        val opened =
          try {
            val in = pds.open()
            Some(new DataFileStream[GenericRecord](
              in, new GenericDatumReader[GenericRecord]()))
          } catch { case t: Throwable => if (lenient) None else throw t }
        opened match {
          case None => Iterator.empty
          case Some(reader) =>
            // lookahead iterator: the decode of record N happens inside
            // hasNext, so a mid-stream corruption surfaces as end-of-file
            // (lenient) or a task failure (strict) — never a throw from a
            // half-consumed next()
            new Iterator[Row] {
              private var nextRow: Row = null
              private var done = false
              private def advance(): Unit = {
                if (done || nextRow != null) return
                try {
                  if (reader.hasNext)
                    nextRow = Row.fromSeq(toRow(reader.next(), fields).toSeq :+ path)
                  else { done = true; reader.close() }
                } catch {
                  case t: Throwable =>
                    done = true
                    try reader.close() catch { case _: Throwable => () }
                    if (!lenient) throw t
                }
              }
              def hasNext: Boolean = { advance(); nextRow != null }
              def next(): Row = {
                advance()
                if (nextRow == null) throw new NoSuchElementException
                val r = nextRow; nextRow = null; r
              }
            }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Read with an explicit pinned schema (arbitrary tables). */
  def read(spark: SparkSession, pathGlob: String, schema: StructType): DataFrame = {
    val fields = schema.fields // serialize field list, not the StructType methods
    val rows = spark.sparkContext
      .binaryFiles(pathGlob)
      .flatMap { case (_, pds) =>
        val in = pds.open()
        val reader = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        val it = new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) { reader.close() }
            h
          }
          def next(): Row = toRow(reader.next(), fields)
        }
        it
      }
    spark.createDataFrame(rows, schema)
  }

  private def toRow(rec: GenericRecord, fields: Array[StructField]): Row = {
    val values = fields.map { f =>
      val v = if (rec.getSchema.getField(f.name) != null) rec.get(f.name) else null
      convert(v, f.dataType)
    }
    Row.fromSeq(values.toIndexedSeq)
  }

  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _)                      => null
    case (u: Utf8, StringType)          => u.toString
    case (s: String, StringType)        => s
    case (e: org.apache.avro.generic.GenericEnumSymbol[_], StringType) => e.toString
    case (l: java.lang.Long, TimestampType) => new java.sql.Timestamp(l)
    case (l: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(l, 1000L), Math.floorMod(l, 1000L).toInt * 1000000,
        java.time.ZoneOffset.UTC)
    case (l: java.lang.Long, LongType)  => l
    case (d: java.lang.Double, DoubleType) => d
    case (i: java.lang.Integer, IntegerType) => i
    case (b: ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (a: Array[Byte], BinaryType)   => a
    case (other, _)                     => other
  }
}
