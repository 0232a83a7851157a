package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.model.Schemas
import graft.sources.{AvroArchiveSink, AvroArchiveSource}

/** DataSourceV2 connector for the reference's Avro object-container archive
  * layout: `spark.read.format("avro-archive").option("kind", "blocks")
  * .load(dir)`.
  *
  * What makes this the Spark-native read path (vs the binaryFiles seam in
  * [[graft.sources.AvroArchiveSource]]):
  *
  *  - **Filename-range partition pruning.** The archive's filename IS its
  *    zone map (`range-<min>_<max>.<kind>.avro` — reference
  *    src/archiver/filenames.rs:51-83), so height predicates prune whole
  *    container files at PLAN time: `pushFilters` extracts the conjunctive
  *    height bounds and `planInputPartitions` drops every file whose range
  *    doesn't intersect. A 100-TB archive query for one 1000-block chunk
  *    plans exactly one input partition. (Filters are still re-applied by
  *    Spark post-scan — the source prunes files, it does not claim
  *    row-exact evaluation.)
  *  - **Column-pruned decode.** `pruneColumns` narrows the conversion to
  *    the columns the query needs: a `select(height)` over a payload-heavy
  *    blocks archive never materializes the json/uncle blobs into rows
  *    (the container itself is row-major, so the byte stream is still
  *    read — the saving is decode/alloc, the dominant cost for blob
  *    columns).
  *  - **One file per partition** — the natural unit, since range files are
  *    chunk-bounded by construction (≤1000 blocks, src/args.rs:136).
  *
  * Schemas are the pinned static ones (Schemas.schemaFor — never
  * inference; reference src/storage/avro_reader.rs:28-70).
  */
class AvroArchiveDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "avro-archive"

  private def kindOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("kind")).getOrElse(
      throw new IllegalArgumentException(
        "avro-archive requires .option(\"kind\", blocks|txes|traces)"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schemas.schemaFor(kindOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new AvroArchiveTable(schema, kindOf(opts),
      Option(opts.get("path")).getOrElse(
        throw new IllegalArgumentException("avro-archive requires a path")))
  }
}

final class AvroArchiveTable(tableSchema: StructType, kind: String, dir: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"avro-archive($kind, $dir)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroArchiveScanBuilder(tableSchema, kind, dir,
      options.getBoolean("lenient", false))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroArchiveWriteBuilder(info.schema(), kind, dir,
      Option(info.options.get("codec")).getOrElse("snappy"))
}

final class AvroArchiveScanBuilder(fullSchema: StructType, kind: String,
    dir: String, lenient: Boolean = false) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var accepted: Array[Filter] = Array.empty

  /** Conjunctive height bounds of a filter, as (lo, hi) deltas. */
  private def heightBounds(f: Filter): Option[(Long, Long)] = f match {
    case EqualTo("height", v: Long)            => Some((v, v))
    case GreaterThan("height", v: Long)        => Some((v + 1, Long.MaxValue))
    case GreaterThanOrEqual("height", v: Long) => Some((v, Long.MaxValue))
    case LessThan("height", v: Long)           => Some((Long.MinValue, v - 1))
    case LessThanOrEqual("height", v: Long)    => Some((Long.MinValue, v))
    case And(l, r) =>
      (heightBounds(l), heightBounds(r)) match {
        case (Some((a, b)), Some((c, e))) => Some((math.max(a, c), math.min(b, e)))
        case (one @ Some(_), None)        => one
        case (None, one)                  => one
      }
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter(heightBounds(_).isDefined)
    filters // conservative: Spark re-evaluates everything post-scan
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val (lo, hi) = accepted.flatMap(heightBounds).foldLeft(
      (Long.MinValue, Long.MaxValue)) { case ((a, b), (c, e)) =>
      (math.max(a, c), math.min(b, e))
    }
    new AvroArchiveScan(required, kind, dir, lo, hi, lenient)
  }
}

final case class AvroFilePartition(path: String) extends InputPartition

final class AvroArchiveScan(required: StructType, kind: String, dir: String,
    lo: Long, hi: Long, lenient: Boolean = false) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // Catalog-sized driver-side planning: list + filename-parse + prune.
  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val all = AvroArchiveSource.filesOfKind(spark,
      AvroArchiveSource.listAvroFiles(spark, dir), kind)
    val kept = all.filter { p =>
      val base = p.substring(p.lastIndexOf('/') + 1)
      AvroArchiveSource.parseRangeS(base) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None           => true // unparsable range: never silently drop
      }
    }
    kept.map(AvroFilePartition(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration)
    new AvroPartitionReaderFactory(conf, required, lenient)
  }

  override def description(): String =
    s"avro-archive kind=$kind dir=$dir heightBounds=[$lo, $hi] " +
      s"readSchema=${required.fieldNames.mkString(",")}"
}

final class AvroPartitionReaderFactory(conf: SerializableConfiguration,
    required: StructType, lenient: Boolean = false)
    extends PartitionReaderFactory {

  /** `lenient = true` mirrors the v1 source's corrupt-container semantics
    * (AvroArchiveSource.readArchiveFilesWithPath): an unreadable or
    * mid-stream-corrupt container becomes "the records stop here" instead
    * of a task failure — the verify tier then surfaces the damage through
    * its coverage checks. Decode happens inside `next()` (lookahead), so
    * corruption can never throw from a half-consumed `get()`.
    */
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[AvroFilePartition].path
    val fields = required.fields
    new PartitionReader[InternalRow] {
      private var stream: DataFileStream[GenericRecord] = null
      private var pending: InternalRow = null
      private var done = false

      private def decode(rec: GenericRecord): InternalRow = {
        val row = new GenericInternalRow(fields.length)
        var i = 0
        while (i < fields.length) {
          val f = fields(i)
          val v = if (rec.getSchema.getField(f.name) != null) rec.get(f.name) else null
          row.update(i, convert(v, f.dataType))
          i += 1
        }
        row
      }

      override def next(): Boolean = {
        if (done) return false
        if (pending != null) return true
        try {
          if (stream == null) {
            val p = new Path(path)
            stream = new DataFileStream[GenericRecord](
              p.getFileSystem(conf.value).open(p),
              new GenericDatumReader[GenericRecord]())
          }
          if (stream.hasNext) { pending = decode(stream.next()); true }
          else { done = true; false }
        } catch {
          case t: Throwable =>
            done = true
            if (lenient) false else throw t
        }
      }

      override def get(): InternalRow = {
        val r = pending; pending = null; r
      }

      override def close(): Unit =
        if (stream != null) {
          try stream.close() catch { case _: Throwable => () }
        }
    }
  }

  /** Avro runtime value → Catalyst internal value for the pruned column
    * set (timestamps are the sink's timestamp-millis longs → micros).
    */
  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _)                       => null
    case (u: Utf8, StringType)           =>
      // Utf8's backing array over-allocates; copy exactly byteLength
      UTF8String.fromBytes(java.util.Arrays.copyOfRange(u.getBytes, 0, u.getByteLength))
    case (s: String, StringType)         => UTF8String.fromString(s)
    case (l: java.lang.Long, TimestampType | TimestampNTZType) => l * 1000L
    case (l: java.lang.Long, LongType)   => l.longValue()
    case (d: java.lang.Double, DoubleType) => d.doubleValue()
    case (i: java.lang.Integer, IntegerType) => i.intValue()
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (a: Array[Byte], BinaryType)    => a
    case (other, _) =>
      throw new IllegalArgumentException(
        s"avro-archive: unsupported value ${other.getClass} for $dt")
  }
}

/** The connector's write side: `df.write.format("avro-archive")
  * .option("kind", ...).mode("append").save(dir)`.
  *
  * Commit protocol — the V2 shape of the sink's never-overwrite claim
  * (reference src/storage/fs.rs:33-39): every task streams its partition
  * into a HIDDEN temp container and reports (temp, min/max height, count)
  * in its commit message; the DRIVER then claims + renames all winners
  * serially in `BatchWrite.commit`. Spark's task-commit coordination
  * guarantees one message per partition, so a speculative duplicate
  * attempt can never race a claim — its `abort` just deletes its temp.
  * A name collision (two partitions covering the same height range, or a
  * pre-existing archive file) fails the JOB with every temp still
  * un-renamed: the archive is never half-overwritten.
  *
  * Reference-kind tables with a height column land at the discoverable
  * range/single layout (the filename IS the metadata); other kinds fall
  * back to flat `part-<pid>.<kind>.avro` names.
  */
final class AvroArchiveWriteBuilder(schema: StructType, kind: String,
    dir: String, codec: String) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new AvroArchiveBatchWrite(
      schema, kind, dir, codec,
      new SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration))
  }
}

final case class AvroWriteCommit(tmpPath: String, partitionId: Int,
    minH: Long, maxH: Long, n: Long) extends WriterCommitMessage

final class AvroArchiveBatchWrite(schema: StructType, kind: String,
    dir: String, codec: String, conf: SerializableConfiguration)
    extends BatchWrite {

  private val refKind: Option[String] =
    scala.util.Try(graft.archive.Filenames.normalizeKind(kind)).toOption
      .filter(_ => schema.fieldNames.contains("height"))

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AvroArchiveWriterFactory(schema, kind, dir, codec, conf,
      refKind.isDefined)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(conf.value)
    messages.collect { case m: AvroWriteCommit if m.n > 0 =>
      val rel = refKind match {
        case Some(k) if m.minH == m.maxH =>
          graft.archive.Filenames.relativeSinglePath(m.minH, k)
        case Some(k) =>
          graft.archive.Filenames.relativeRangePath(m.minH, m.maxH, k)
        case None => f"part-${m.partitionId}%05d.$kind.avro"
      }
      val target = new Path(dir, rel)
      if (!AvroArchiveSink.claimTarget(fs, target))
        throw new IllegalStateException(
          s"archive file exists (never overwritten): $target")
      AvroArchiveSink.commitClaimed(fs, new Path(m.tmpPath), target)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(conf.value)
    messages.foreach {
      case m: AvroWriteCommit =>
        try fs.delete(new Path(m.tmpPath), false)
        catch { case _: Throwable => () }
      case _ => ()
    }
  }
}

final class AvroArchiveWriterFactory(schema: StructType, kind: String,
    dir: String, codec: String, conf: SerializableConfiguration,
    trackHeight: Boolean) extends DataWriterFactory {

  private val schemaJson = AvroArchiveSink.avroSchema(schema, kind).toString

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    val fields = schema.fields
    val hIdx = if (trackHeight) schema.fieldIndex("height") else -1
    new DataWriter[InternalRow] {
      private val fs = new Path(dir).getFileSystem(conf.value)
      private val avro = new Schema.Parser().parse(schemaJson)
      private val tmp = new Path(dir,
        s".graft-tmp-${java.util.UUID.randomUUID()}")
      private val out = {
        fs.mkdirs(new Path(dir))
        val w = new DataFileWriter[org.apache.avro.generic.GenericRecord](
          new GenericDatumWriter[org.apache.avro.generic.GenericRecord](avro))
        w.setCodec(codec match {
          case "snappy"  => org.apache.avro.file.CodecFactory.snappyCodec()
          case "zstd"    => org.apache.avro.file.CodecFactory.zstandardCodec(9)
          case "deflate" => org.apache.avro.file.CodecFactory.deflateCodec(6)
          case "null"    => org.apache.avro.file.CodecFactory.nullCodec()
          case other => throw new IllegalArgumentException(s"codec: $other")
        })
        w.create(avro, fs.create(tmp, true))
      }
      private var n = 0L
      private var mn = Long.MaxValue
      private var mx = Long.MinValue

      override def write(row: InternalRow): Unit = {
        val rec = new GenericData.Record(avro)
        var i = 0
        while (i < fields.length) {
          val f = fields(i)
          val v: Any =
            if (row.isNullAt(i)) null
            else f.dataType match {
              case StringType  => row.getUTF8String(i).toString
              case LongType    => java.lang.Long.valueOf(row.getLong(i))
              case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
              case DoubleType  => java.lang.Double.valueOf(row.getDouble(i))
              case BinaryType  => java.nio.ByteBuffer.wrap(row.getBinary(i))
              case TimestampType | TimestampNTZType =>
                java.lang.Long.valueOf(row.getLong(i) / 1000L) // micros → millis
              case other => throw new IllegalArgumentException(
                s"avro-archive write: unsupported type $other")
            }
          rec.put(f.name, v)
          i += 1
        }
        if (hIdx >= 0) {
          val h = row.getLong(hIdx)
          if (h < mn) mn = h
          if (h > mx) mx = h
        }
        out.append(rec)
        n += 1
      }

      override def commit(): WriterCommitMessage = {
        out.close()
        if (n == 0L) fs.delete(tmp, false)
        AvroWriteCommit(tmp.toString, partitionId, mn, mx, n)
      }

      override def abort(): Unit = {
        try out.close() catch { case _: Throwable => () }
        try fs.delete(tmp, false) catch { case _: Throwable => () }
      }

      override def close(): Unit = ()
    }
  }
}
