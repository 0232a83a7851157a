package graft.sources

import java.io.File
import java.nio.ByteBuffer

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Writer for the reference's Avro object-container archive format
  * (reference: src/storage/fs.rs:135-219; codecs snappy | zstd(9),
  * src/global.rs:34-46) — so archives this engine produces stay readable
  * by the reference tooling and vice versa.
  *
  * The Avro schema is DERIVED from the engine's static StructTypes
  * (graft.model.Schemas) — same field names/types the reference embeds.
  * One container file per Spark partition; callers control file count via
  * repartition (e.g. one partition per 1000-block chunk = the reference's
  * range files). Local paths here; an object store mounts through the
  * Hadoop FileSystem the same way.
  */
object AvroArchiveSink {

  /** Avro record schema for a Spark StructType (timestamps as
    * timestamp-millis longs, binaries as bytes, nullables as unions —
    * matching src/avros.rs's shapes).
    */
  def avroSchema(st: StructType, name: String): Schema = {
    var fields = SchemaBuilder.record(name).namespace("graft").fields()
    st.fields.foreach { f =>
      val base = f.dataType match {
        case StringType    => Schema.create(Schema.Type.STRING)
        case LongType      => Schema.create(Schema.Type.LONG)
        case IntegerType   => Schema.create(Schema.Type.INT)
        case BinaryType    => Schema.create(Schema.Type.BYTES)
        case DoubleType    => Schema.create(Schema.Type.DOUBLE)
        case TimestampType | TimestampNTZType =>
          val s = Schema.create(Schema.Type.LONG)
          org.apache.avro.LogicalTypes.timestampMillis().addToSchema(s)
        case other => throw new IllegalArgumentException(s"unsupported: $other")
      }
      fields =
        if (f.nullable)
          fields.name(f.name)
            .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
            .withDefault(null)
        else
          fields.name(f.name).`type`(base).noDefault()
    }
    fields.endRecord()
  }

  /** Write `df` as one Avro container file per partition under `outDir`.
    *
    * Archive kinds (blocks/txes/traces aliases) with a `heightCol` column
    * get the reference's discoverable layout — the filename IS the
    * metadata (src/archiver/filenames.rs:51-83): each partition lands at
    * `L1/range-<min>_<max>.<kind>.avro`, or `L1/L2/<h>.<suffix>.avro` when
    * it holds a single height. Callers control file ranges by partitioning
    * (e.g. `repartition(col(chunk))`); partitions must not collide on a
    * name — an existing target throws (the reference's never-overwrite
    * `create`, src/storage/fs.rs:33-39). Non-archive tables (no reference
    * kind) fall back to flat `part-<pid>.<kind>.avro` names.
    *
    * Returns the number of records written.
    */
  def write(df: DataFrame, kind: String, outDir: String,
      codec: String = "snappy", heightCol: String = "height",
      forkHashCol: Option[String] = None): Long = {
    val sparkSchema = df.schema
    val schemaJson = avroSchema(sparkSchema, kind).toString
    val refKind = scala.util.Try(graft.archive.Filenames.normalizeKind(kind)).toOption
      .filter(_ => df.columns.contains(heightCol))
    val hIdx = refKind.map(_ => sparkSchema.fieldIndex(heightCol))
    // reorg singles carry their block hash in the name (filenames.rs:60-63)
    val fhIdx = forkHashCol.filter(_ => refKind.isDefined).map(sparkSchema.fieldIndex)
    new File(outDir).mkdirs()
    val counts = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        writer.setCodec(codec match {
          case "snappy"  => CodecFactory.snappyCodec()
          case "zstd"    => CodecFactory.zstandardCodec(9)
          case "deflate" => CodecFactory.deflateCodec(6)
          case "null"    => CodecFactory.nullCodec()
          case other     => throw new IllegalArgumentException(s"codec: $other")
        })
        // The range is only known once the partition is drained, so write
        // to a temp name and move into the final path on close.
        val file = hIdx match {
          case Some(_) => File.createTempFile(s"graft-avro-$pid-", ".tmp", new File(outDir))
          case None    => new File(outDir, f"part-$pid%05d.$kind.avro")
        }
        writer.create(schema, file)
        var n = 0L
        var mn = Long.MaxValue
        var mx = Long.MinValue
        var fork: Option[String] = None
        rows.foreach { row =>
          hIdx.foreach { i =>
            val h = row.getLong(i)
            if (h < mn) mn = h
            if (h > mx) mx = h
          }
          if (n == 0L) fork = fhIdx.flatMap(i => Option(row.getString(i)))
          writer.append(toRecord(row, sparkSchema, schema))
          n += 1
        }
        writer.close()
        refKind.foreach { k =>
          val rel =
            if (mn == mx) graft.archive.Filenames.relativeSinglePath(mn, k, fork)
            else graft.archive.Filenames.relativeRangePath(mn, mx, k)
          val target = new File(outDir, rel)
          target.getParentFile.mkdirs()
          if (!claimTarget(target))
            throw new IllegalStateException(
              s"archive file exists (never overwritten): $target — partition " +
                "the input so file ranges don't collide")
          java.nio.file.Files.move(file.toPath, target.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        Iterator.single(n)
      }
    }
    counts.sum().toLong
  }

  /** Atomically claim a target path (O_EXCL create). `Files.move` without
    * REPLACE_EXISTING is a non-atomic check-then-rename on POSIX — two
    * racing tasks can BOTH pass the check and the loser silently replaces
    * the winner. The claim-then-replace sequence cannot.
    */
  private def claimTarget(target: File): Boolean =
    try { java.nio.file.Files.createFile(target.toPath); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }

  /** Write one single-height container PER HEIGHT (the stream command's
    * file shape: one `L1/L2/<h>[.<hash>].<suffix>.avro` per archived
    * block, reference src/command/stream.rs + archiver.rs:53-113).
    * Existing targets are SKIPPED, not overwritten — the reference
    * stream's `overwrite: false` (stream.rs:49-52), which is what makes
    * replays idempotent. Rows are co-partitioned by height and split into
    * files on (height, fork-hash) boundaries inside each partition, so
    * hash-partition collisions can never merge two heights into a range
    * file. Returns the number of records in files that actually landed.
    */
  def writeSingles(df: DataFrame, kind: String, outDir: String,
      codec: String = "snappy", heightCol: String = "height",
      forkHashCol: Option[String] = None): Long = {
    val sparkSchema = df.schema
    val schemaJson = avroSchema(sparkSchema, kind).toString
    val k = graft.archive.Filenames.normalizeKind(kind)
    val hIdx = sparkSchema.fieldIndex(heightCol)
    val fhIdx = forkHashCol.map(sparkSchema.fieldIndex)
    new File(outDir).mkdirs()
    val sortCols = col(heightCol) +: fhIdx.map(_ => col(forkHashCol.get)).toSeq
    val counts = df
      .repartition(col(heightCol))
      .sortWithinPartitions(sortCols: _*)
      .rdd.mapPartitions { rows =>
        val schema = new Schema.Parser().parse(schemaJson)
        def mkCodec = codec match {
          case "snappy"  => CodecFactory.snappyCodec()
          case "zstd"    => CodecFactory.zstandardCodec(9)
          case "deflate" => CodecFactory.deflateCodec(6)
          case "null"    => CodecFactory.nullCodec()
          case other     => throw new IllegalArgumentException(s"codec: $other")
        }
        var total = 0L
        var cur: Option[(Long, Option[String])] = None
        var writer: DataFileWriter[GenericRecord] = null
        var tmp: File = null
        var n = 0L
        def close(): Unit = cur.foreach { case (h, fork) =>
          writer.close()
          val target = new File(outDir,
            graft.archive.Filenames.relativeSinglePath(h, k, fork))
          target.getParentFile.mkdirs()
          if (claimTarget(target)) { // else keep the existing file
            java.nio.file.Files.move(tmp.toPath, target.toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            total += n
          } else tmp.delete()
          cur = None
        }
        rows.foreach { row =>
          val key = (row.getLong(hIdx), fhIdx.flatMap(i => Option(row.getString(i))))
          if (cur != Some(key)) {
            close()
            cur = Some(key)
            n = 0L
            tmp = File.createTempFile("graft-single-", ".tmp", new File(outDir))
            writer = new DataFileWriter[GenericRecord](
              new GenericDatumWriter[GenericRecord](schema))
            writer.setCodec(mkCodec)
            writer.create(schema, tmp)
          }
          writer.append(toRecord(row, sparkSchema, schema))
          n += 1
        }
        close()
        Iterator.single(total)
      }
    counts.sum().toLong
  }

  /** One container PER CHUNK (the compact command's range files): rows are
    * co-partitioned by `chunkCol` and split on chunk boundaries INSIDE
    * each sorted partition — hash-partition collisions can therefore never
    * merge two chunks into one file. Each file is named from its own
    * min/max height (`L1/range-<s>_<e>.<kind>.avro`, or a single path for
    * one-height chunks); existing targets are kept (create-if-absent).
    * Returns records written into files that landed.
    */
  def writeChunked(df: DataFrame, kind: String, outDir: String,
      chunkCol: String, codec: String = "zstd",
      heightCol: String = "height"): Long = {
    val sparkSchema = df.schema
    // the chunk key drives file splitting but is NOT part of the record
    val schemaJson = avroSchema(
      StructType(sparkSchema.fields.filterNot(_.name == chunkCol)), kind).toString
    val k = graft.archive.Filenames.normalizeKind(kind)
    val hIdx = sparkSchema.fieldIndex(heightCol)
    val cIdx = sparkSchema.fieldIndex(chunkCol)
    new File(outDir).mkdirs()
    val counts = df
      .repartition(col(chunkCol))
      .sortWithinPartitions(col(chunkCol), col(heightCol))
      .rdd.mapPartitions { rows =>
        val schema = new Schema.Parser().parse(schemaJson)
        def mkCodec = codec match {
          case "snappy"  => CodecFactory.snappyCodec()
          case "zstd"    => CodecFactory.zstandardCodec(9)
          case "deflate" => CodecFactory.deflateCodec(6)
          case "null"    => CodecFactory.nullCodec()
          case other     => throw new IllegalArgumentException(s"codec: $other")
        }
        var total = 0L
        var cur: Option[Long] = None
        var writer: DataFileWriter[GenericRecord] = null
        var tmp: File = null
        var n = 0L
        var mn = Long.MaxValue
        var mx = Long.MinValue
        def close(): Unit = if (cur.isDefined) {
          writer.close()
          val rel =
            if (mn == mx) graft.archive.Filenames.relativeSinglePath(mn, k)
            else graft.archive.Filenames.relativeRangePath(mn, mx, k)
          val target = new File(outDir, rel)
          target.getParentFile.mkdirs()
          if (claimTarget(target)) { // else keep the existing file
            java.nio.file.Files.move(tmp.toPath, target.toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            total += n
          } else tmp.delete()
          cur = None
        }
        rows.foreach { row =>
          val chunk = row.getLong(cIdx)
          if (cur != Some(chunk)) {
            close()
            cur = Some(chunk)
            n = 0L; mn = Long.MaxValue; mx = Long.MinValue
            tmp = File.createTempFile("graft-chunk-", ".tmp", new File(outDir))
            writer = new DataFileWriter[GenericRecord](
              new GenericDatumWriter[GenericRecord](schema))
            writer.setCodec(mkCodec)
            writer.create(schema, tmp)
          }
          val h = row.getLong(hIdx)
          if (h < mn) mn = h
          if (h > mx) mx = h
          writer.append(toRecord(row, sparkSchema, schema))
          n += 1
        }
        close()
        Iterator.single(total)
      }
    counts.sum().toLong
  }

  private def toRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      if (schema.getField(f.name) == null) () // split keys ride outside the record
      else {
      val v =
        if (row.isNullAt(i)) null
        else f.dataType match {
          case TimestampType => java.lang.Long.valueOf(
            row.getAs[java.sql.Timestamp](i).getTime)
          case TimestampNTZType =>
            val ldt = row.getAs[java.time.LocalDateTime](i)
            java.lang.Long.valueOf(
              ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000L + ldt.getNano / 1000000)
          case BinaryType    => ByteBuffer.wrap(row.getAs[Array[Byte]](i))
          case _             => row.get(i)
        }
      rec.put(f.name, v)
      }
    }
    rec
  }
}
