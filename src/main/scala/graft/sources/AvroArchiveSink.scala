package graft.sources

import java.nio.ByteBuffer
import java.util.UUID

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Writer for the reference's Avro object-container archive format
  * (reference: src/storage/fs.rs:135-219; codecs snappy | zstd(9),
  * src/global.rs:34-46) — so archives this engine produces stay readable
  * by the reference tooling and vice versa.
  *
  * The Avro schema is DERIVED from the engine's static StructTypes
  * (graft.model.Schemas) — same field names/types the reference embeds.
  * One container file per Spark partition; callers control file count via
  * repartition (e.g. one partition per 1000-block chunk = the reference's
  * range files).
  *
  * ALL IO goes through `org.apache.hadoop.fs.FileSystem`, resolved from
  * the output path's scheme — local paths, HDFS and object stores (the
  * reference's S3 backend, src/storage/objects.rs:170-330) take the same
  * code path. The never-overwrite protocol is: write the container to a
  * hidden temp object, then claim the final name
  * (`create(target, overwrite=false)` IS the claim on HDFS — the namenode
  * serializes it; on `file://` the claim drops to a java.nio O_EXCL create
  * because Hadoop's local create is check-then-act), then swap the claimed
  * marker for the data in ONE atomic rename. A crashed task can only ever
  * leave a hidden temp orphan, never a partial file under a final name.
  *
  * Atomicity caveat, scoped honestly: the claim is atomic on HDFS and
  * `file://` only. On S3A, `create(overwrite=false)` is itself
  * check-then-act (a HEAD then PUT), so concurrent writers of the SAME
  * target can both "win" — last PUT wins, same best-effort semantics as
  * the reference's own S3 backend, whose never-overwrite is also a
  * list-then-put (objects.rs:112-167,170-230). Callers that need a hard
  * guarantee on object stores must fence at the job level (the archive
  * commands already do: one task owns one chunk by partitioning).
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

  private def mkCodec(codec: String): CodecFactory = codec match {
    case "snappy"  => CodecFactory.snappyCodec()
    case "zstd"    => CodecFactory.zstandardCodec(9)
    case "deflate" => CodecFactory.deflateCodec(6)
    case "null"    => CodecFactory.nullCodec()
    case other     => throw new IllegalArgumentException(s"codec: $other")
  }

  /** Claim a target path. On HDFS `create(overwrite = false)` is the
    * atomic claim; on object stores it is best-effort check-then-act (see
    * the class scaladoc caveat — the reference's S3 backend has the same
    * semantics, objects.rs:170-230); on
    * `file://` Hadoop's local create is a non-atomic check-then-act, so
    * the claim drops to java.nio's O_EXCL create. Returns false when the
    * target already exists (the reference's never-overwrite skip,
    * src/storage/fs.rs:33-39 / stream.rs:49-52).
    */
  private[sources] def claimTarget(fs: FileSystem, target: Path): Boolean =
    if (fs.getScheme == "file") {
      val local = java.nio.file.Paths.get(target.toUri.getPath)
      java.nio.file.Files.createDirectories(local.getParent)
      try { java.nio.file.Files.createFile(local); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try { fs.create(target, false).close(); true }
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
    }

  /** Swap a successfully-claimed marker for the written temp container in
    * ONE atomic rename — never delete-then-rename, which would reopen the
    * claim window (a speculative/retried task could re-claim the name
    * between the two calls and both writers would commit). On `file://`
    * that is java.nio's ATOMIC_MOVE (rename(2) replaces the marker
    * atomically); elsewhere it is `FileContext.rename(OVERWRITE)`, which
    * HDFS serializes in the namenode.
    */
  private[sources] def commitClaimed(fs: FileSystem, tmp: Path, target: Path): Unit =
    if (fs.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(target.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      org.apache.hadoop.fs.FileContext
        .getFileContext(fs.getUri, fs.getConf)
        .rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }

  private def tmpPath(outDir: String): Path =
    new Path(outDir, s".graft-tmp-${UUID.randomUUID()}")

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
    val conf = new SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    new Path(outDir).getFileSystem(conf.value).mkdirs(new Path(outDir))
    val counts = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val fs = new Path(outDir).getFileSystem(conf.value)
        val schema = new Schema.Parser().parse(schemaJson)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        writer.setCodec(mkCodec(codec))
        // The range is only known once the partition is drained, so write
        // to a temp name and claim+rename into the final path on close.
        val file = hIdx match {
          case Some(_) => tmpPath(outDir)
          case None    => new Path(outDir, f"part-$pid%05d.$kind.avro")
        }
        writer.create(schema, fs.create(file, true))
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
          val target = new Path(outDir, rel)
          if (!claimTarget(fs, target))
            throw new IllegalStateException(
              s"archive file exists (never overwritten): $target — partition " +
                "the input so file ranges don't collide")
          commitClaimed(fs, file, target)
        }
        Iterator.single(n)
      }
    }
    counts.sum().toLong
  }

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
    val conf = new SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    new Path(outDir).getFileSystem(conf.value).mkdirs(new Path(outDir))
    val sortCols = col(heightCol) +: fhIdx.map(_ => col(forkHashCol.get)).toSeq
    val counts = df
      .repartition(col(heightCol))
      .sortWithinPartitions(sortCols: _*)
      .rdd.mapPartitions { rows =>
        val fs = new Path(outDir).getFileSystem(conf.value)
        val schema = new Schema.Parser().parse(schemaJson)
        var total = 0L
        var cur: Option[(Long, Option[String])] = None
        var writer: DataFileWriter[GenericRecord] = null
        var tmp: Path = null
        var n = 0L
        def close(): Unit = cur.foreach { case (h, fork) =>
          writer.close()
          val target = new Path(outDir,
            graft.archive.Filenames.relativeSinglePath(h, k, fork))
          if (claimTarget(fs, target)) {
            commitClaimed(fs, tmp, target)
            total += n
          } else fs.delete(tmp, false) // keep the existing file
          cur = None
        }
        rows.foreach { row =>
          val key = (row.getLong(hIdx), fhIdx.flatMap(i => Option(row.getString(i))))
          if (cur != Some(key)) {
            close()
            cur = Some(key)
            n = 0L
            tmp = tmpPath(outDir)
            writer = new DataFileWriter[GenericRecord](
              new GenericDatumWriter[GenericRecord](schema))
            writer.setCodec(mkCodec(codec))
            writer.create(schema, fs.create(tmp, true))
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
    val conf = new SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    new Path(outDir).getFileSystem(conf.value).mkdirs(new Path(outDir))
    val counts = df
      .repartition(col(chunkCol))
      .sortWithinPartitions(col(chunkCol), col(heightCol))
      .rdd.mapPartitions { rows =>
        val fs = new Path(outDir).getFileSystem(conf.value)
        val schema = new Schema.Parser().parse(schemaJson)
        var total = 0L
        var cur: Option[Long] = None
        var writer: DataFileWriter[GenericRecord] = null
        var tmp: Path = null
        var n = 0L
        var mn = Long.MaxValue
        var mx = Long.MinValue
        def close(): Unit = if (cur.isDefined) {
          writer.close()
          val rel =
            if (mn == mx) graft.archive.Filenames.relativeSinglePath(mn, k)
            else graft.archive.Filenames.relativeRangePath(mn, mx, k)
          val target = new Path(outDir, rel)
          if (claimTarget(fs, target)) {
            commitClaimed(fs, tmp, target)
            total += n
          } else fs.delete(tmp, false) // keep the existing file
          cur = None
        }
        rows.foreach { row =>
          val chunk = row.getLong(cIdx)
          if (cur != Some(chunk)) {
            close()
            cur = Some(chunk)
            n = 0L; mn = Long.MaxValue; mx = Long.MinValue
            tmp = tmpPath(outDir)
            writer = new DataFileWriter[GenericRecord](
              new GenericDatumWriter[GenericRecord](schema))
            writer.setCodec(mkCodec(codec))
            writer.create(schema, fs.create(tmp, true))
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
