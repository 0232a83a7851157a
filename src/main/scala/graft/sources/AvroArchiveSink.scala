package graft.sources

import java.io.File
import java.nio.ByteBuffer

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row}
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

  /** Write `df` as one Avro container file per partition under `outDir`,
    * named `part-<pid>.<kind>.avro`. Returns the number of files written.
    */
  def write(df: DataFrame, kind: String, outDir: String,
      codec: String = "snappy"): Long = {
    val sparkSchema = df.schema
    val schemaJson = avroSchema(sparkSchema, kind).toString
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
        val file = new File(outDir, f"part-$pid%05d.$kind.avro")
        writer.create(schema, file)
        var n = 0L
        rows.foreach { row =>
          writer.append(toRecord(row, sparkSchema, schema))
          n += 1
        }
        writer.close()
        Iterator.single(n)
      }
    }
    counts.sum().toLong
  }

  private def toRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
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
    rec
  }
}
