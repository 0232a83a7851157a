package graft.archive

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Archive filename algebra as reusable column expressions (reference:
  * src/archiver/filenames.rs — the filename IS the metadata: kind + range +
  * optional fork hash).
  *
  * Layout: singles `L1/L2/<height>[.<hash>].<kind>.avro`, ranges
  * `L1/range-<start>_<end>.<kind>.avro`, with L1 = height/1e6, L2 =
  * height/1e3, 9-digit zero-padding (filenames.rs:51-83,110-135).
  */
object Filenames {

  val PadWidth = 9
  val L1Size = 1000000L
  val L2Size = 1000L

  def padded(height: Column): Column = lpad(height.cast("string"), PadWidth, "0")

  def l1(height: Column): Column = floor(height / L1Size).cast("long") * L1Size
  def l2(height: Column): Column = floor(height / L2Size).cast("long") * L2Size

  def l1Dir(height: Column): Column = padded(l1(height))
  def l2Dir(height: Column): Column = padded(l2(height))

  /** `<height>.<kind>.avro`, or `<height>.<hash>.<kind>.avro` for forked
    * heights (filenames.rs:51-68).
    */
  def singleFile(height: Column, kind: String, hash: Option[Column] = None): Column =
    hash match {
      case None    => concat(padded(height), lit(s".$kind.avro"))
      case Some(h) => concat(padded(height), lit("."), h, lit(s".$kind.avro"))
    }

  /** `range-<start>_<end>.<kind>.avro` (filenames.rs:69-83). */
  def rangeFile(start: Column, end: Column, kind: String): Column =
    concat(lit("range-"), padded(start), lit("_"), padded(end), lit(s".$kind.avro"))

  /** Full single path `L1/L2/<file>` (filenames.rs:110-135). */
  def singlePath(height: Column, kind: String, hash: Option[Column] = None): Column =
    concat(l1Dir(height), lit("/"), l2Dir(height), lit("/"), singleFile(height, kind, hash))

  /** Full range path `L1/<file>`. */
  def rangePath(start: Column, end: Column, kind: String): Column =
    concat(l1Dir(start), lit("/"), rangeFile(start, end, kind))

  // Parsers (filenames.rs:8-9,29-49): regexes over the basename.
  private val SingleRe = "^(\\d{9})(?:\\.([0-9a-f]+))?\\.(\\w+)\\.avro$"
  private val RangeRe = "^range-(\\d{9})_(\\d{9})\\.(\\w+)\\.avro$"

  def isRange(file: Column): Column = file.rlike("^range-")

  def parseKind(file: Column): Column =
    when(isRange(file), regexp_extract(file, RangeRe, 3))
      .otherwise(regexp_extract(file, SingleRe, 3))

  def parseStart(file: Column): Column =
    when(isRange(file), regexp_extract(file, RangeRe, 1).cast("long"))
      .otherwise(regexp_extract(file, SingleRe, 1).cast("long"))

  def parseEnd(file: Column): Column =
    when(isRange(file), regexp_extract(file, RangeRe, 2).cast("long"))
      .otherwise(regexp_extract(file, SingleRe, 1).cast("long"))

  /** Fork hash for singles written during reorgs; null when absent. */
  def parseForkHash(file: Column): Column = {
    val h = regexp_extract(file, SingleRe, 2)
    when(isRange(file) || h === "", lit(null).cast("string")).otherwise(h)
  }
}
