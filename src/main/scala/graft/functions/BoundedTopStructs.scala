package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over struct values — the MAP-SIDE-COMBINING
  * top-k operator (round 8): `bounded_top_structs(struct, k)` keeps the
  * k SMALLEST struct values (natural ascending field order — callers
  * negate numeric fields for descending rank) per group per partition,
  * so the exchange moves at most k rows per (group, map partition)
  * instead of the whole table.
  *
  * This is the operator the salted two-phase window spelling
  * ([[TopK.topkPerGroup]]) approximated from the outside: the salt
  * spread a low-cardinality group key over salts×keys partitions, but
  * every input ROW still crossed the wire. A partial TypedImperative
  * aggregate bounds the shuffle by configuration (k) rather than data —
  * the difference between shuffling 100 TB and shuffling
  * k·partitions·groups rows. Falls in tier (b) of the custom-operator
  * ladder (typed aggregate beats HOF beats UDF); no codegen needed —
  * the per-row hot path is one comparison against the current k-th
  * element (O(1) reject for the overwhelming majority of rows).
  *
  * Buffer rows are UnsafeRow-serialized for spill/shuffle (length-
  * prefixed frames). Result: `array<struct>` ascending — the caller
  * posexplodes and re-projects.
  */
case class BoundedTopStructs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[InternalRow]] {

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val fieldTypes = structType.fields.map(_.dataType)
  @transient private lazy val ordering: Ordering[InternalRow] =
    org.apache.spark.sql.catalyst.expressions.RowOrdering
      .createNaturalAscendingOrdering(fieldTypes.toIndexedSeq)
  @transient private lazy val project = UnsafeProjection.create(fieldTypes)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // Every struct field participates in the natural ascending ordering
    // (TopK packs the full payload row after the sort keys), so the whole
    // struct must be orderable — a map-typed payload column would
    // otherwise fail at executor runtime inside RowOrdering (ADVICE r8).
    case s: StructType if k >= 1 =>
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"bounded_top_structs needs an orderable struct (no map fields), got ${s.simpleString}")
    case t => TypeCheckResult.TypeCheckFailure(
      s"bounded_top_structs needs a struct child and k >= 1, got $t / $k")
  }

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] =
    new ArrayBuffer[InternalRow](k + 1)

  /** Insert keeping the buffer sorted ascending and ≤ k long. The hot
    * path (full buffer, row ≥ current k-th) is a single comparison.
    * `needCopy` is true for update's scan-backed rows (which Spark
    * reuses) and false for merge's already-owned deserialized rows.
    */
  private def insert(buf: ArrayBuffer[InternalRow], row: InternalRow,
      needCopy: Boolean): Unit = {
    if (buf.length >= k && ordering.compare(row, buf.last) >= 0) return
    // binary search for the insertion point
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.compare(buf(mid), row) <= 0) lo = mid + 1 else hi = mid
    }
    buf.insert(lo, if (needCopy) row.copy() else row)
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def update(buf: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[InternalRow], needCopy = true)
    buf
  }

  override def merge(buf: ArrayBuffer[InternalRow], other: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    other.foreach(row => insert(buf, row, needCopy = false))
    buf
  }

  override def eval(buf: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(buf.toArray[Any])

  override def serialize(buf: ArrayBuffer[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buf.foreach { row =>
      val u = project(row)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, null)
    }
    out.writeInt(-1)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new ArrayBuffer[InternalRow](k + 1)
    var size = in.readInt()
    while (size >= 0) {
      val rowBytes = new Array[Byte](size)
      in.readFully(rowBytes)
      val row = new UnsafeRow(fieldTypes.length)
      row.pointTo(rowBytes, size)
      buf += row
      size = in.readInt()
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopStructs =
    copy(child = newChildren.head)

  override def prettyName: String = "bounded_top_structs"
}

object BoundedTopStructs {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.Bridge

  def apply(structCol: Column, k: Int): Column =
    Bridge.column(
      BoundedTopStructs(Bridge.expression(structCol), k)
        .toAggregateExpression())
}
