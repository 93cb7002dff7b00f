package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Mutable buffer: highest ordering value seen and its payload row. */
final class LatestRowBuffer(var ord: Any, var payload: Any)

/** `latest_row(payload, ord)` — the payload value of the row with the
  * greatest `ord` in the group; the changelog core's
  * latest-state-per-key aggregate.
  *
  * Why not `max_by`: MaxMinBy is a DeclarativeAggregate whose buffer
  * holds the payload struct, and struct-typed buffers are not
  * hash-aggregable — every changelog materialization planned as
  * SortAggregate, i.e. a per-partition SORT of the full input on both
  * sides of the shuffle. As a TypedImperativeAggregate this plans as
  * ObjectHashAggregate: no sort anywhere, partial aggregation still
  * ships ≤ 1 row per key per partition into the shuffle — at 100 TB the
  * difference between sorting every partition of the event log and a
  * straight hash pass over it.
  *
  * Semantics match `max_by` for the engine's use (unique `ord` per key;
  * on the impossible tie the first-seen wins). Rows with NULL `ord` are
  * ignored; an all-NULL group yields NULL. `ord` may be any orderable
  * type including struct (lexicographic), via the interpreted ordering.
  */
case class LatestRow(
    payload: Expression,
    ord: Expression,
    reverse: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LatestRowBuffer] {

  override def children: Seq[Expression] = Seq(payload, ord)
  override def dataType: DataType = payload.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "latest_row"

  // Reject unorderable ordering types at ANALYSIS time (as max_by does) —
  // without this, a MapType ord passes analysis and every task fails at
  // runtime when the interpreted ordering is first forced.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeUtils.checkForOrderingExpr(ord.dataType, prettyName)

  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(ord.dataType)

  // (ord, payload) pair row machinery for spill-safe serialization
  @transient private lazy val pairSchema = StructType(Seq(
    StructField("o", ord.dataType), StructField("p", payload.dataType)))
  @transient private lazy val pairProj = UnsafeProjection.create(pairSchema)
  @transient private lazy val pairRow = new GenericInternalRow(2)

  override def createAggregationBuffer(): LatestRowBuffer =
    new LatestRowBuffer(null, null)

  // `reverse` flips to earliest-row-wins WITHOUT arithmetic negation of
  // the ordering value (negating a Long id throws under ANSI for
  // Long.MinValue and forbids non-numeric orderable types entirely)
  private def better(candidate: Any, incumbent: Any): Boolean =
    incumbent == null || {
      val c = ordering.compare(candidate, incumbent)
      if (reverse) c < 0 else c > 0
    }

  override def update(buf: LatestRowBuffer, input: InternalRow): LatestRowBuffer = {
    val o = ord.eval(input)
    if (o != null && better(o, buf.ord)) {
      buf.ord = InternalRow.copyValue(o)
      buf.payload = InternalRow.copyValue(payload.eval(input))
    }
    buf
  }

  override def merge(buf: LatestRowBuffer, other: LatestRowBuffer): LatestRowBuffer = {
    if (other.ord != null && better(other.ord, buf.ord)) {
      buf.ord = other.ord
      buf.payload = other.payload
    }
    buf
  }

  override def eval(buf: LatestRowBuffer): Any = buf.payload

  override def serialize(buf: LatestRowBuffer): Array[Byte] =
    if (buf.ord == null) Array.emptyByteArray
    else {
      pairRow.update(0, buf.ord)
      pairRow.update(1, buf.payload)
      pairProj.apply(pairRow).getBytes
    }

  override def deserialize(bytes: Array[Byte]): LatestRowBuffer =
    if (bytes.isEmpty) new LatestRowBuffer(null, null)
    else {
      val row = new UnsafeRow(2)
      row.pointTo(bytes, bytes.length)
      new LatestRowBuffer(
        InternalRow.copyValue(row.get(0, ord.dataType)),
        InternalRow.copyValue(row.get(1, payload.dataType)))
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): LatestRow =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LatestRow =
    copy(inputAggBufferOffset = newOffset)
  protected override def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LatestRow =
    copy(payload = newChildren(0), ord = newChildren(1))
}

object LatestRow {
  /** Column API: the payload value of the row with the greatest `ord`. */
  def latestRow(payload: Column, ord: Column): Column =
    ColumnBridge.column(
      LatestRow(ColumnBridge.expression(payload), ColumnBridge.expression(ord))
        .toAggregateExpression())

  /** Column API: the payload value of the row with the SMALLEST `ord` —
    * `min_by` semantics on the ObjectHashAggregate path, for any
    * orderable `ord` type (no numeric negation involved). */
  def earliestRow(payload: Column, ord: Column): Column =
    ColumnBridge.column(
      LatestRow(
        ColumnBridge.expression(payload),
        ColumnBridge.expression(ord),
        reverse = true).toAggregateExpression())
}
