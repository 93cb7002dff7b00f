package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateFunction, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Minimal mutable InternalRow over a bare long array — just enough
  * surface for [[HyperLogLogPlusPlusHelper]]'s register reads/writes
  * (getLong/setLong at word offsets); everything else throws. */
private final class LongWordsRow(val words: Array[Long]) extends InternalRow {
  override def numFields: Int = words.length
  override def getLong(i: Int): Long = words(i)
  override def setLong(i: Int, v: Long): Unit = words(i) = v
  override def isNullAt(i: Int): Boolean = false
  override def copy(): InternalRow = new LongWordsRow(words.clone())
  override def setNullAt(i: Int): Unit = throw new UnsupportedOperationException
  override def update(i: Int, v: Any): Unit = throw new UnsupportedOperationException
  override def getBoolean(i: Int): Boolean = throw new UnsupportedOperationException
  override def getByte(i: Int): Byte = throw new UnsupportedOperationException
  override def getShort(i: Int): Short = throw new UnsupportedOperationException
  override def getInt(i: Int): Int = throw new UnsupportedOperationException
  override def getFloat(i: Int): Float = throw new UnsupportedOperationException
  override def getDouble(i: Int): Double = throw new UnsupportedOperationException
  override def getDecimal(i: Int, p: Int, s: Int): org.apache.spark.sql.types.Decimal =
    throw new UnsupportedOperationException
  override def getUTF8String(i: Int): org.apache.spark.unsafe.types.UTF8String =
    throw new UnsupportedOperationException
  override def getBinary(i: Int): Array[Byte] = throw new UnsupportedOperationException
  override def getInterval(i: Int): org.apache.spark.unsafe.types.CalendarInterval =
    throw new UnsupportedOperationException
  override def getVariant(i: Int): org.apache.spark.unsafe.types.VariantVal =
    throw new UnsupportedOperationException
  override def getStruct(i: Int, n: Int): InternalRow = throw new UnsupportedOperationException
  override def getArray(i: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    throw new UnsupportedOperationException
  override def getMap(i: Int): org.apache.spark.sql.catalyst.util.MapData =
    throw new UnsupportedOperationException
  override def get(i: Int, dt: DataType): AnyRef = throw new UnsupportedOperationException
  override def getGeography(i: Int): org.apache.spark.unsafe.types.GeographyVal =
    throw new UnsupportedOperationException
  override def getGeometry(i: Int): org.apache.spark.unsafe.types.GeometryVal =
    throw new UnsupportedOperationException
}

/** `approx_count_distinct` with a SINGLE BinaryType aggregation buffer
  * (r22). Spark's own HyperLogLogPlusPlus flattens its registers into
  * `numWords` separate LONG buffer attributes — 1 639 columns at
  * rsd 1 % — and every query execution then plans, codegens and
  * compiles UnsafeProjections over that 1 639-field schema: measured
  * ~0.6 s of PER-EXECUTION constant cost per sketch column at sf0.1,
  * independent of row count (a 9-distinct-value column pays the same
  * as a 3.2 M one; cost scales with rsd⁻² exactly like the register
  * count). This TypedImperativeAggregate keeps the registers as one
  * long array serialized to a byte[] buffer, so the exchange schema is
  * a single binary field and the giant projections never exist.
  *
  * The ESTIMATE is bit-identical to Spark's: update/merge/query all
  * delegate to the same [[HyperLogLogPlusPlusHelper]] (same xxhash64,
  * same bias tables) over the same register layout. NULLs are skipped
  * like the built-in. */
case class HllBinaryCountDistinct(
    child: Expression,
    relativeSD: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  @transient private lazy val helper = new HyperLogLogPlusPlusHelper(relativeSD)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_binary_count_distinct"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](helper.numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) helper.update(new LongWordsRow(buf), 0, v, child.dataType)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    helper.merge(new LongWordsRow(buf), new LongWordsRow(other), 0, 0)
    buf
  }

  override def eval(buf: Array[Long]): Any = helper.query(new LongWordsRow(buf), 0)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllBinaryCountDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllBinaryCountDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllBinaryCountDistinct =
    copy(child = newChild)
}

object HllBinary {
  /** Column wrapper: `approx_count_distinct(c, rsd)` with the binary
    * buffer — identical estimate, flat buffer schema. */
  def approxCountDistinct(c: Column, rsd: Double = 0.01): Column =
    ColumnBridge.column(
      HllBinaryCountDistinct(ColumnBridge.expression(c), rsd)
        .toAggregateExpression())
}
