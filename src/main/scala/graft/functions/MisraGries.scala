package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Misra–Gries summary: ≤ `capacity` counters. */
final class MgBuffer(val counters: mutable.HashMap[String, Long])

/** `mg_sketch(key, capacity)` — a MERGEABLE Misra–Gries frequent-items
  * summary over a string key: the 100 TB swap-in for the exact
  * [[graft.ops.Relational.heavyHitters]] count aggregate, whose
  * exchange grows with DISTINCT KEYS (billions of users ⇒ a billions-row
  * shuffle for a top-20 answer). The sketch holds ≤ `capacity` counters
  * per partial, map-side combines like any TypedImperativeAggregate
  * (ObjectHashAggregate — the latest_row path), and ships `capacity`
  * rows per partition instead of the key universe.
  *
  * Guarantees (Misra–Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): with n total rows,
  *  - every estimate is an UNDERCOUNT by at most ⌊n/(capacity+1)⌋;
  *  - every key with true count > ⌊n/(capacity+1)⌋ is present;
  *  - merging summaries (sum counters, then subtract the
  *    (capacity+1)-th largest and drop ≤0) preserves both bounds.
  * With `capacity` ≥ distinct keys the sketch is EXACT.
  *
  * Raw estimates depend on merge order (the trim is not commutative),
  * so the DECLARED surface never outputs them — the checked harness
  * ([[graft.ops.Relational.heavyHittersChecked]]) outputs the exact
  * top-k plus audit booleans the guarantees make deterministically
  * true. Eval returns array<struct<key string, est long>> sorted
  * (est desc, key asc). */
case class MisraGries(
    key: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] {

  require(capacity >= 1, s"capacity=$capacity must be >= 1")

  override def children: Seq[Expression] = Seq(key)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType), StructField("est", LongType))))
  override def nullable: Boolean = false
  override def prettyName: String = "mg_sketch"

  override def createAggregationBuffer(): MgBuffer =
    new MgBuffer(mutable.HashMap.empty)

  /** Classic MG step: known key increments; free slot inserts; a full
    * summary decrements EVERY counter instead (dropping zeros) — the
    * step that buys the n/(capacity+1) bound. */
  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val k = key.eval(input)
    if (k != null) {
      val s = k.toString
      val c = buf.counters
      c.get(s) match {
        case Some(v) => c.update(s, v + 1)
        case None if c.size < capacity => c.update(s, 1L)
        case None =>
          val dead = c.iterator.collect { case (kk, 1L) => kk }.toList
          c.mapValuesInPlace((_, v) => v - 1)
          dead.foreach(c.remove)
      }
    }
    buf
  }

  /** Mergeable-summaries recipe: add counters, then if over capacity
    * subtract the (capacity+1)-th largest value from all and drop ≤0 —
    * error bounds add, staying ≤ n/(capacity+1) for the union. */
  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    val c = buf.counters
    other.counters.foreach { case (k, v) => c.update(k, c.getOrElse(k, 0L) + v) }
    if (c.size > capacity) {
      val d = c.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      val dead = c.iterator.collect { case (kk, v) if v <= d => kk }.toList
      c.mapValuesInPlace((_, v) => v - d)
      dead.foreach(c.remove)
    }
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    val rows = buf.counters.toArray
      .sortBy { case (k, v) => (-v, k) }
      .map { case (k, v) =>
        val r = new GenericInternalRow(2)
        r.update(0, UTF8String.fromString(k))
        r.setLong(1, v)
        r: Any
      }
    new GenericArrayData(rows)
  }

  // length-prefixed UTF-8 byte arrays, NOT writeUTF: writeUTF throws
  // UTFDataFormatException past 65 535 encoded bytes, and a sketch over
  // an unbounded string column (URLs, text prefixes) must not fail at
  // shuffle serialization time.
  //
  // CODEC COMPATIBILITY: this replaced a writeUTF codec (round 13); a
  // streaming query resuming from a checkpoint whose state holds
  // old-codec MG buffers would misread counts (both layouts begin with
  // a count int, so no format guard can tell them apart without a
  // version byte neither wrote). This library has shipped no release
  // with the old codec, so no such checkpoint can exist outside this
  // repo's history — if one ever did, discard the checkpoint and
  // replay (the documented changelog-recovery path). Any FUTURE layout
  // change must prepend a version byte and read both.
  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counters.size)
    buf.counters.foreach { case (k, v) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val c = mutable.HashMap.empty[String, Long]
    (1 to n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      c.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
    }
    new MgBuffer(c)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  protected override def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(key = newChildren(0))
}

object MisraGries {
  /** Column API: `mg_sketch(key, capacity)` over a string-castable key. */
  def mgSketch(key: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(key.cast("string")), capacity)
        .toAggregateExpression())
}
