package graft.sources

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro wire-format serde for Row data (SURVEY.md §2.1 A4) built directly
  * on Avro core (the spark-avro connector is not in this environment's
  * jars). Covers the reference's wire surface — flat-ish records of
  * primitives with nullable unions, a struct key, plus arrays for the
  * embedding extension (reference: start-source-connector.sh:97-100,
  * Avro key+value with Schema Registry; the registry itself is
  * deployment plumbing, out of scope per SURVEY §7).
  *
  * Binary layout is Avro binary encoding WITHOUT the Confluent 5-byte
  * schema-id header — schema distribution is the caller's concern (in the
  * offline tests both sides share the StructType-derived schema, the same
  * trust model as ksqlDB's schema-inference-from-registry).
  */
object AvroSerde {

  /** StructType → Avro record schema. Nullable fields become
    * union(null, T) with a null default, mirroring Debezium's optional
    * fields. */
  def avroSchema(st: StructType, name: String = "Value", namespace: String = "graft"): Schema = {
    val fields = st.fields.map { f =>
      val base = avroType(f.dataType, s"${name}_${f.name}", namespace)
      val (typ, default) =
        if (f.nullable)
          (Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base)),
            Schema.Field.NULL_DEFAULT_VALUE)
        else (base, null)
      new Schema.Field(f.name, typ, null, default)
    }
    Schema.createRecord(name, null, namespace, false, fields.toSeq.asJava)
  }

  private def avroType(dt: DataType, name: String, ns: String): Schema = dt match {
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType    => Schema.create(Schema.Type.LONG)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case TimestampType => // epoch-micros, Debezium NanoTimestamp-style long
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      // the reference's rating DECIMAL(3,1) wire shape: bytes + decimal
      // logical type (Debezium/Connect default decimal.handling.mode=
      // precise; SURVEY §1.2) — unscaled big-endian two's-complement
      org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case st: StructType => avroSchema(st, name, ns)
    case ArrayType(elem, containsNull) =>
      val e = avroType(elem, s"${name}_item", ns)
      Schema.createArray(
        if (containsNull)
          Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), e))
        else e)
    case other => throw new IllegalArgumentException(s"no Avro mapping for $other")
  }

  private def unwrapUnion(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def toAvroValue(v: Any, dt: DataType, schema: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (row: Row, st: StructType) => toRecord(row, st, unwrapUnion(schema))
    case (seq: scala.collection.Seq[_], ArrayType(elem, _)) =>
      val arrSchema = unwrapUnion(schema)
      val out = new GenericData.Array[Any](seq.size, arrSchema)
      seq.foreach(x => out.add(toAvroValue(x, elem, arrSchema.getElementType)))
      out
    case (ts: java.sql.Timestamp, TimestampType) =>
      // getTime already includes whole millis of getNanos; add the
      // sub-milli micros. Exact for pre-epoch values too (getTime's
      // millis are floor-based and getNanos is always in [0, 1e9)).
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + (ts.getNanos / 1000L)
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (bd: java.math.BigDecimal, d: DecimalType) =>
      // normalize to the declared scale so the unscaled bytes round-trip
      // (Connect serializes at the schema's scale; a mismatched scale is
      // a data error better caught here than on the wire)
      java.nio.ByteBuffer.wrap(
        bd.setScale(d.scale, java.math.RoundingMode.UNNECESSARY)
          .unscaledValue().toByteArray)
    case (bd: BigDecimal, d: DecimalType) =>
      toAvroValue(bd.bigDecimal, d, schema)
    // Short/Byte widen to Avro INT on the wire (avroSchema maps both to
    // INT — Avro has no narrower int), so the producer-side value must
    // box as Integer or the GenericDatumWriter dies on the Short/Byte
    // box (r20 review finding — the ReplicationPipeline path dodged
    // this by normalizing declarations; the public entry points must
    // not require that)
    case (s: java.lang.Short, ShortType) => java.lang.Integer.valueOf(s.intValue())
    case (b: java.lang.Byte, ByteType) => java.lang.Integer.valueOf(b.intValue())
    case (x, _) => x
  }

  private def toRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      val v = if (row.isNullAt(i)) null else row.get(i)
      rec.put(f.name, toAvroValue(v, f.dataType, schema.getField(f.name).schema()))
    }
    rec
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (rec: GenericRecord, st: StructType) => fromRecord(rec, st)
    case (arr: java.util.Collection[_], ArrayType(elem, _)) =>
      arr.asScala.map(fromAvroValue(_, elem)).toSeq
    case (u: Utf8, StringType) => u.toString
    case (l: java.lang.Long, TimestampType) =>
      // floor semantics so pre-epoch (negative) micros decode correctly:
      // -500000 µs → millis -1000, nanos 500_000_000, not setNanos(<0).
      val ts = new java.sql.Timestamp(Math.floorDiv(l, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(l, 1000000L) * 1000L).toInt)
      ts
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
    case (bb: java.nio.ByteBuffer, d: DecimalType) =>
      val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b)
      new java.math.BigDecimal(new java.math.BigInteger(b), d.scale)
    // the wire carries Avro INT for Short/ByteType fields (no narrower
    // Avro int exists): narrow the decoded Integer back to the declared
    // Catalyst type, or the first downstream getShort()/getByte() throws
    // ClassCastException per record on the public decode paths
    // (KafkaWire.avroDecode / decodeEnvelope — r20 review finding)
    case (i: java.lang.Integer, ShortType) => java.lang.Short.valueOf(i.shortValue())
    case (i: java.lang.Integer, ByteType) => java.lang.Byte.valueOf(i.byteValue())
    case (x, _) => x
  }

  private def fromRecord(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.toSeq.map(f => fromAvroValue(rec.get(f.name), f.dataType)))

  /** Row → Avro binary. */
  def toBytes(row: Row, st: StructType, schema: Schema): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val encoder = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(toRecord(row, st, schema), encoder)
    encoder.flush()
    out.toByteArray
  }

  /** Avro binary → Row. */
  def fromBytes(bytes: Array[Byte], st: StructType, schema: Schema): Row = {
    val decoder = DecoderFactory.get().binaryDecoder(bytes, null)
    fromRecord(new GenericDatumReader[GenericRecord](schema).read(null, decoder), st)
  }

  // ---- registry-style framing (schema-id dispatch) ------------------------
  //
  // The Confluent wire format the reference's converters actually ship
  // (start-source-connector.sh:97-100: AvroConverter + Schema Registry):
  // magic byte 0x00, 4-byte big-endian schema id, then the Avro binary
  // payload. The id is how a consumer knows WHICH writer schema encoded
  // this record — the piece that makes mid-stream schema evolution
  // decodable (ksqlDB resolves it against the registered subject,
  // ksql-transformations/01-movies-transform.sql:17-24).

  val RegistryMagic: Byte = 0x00
  private val HeaderLen = 5

  /** Row → framed binary: 0x00 + big-endian schema id + Avro payload. */
  def toBytesWithId(row: Row, st: StructType, schema: Schema, schemaId: Int): Array[Byte] = {
    val payload = toBytes(row, st, schema)
    java.nio.ByteBuffer.allocate(HeaderLen + payload.length)
      .put(RegistryMagic).putInt(schemaId).put(payload).array()
  }

  /** Schema id of a framed record; loud failure on a frame that was not
    * registry-encoded (a plain [[toBytes]] record here means the producer
    * and consumer disagree about the wire contract — decoding it as if it
    * had a header would yield garbage rows, not an error). */
  def schemaIdOf(bytes: Array[Byte]): Int = {
    require(bytes.length >= HeaderLen && bytes(0) == RegistryMagic,
      s"not a registry-framed Avro record (len=${bytes.length}, " +
        s"magic=${if (bytes.isEmpty) "none" else bytes(0).toString})")
    java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
  }

  /** Framed binary → Row under WRITER/READER schema resolution (Avro's
    * standard rules): the payload is decoded with the writer schema its
    * id names, projected to the reader schema — fields the writer lacks
    * fill their null default, fields the reader dropped are skipped.
    * This is exactly the registry consumer contract: old records stay
    * decodable after the subject evolves, with NULLs for the new
    * columns. Evolution must be additive-nullable (the same rule
    * [[graft.sink.JdbcMerge.evolveTableSql]] enforces on the sink side);
    * a reader field that is non-nullable and absent from the writer has
    * no default and fails resolution loudly. */
  def fromBytesResolved(
      bytes: Array[Byte],
      writer: Schema,
      readerSt: StructType,
      reader: Schema): Row = {
    val decoder = DecoderFactory.get()
      .binaryDecoder(bytes, HeaderLen, bytes.length - HeaderLen, null)
    fromRecord(
      new GenericDatumReader[GenericRecord](writer, reader).read(null, decoder),
      readerSt)
  }

  /** Avro record schema → StructType, the inverse of [[avroSchema]] —
    * what a registry CLIENT needs (a fetched subject history arrives as
    * Avro schema JSON; the engine's decode expressions consume
    * StructTypes). Inverse up to the forward map's deliberate
    * collapses: Short/Byte widened to Integer on the way out come back
    * as Integer (Avro has no narrower int), and record names drop
    * (StructType is structural). `union(null, T)` → nullable T — the
    * only union shape [[avroSchema]] emits and Debezium's optional-field
    * encoding; any other union fails loudly rather than guessing a
    * branch. */
  def structType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"top-level Avro schema must be a record, got ${schema.getType}")
    StructType(schema.getFields.asScala.map { f =>
      val (s, nullable) = unwrapNullable(f.schema())
      StructField(f.name, dataTypeOf(s), nullable)
    }.toSeq)
  }

  private def unwrapNullable(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1 && branches.size > nonNull.size,
        s"only union(null, T) is decodable, got $s")
      // branch ORDER is load-bearing, not cosmetic (r17 review finding):
      // Avro binary encodes the union branch INDEX, and the decode path
      // regenerates the writer schema from the StructType null-FIRST
      // ([[avroSchema]]) — accepting a union(T, null) here would decode
      // its records with swapped branch indices, silently yielding
      // nulls-for-values and misaligned bytes. A producer registering
      // T-first unions (some Connect AvroData shapes) needs the original
      // Schema carried through the decode path, which this StructType
      // seam cannot do — fail loudly at FETCH time, not per record.
      require(branches.head.getType == Schema.Type.NULL,
        s"union must be null-FIRST to round-trip through StructType " +
          s"(the decode path regenerates the writer schema null-first; " +
          s"a [T, null] writer would decode with swapped branch indices), got $s")
      (nonNull.head, true)
    } else (s, false)

  private def dataTypeOf(s: Schema): DataType = s.getLogicalType match {
    case d: org.apache.avro.LogicalTypes.Decimal =>
      // decimals are decodable only on BYTES (varint length + unscaled
      // big-endian) — the only physical shape [[avroSchema]] emits. A
      // decimal on FIXED has a different binary layout (raw N bytes, no
      // length) and the regenerated writer schema would misread it.
      require(s.getType == Schema.Type.BYTES,
        s"decimal logical type is decodable only on bytes, got ${s.getType}: $s")
      DecimalType(d.getPrecision, d.getScale)
    case _: org.apache.avro.LogicalTypes.TimestampMicros => TimestampType
    case lt if lt != null && lt.getName == "uuid" &&
        s.getType == Schema.Type.STRING =>
      // uuid on STRING rides the string physically — decoding it as a
      // plain string is lossless. Avro 1.12 also attaches uuid to
      // fixed(16), whose raw-16-byte layout a regenerated string writer
      // schema would misread — that shape falls through to the loud
      // refusal below, same as the other non-round-trippable logicals.
      StringType
    case lt if lt != null =>
      // timestamp-millis, date, time-*, local-timestamp-*: all ride
      // plain int/long physically, so mapping them to the raw type
      // would DECODE without error and silently ship values at the
      // wrong scale (a timestamp-millis long read as micros is off
      // 1000×) or wrong semantics. Refuse at fetch time instead.
      throw new IllegalArgumentException(
        s"no lossless StructType mapping for Avro logical type " +
          s"'${lt.getName}' on ${s.getType} — the engine's wire shape " +
          s"uses timestamp-micros and bytes-decimal ([[avroSchema]]); " +
          s"re-register the subject on those, or decode this producer " +
          s"with a hand-carried schema")
    case _ => s.getType match {
      case Schema.Type.INT     => IntegerType
      case Schema.Type.LONG    => LongType
      case Schema.Type.FLOAT   => FloatType
      case Schema.Type.DOUBLE  => DoubleType
      case Schema.Type.STRING  => StringType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.BYTES   => BinaryType
      case Schema.Type.RECORD  => structType(s)
      case Schema.Type.ARRAY =>
        val (elem, containsNull) = unwrapNullableElement(s.getElementType)
        ArrayType(dataTypeOf(elem), containsNull)
      case other =>
        throw new IllegalArgumentException(s"no StructType mapping for Avro $other")
    }
  }

  private def unwrapNullableElement(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) unwrapNullable(s)
    else (s, false)
}
