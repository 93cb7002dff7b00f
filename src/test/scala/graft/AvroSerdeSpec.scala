package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.AvroSerde

/** Wire-format parity for the A4 serde: schema translation + binary
  * round-trips over the reference's type surface (§1.2) and the
  * embedding extension. */
class AvroSerdeSpec extends SparkTestBase {

  // The movies schema, §1.2 of SURVEY.md — including rating DECIMAL(3,1)
  // on its reference wire shape (bytes + decimal logical type, Debezium
  // decimal.handling.mode=precise).
  private val movies = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("title", StringType),
    StructField("release_year", IntegerType),
    StructField("rating", DecimalType(3, 1)),
    StructField("budget", LongType),
    StructField("description", StringType),
    StructField("created_at", TimestampType)))

  test("avroSchema maps nullability to null-unions with null defaults") {
    val s = AvroSerde.avroSchema(movies)
    assert(s.getField("id").schema().getType == org.apache.avro.Schema.Type.INT)
    val title = s.getField("title").schema()
    assert(title.getType == org.apache.avro.Schema.Type.UNION)
    assert(title.getTypes.get(0).getType == org.apache.avro.Schema.Type.NULL)
    assert(s.getField("title").hasDefaultValue)
  }

  test("rows round-trip bit-exact, including NULLs, decimals and timestamps") {
    val ts = java.sql.Timestamp.valueOf("2026-08-12 10:30:00.123456")
    val preEpoch = java.sql.Timestamp.valueOf("1969-12-31 23:59:59.5")
    def dec(s: String) = new java.math.BigDecimal(s)
    val rows = Seq(
      Row(1, "Interstellar", 2014, dec("8.7"), 165000000L, "space", ts),
      Row(2, null, null, null, null, null, null),
      Row(3, "pre-epoch", 1969, dec("-1.5"), 0L, "negative micros", preEpoch),
      Row(4, "zero rating", 2000, dec("0.0"), 1L, "boundary", ts),
      Row(5, "max precision", 2000, dec("-99.9"), 1L, "boundary", ts))
    val schema = AvroSerde.avroSchema(movies)
    rows.foreach { r =>
      val back = AvroSerde.fromBytes(AvroSerde.toBytes(r, movies, schema), movies, schema)
      assert(back == r)
    }
    // the decimal wire shape is the reference's: bytes + logical type at
    // the declared precision/scale
    val rating = schema.getField("rating").schema().getTypes.get(1)
    assert(rating.getType == org.apache.avro.Schema.Type.BYTES)
    val lt = rating.getLogicalType.asInstanceOf[org.apache.avro.LogicalTypes.Decimal]
    assert(lt.getPrecision == 3 && lt.getScale == 1)
    // an integer-scaled input round-trips at the schema scale (8 → 8.0):
    // Connect serializes unscaled bytes at the SCHEMA's scale
    val rescaled = AvroSerde.fromBytes(
      AvroSerde.toBytes(Row(6, "t", 1999, dec("8"), 1L, "d", ts), movies, schema),
      movies, schema)
    assert(rescaled.get(movies.fieldIndex("rating")) == dec("8.0"))
  }

  test("struct keys round-trip (Debezium STRUCT{ID} message key)") {
    val keySchema = StructType(Seq(StructField("ID", IntegerType, nullable = false)))
    val wrapper = StructType(Seq(
      StructField("key", keySchema, nullable = false),
      StructField("seq", LongType, nullable = false)))
    val schema = AvroSerde.avroSchema(wrapper, name = "Keyed")
    val r = Row(Row(7), 99L)
    assert(AvroSerde.fromBytes(AvroSerde.toBytes(r, wrapper, schema), wrapper, schema) == r)
  }

  test("float-array embeddings round-trip (extension surface)") {
    val emb = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val schema = AvroSerde.avroSchema(emb, name = "Emb")
    val r = Row(3L, Seq(0.25f, -1.5f, 3.75f))
    assert(AvroSerde.fromBytes(AvroSerde.toBytes(r, emb, schema), emb, schema) == r)
  }

  test("binary columns round-trip (multimodal payload plumbing)") {
    val blob = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("media", BinaryType)))
    val schema = AvroSerde.avroSchema(blob, name = "Blob")
    val r = Row(1L, Array[Byte](0x1f, 0x8b.toByte, 0, 127, -128))
    val back = AvroSerde.fromBytes(AvroSerde.toBytes(r, blob, schema), blob, schema)
    assert(back.getLong(0) == 1L)
    assert(back.getAs[Array[Byte]](1).toSeq == r.getAs[Array[Byte]](1).toSeq)
  }

  test("distributed round-trip: executors serde via schema JSON (wire-format path)") {
    // The schema ships to executors as its JSON (the Registry-subject
    // analog); each partition parses it once and round-trips its rows.
    import spark.implicits._
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("title", StringType)))
    val schemaJson = AvroSerde.avroSchema(st).toString
    val df = spark.range(0, 1000, 1, 8)
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("title-"),
          org.apache.spark.sql.functions.col("id")).as("title"))
    val decoded = df
      .mapPartitions { rows =>
        val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
        rows.map { r =>
          val bytes = AvroSerde.toBytes(r, st, schema)
          val back = AvroSerde.fromBytes(bytes, st, schema)
          (back.getLong(0), back.getString(1))
        }
      }
      .collect()
      .toMap
    assert(decoded.size == 1000)
    assert(decoded(42L) == "title-42")
  }

  test("Short/Byte fields round-trip through the Avro-INT wire form (r20)") {
    // Avro has no sub-int integer, so Short/Byte widen to INT on the
    // wire; the UN-normalized public decode path must narrow the
    // decoded Integer back to the declared Catalyst type — previously
    // the first downstream getShort()/getByte() threw
    // ClassCastException per record (the replication facade dodged it
    // by normalizing declarations; KafkaWire.decodeEnvelope callers
    // with a SMALLINT PK did not)
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.ShortType, nullable = false),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.ByteType, nullable = true)))
    val schema = AvroSerde.avroSchema(st)
    val r = Row(12345.toShort, 42.toByte)
    val back = AvroSerde.fromBytes(AvroSerde.toBytes(r, st, schema), st, schema)
    assert(back == r)
    assert(back.get(0).isInstanceOf[java.lang.Short] &&
      back.get(1).isInstanceOf[java.lang.Byte],
      s"decoded boxes must match the declared types: ${back.get(0).getClass}")
    // null sub-int fields stay null
    assert(AvroSerde.fromBytes(
      AvroSerde.toBytes(Row(1.toShort, null), st, schema), st, schema) ==
      Row(1.toShort, null))
  }

  test("unsupported types fail loudly, not silently") {
    val bad = StructType(Seq(StructField("m", MapType(StringType, StringType))))
    intercept[IllegalArgumentException](AvroSerde.avroSchema(bad))
  }
}
