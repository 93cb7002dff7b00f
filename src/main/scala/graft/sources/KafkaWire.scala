package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types.{BinaryType, DataType, StructType}

/** The Kafka transport half of the CDC source (SURVEY.md §2.1 A1
  * streaming / A4 wire serde) — the reference's actual topic plumbing
  * (reference: docker-compose.yaml:117-143 broker;
  * start-source-connector.sh:97-101 Avro key/value converters + registry;
  * ksql-transformations/01-movies-transform.sql:15 offset reset).
  *
  * Mirrors [[Cdc.jdbcSnapshotReader]]'s contract: EVERYTHING up to
  * `.load()` is plain, testable configuration — option mapping, wire
  * decode, envelope shaping. `.load()` itself is the one step this
  * offline environment cannot run (no Kafka jars / broker); on a cluster
  * with `spark-sql-kafka-0-10` on the classpath the returned reader
  * loads a frame of (key BINARY, value BINARY, offset LONG, ...) that
  * [[decodeEnvelope]] turns into EXACTLY the envelope shape
  * [[Cdc.envelopeFromEvents]] builds from the fixture — so everything
  * downstream (unwrap, changelog apply, sinks) is transport-agnostic and
  * fully exercised by the offline tests.
  */
object KafkaWire {

  /** Source options, defaulted to the reference's consumer config:
    * earliest reset (01-movies-transform.sql:15), fail on data loss
    * (Connect's default error posture, start-sink-connector.sh:82-84
    * relaxes it only on the sink). */
  case class Config(
      brokers: String,
      topic: String,
      startingOffsets: String = "earliest",
      failOnDataLoss: Boolean = true,
      maxOffsetsPerTrigger: Option[Long] = None,
      extra: Map[String, String] = Map.empty)

  /** The full option map the reader is configured with — exposed so the
    * mapping (brokers → `kafka.bootstrap.servers`, topic → `subscribe`,
    * offset reset → `startingOffsets`) is assertable without a broker. */
  def options(cfg: Config): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> cfg.brokers,
      "subscribe" -> cfg.topic,
      "startingOffsets" -> cfg.startingOffsets,
      "failOnDataLoss" -> cfg.failOnDataLoss.toString) ++
      cfg.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      cfg.extra

  /** `readStream.format("kafka")` configured up to (not including)
    * `.load()` — the A1 streaming-half construction. */
  def kafkaStreamReader(spark: SparkSession, cfg: Config): DataStreamReader =
    options(cfg).foldLeft(spark.readStream.format("kafka")) {
      case (r, (k, v)) => r.option(k, v)
    }

  /** Decode a raw Kafka frame (key/value BINARY, offset LONG) into the
    * engine's envelope shape — `kafka_key` struct, nullable `kafka_value`
    * struct, `offset` — using the same [[AvroSerde]] binary layout the
    * offline round-trip tests pin down. A tombstone arrives as a NULL
    * `value` and decodes to a NULL `kafka_value` (the (key, NULL) record
    * TOMBSTONE_HANDLING_GUIDE.md:11-14 requires preserved). The result's
    * schema equals [[Cdc.envelopeFromEvents]]'s for the same key/value
    * schemas, so the downstream pipeline is transport-agnostic. */
  def decodeEnvelope(
      frame: DataFrame,
      keySchema: StructType,
      valueSchema: StructType): DataFrame =
    frame.select(
      avroDecode(col("key"), keySchema).as("kafka_key"),
      avroDecode(col("value"), valueSchema).as("kafka_value"),
      col("offset"))

  /** The write-side mirror: envelope → (key, value, offset) binary frame
    * for a Kafka sink (B4's `routeToTopic` supplies the topic tag). */
  def encodeEnvelope(envelope: DataFrame): DataFrame = {
    val keySchema = envelope.schema("kafka_key").dataType.asInstanceOf[StructType]
    val valueSchema = envelope.schema("kafka_value").dataType.asInstanceOf[StructType]
    envelope.select(
      avroEncode(col("kafka_key"), keySchema).as("key"),
      avroEncode(col("kafka_value"), valueSchema).as("value"),
      col("offset"))
  }

  def avroDecode(bytes: Column, schema: StructType): Column =
    ColumnBridge.column(AvroDecode(ColumnBridge.expression(bytes), schema))

  def avroEncode(struct: Column, schema: StructType): Column =
    ColumnBridge.column(AvroEncode(ColumnBridge.expression(struct), schema))

  /** Registry-style decode (schema-id dispatch): each record is decoded
    * with the writer schema its Confluent-framed id names and widened to
    * the registry's LATEST schema — NULLs for fields the writer predates.
    * This is the wire-side half of schema evolution (the sink half is
    * [[graft.sink.JdbcMerge.evolveTableSql]]): a producer ALTER TABLE
    * mid-stream keeps every old record decodable. */
  def avroDecodeRegistry(
      bytes: Column,
      registry: Map[Int, StructType],
      latestId: Int): Column =
    ColumnBridge.column(
      AvroDecodeRegistry(ColumnBridge.expression(bytes), registry, latestId))

  /** Registry-style encode: Confluent framing (0x00 + schema id) around
    * the Avro payload, the id naming which registered schema wrote it. */
  def avroEncodeWithId(struct: Column, schema: StructType, schemaId: Int): Column =
    ColumnBridge.column(
      AvroEncodeRegistry(ColumnBridge.expression(struct), schema, schemaId))

  /** [[decodeEnvelope]] for an EVOLVING value subject: the value column
    * is registry-framed and decoded by schema id, output widened to the
    * latest registered schema. The key schema stays static — a key
    * schema change redefines row identity, which no changelog consumer
    * can absorb (and the reference never evolves keys: the Debezium key
    * is the table's fixed PK struct, README.md:40). Tombstones (NULL
    * value) pass through as NULL `kafka_value` exactly as in the static
    * path. */
  def decodeEnvelopeEvolving(
      frame: DataFrame,
      keySchema: StructType,
      valueRegistry: Map[Int, StructType],
      latestId: Int): DataFrame =
    frame.select(
      avroDecode(col("key"), keySchema).as("kafka_key"),
      avroDecodeRegistry(col("value"), valueRegistry, latestId).as("kafka_value"),
      col("offset"))
}

/** Kafka-backed [[ChangeSource]] (A1 streaming half + B6 offset reset):
  * constructs the configured stream read and decodes the wire format into
  * the standard envelope. `read` is the only method whose execution needs
  * the Kafka connector jars (absent offline) — the `.load()` boundary;
  * everything else (option mapping, wire decode, envelope schema) is
  * covered by KafkaWireSpec through [[KafkaWire.encodeEnvelope]]
  * round-trips. `startingOffset` defaults to the Config's own
  * `startingOffsets` (None = use what the source was configured with —
  * a per-call override must be EXPLICIT, so the Config field can never
  * be silently shadowed); an override is "earliest"/"latest" or the
  * Kafka source's per-partition offset JSON (`{"topic":{"0":12345}}`).
  * A bare numeric offset — valid for sources with one global offset
  * order, like [[ParquetChangeSource]] — has no Kafka meaning (offsets
  * are per-partition) and is rejected HERE with an actionable message
  * instead of surfacing as an opaque connector error at `.load()`. */
class KafkaChangeSource(
    cfg: KafkaWire.Config,
    keySchema: StructType,
    valueSchema: StructType) extends ChangeSource {
  def read(spark: SparkSession, startingOffset: Option[String] = None): DataFrame = {
    val offsets = startingOffset.getOrElse(cfg.startingOffsets)
    if (offsets.toLongOption.isDefined)
      throw new IllegalArgumentException(
        s"Kafka offsets are per-partition: pass startingOffsets JSON " +
          s"""like {"${cfg.topic}":{"0":$offsets}} (or earliest/latest), """ +
          s"not the bare offset $offsets")
    KafkaWire.decodeEnvelope(
      KafkaWire
        .kafkaStreamReader(spark, cfg.copy(startingOffsets = offsets))
        .load()
        .select(col("key"), col("value"), col("offset")),
      keySchema, valueSchema)
  }
}

/** Avro binary → struct, via [[AvroSerde]] (A4). CodegenFallback: wire
  * serde is a per-record boundary op, not an analytics hot path — the
  * surrounding projection still codegens around it. */
case class AvroDecode(child: Expression, schema: StructType)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val avro = AvroSerde.avroSchema(schema)
  @transient private lazy val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(schema)
  override def dataType: DataType = schema
  override def nullable: Boolean = true
  override def prettyName: String = "avro_decode"
  protected override def nullSafeEval(input: Any): Any =
    toCatalyst(AvroSerde.fromBytes(input.asInstanceOf[Array[Byte]], schema, avro))
  protected override def withNewChildInternal(newChild: Expression): AvroDecode =
    copy(child = newChild)
}

/** Registry-framed Avro binary → struct of the registry's LATEST schema,
  * dispatching on the per-record schema id (A4 + the wire half of sink
  * evolution; reference: ksqlDB infers the table schema from the
  * registered Avro subject and keeps consuming as it evolves,
  * ksql-transformations/01-movies-transform.sql:17-24, README.md:193).
  * `registry` models the subject's version history: id → the StructType
  * registered under that id. `latestId` names the subject's CURRENT
  * schema (the expression's output type) and is REQUIRED — there is no
  * max-id fallback, because that shortcut is only sound for registries
  * whose ids are minted monotonically with versions
  * ([[InMemorySchemaRegistry]]; callers there pass `keys.max`
  * themselves), while real Confluent global ids are CONTENT-ADDRESSED
  * and reused across subjects, so a subject's newest version can carry
  * a LOWER id than an older one — a reachable default would silently
  * decode every record to the old schema. [[SchemaRegistry
  * .decodeEnvelope]] passes the version history's last id. Decoding
  * uses Avro writer/reader resolution ([[AvroSerde.fromBytesResolved]])
  * so old records widen with NULLs; an id absent from the registry
  * fails loudly — silently dropping undecodable records would corrupt
  * the changelog. */
case class AvroDecodeRegistry(
    child: Expression,
    registry: Map[Int, StructType],
    latestId: Int)
    extends UnaryExpression with CodegenFallback {
  require(registry.nonEmpty, "schema registry map must not be empty")
  require(registry.contains(latestId),
    s"declared latest schema id $latestId is not in the registry map " +
      registry.keys.toSeq.sorted.mkString("[", ", ", "]"))
  private val readerSt = registry(latestId)
  @transient private lazy val readerAvro = AvroSerde.avroSchema(readerSt)
  @transient private lazy val writerAvro =
    registry.map { case (id, st) => id -> AvroSerde.avroSchema(st) }
  @transient private lazy val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(readerSt)
  override def dataType: DataType = readerSt
  override def nullable: Boolean = true
  override def prettyName: String = "avro_decode_registry"
  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val id = AvroSerde.schemaIdOf(bytes)
    val writer = writerAvro.getOrElse(id, throw new IllegalArgumentException(
      s"record written with unregistered schema id $id; registry has ids " +
        registry.keys.toSeq.sorted.mkString("[", ", ", "]")))
    toCatalyst(AvroSerde.fromBytesResolved(bytes, writer, readerSt, readerAvro))
  }
  protected override def withNewChildInternal(newChild: Expression): AvroDecodeRegistry =
    copy(child = newChild)
}

/** Struct → registry-framed Avro binary (0x00 + schema id + payload) —
  * the producer half of [[AvroDecodeRegistry]]'s wire contract. */
case class AvroEncodeRegistry(child: Expression, schema: StructType, schemaId: Int)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val avro = AvroSerde.avroSchema(schema)
  @transient private lazy val toScala =
    CatalystTypeConverters.createToScalaConverter(schema)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "avro_encode_registry"
  protected override def nullSafeEval(input: Any): Any =
    AvroSerde.toBytesWithId(
      toScala(input).asInstanceOf[org.apache.spark.sql.Row], schema, avro, schemaId)
  protected override def withNewChildInternal(newChild: Expression): AvroEncodeRegistry =
    copy(child = newChild)
}

/** Struct → Avro binary — the A4 write side. */
case class AvroEncode(child: Expression, schema: StructType)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val avro = AvroSerde.avroSchema(schema)
  @transient private lazy val toScala =
    CatalystTypeConverters.createToScalaConverter(schema)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "avro_encode"
  protected override def nullSafeEval(input: Any): Any =
    AvroSerde.toBytes(
      toScala(input).asInstanceOf[org.apache.spark.sql.Row], schema, avro)
  protected override def withNewChildInternal(newChild: Expression): AvroEncode =
    copy(child = newChild)
}
