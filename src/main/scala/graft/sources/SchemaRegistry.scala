package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** The Schema Registry surface the wire path consumes — the explicit
  * seam between the engine and Confluent's registry service (reference:
  * docker-compose.yaml:142-162 runs it at :8081;
  * start-source-connector.sh:97-101 points the Avro converters at it).
  *
  * The engine only ever needs three registry operations, and they are
  * exactly the Confluent REST surface's semantics:
  *  - `register`: subject + schema → id, IDEMPOTENT (re-registering a
  *    schema already in the subject returns its existing id — the
  *    producer-restart path must not mint new ids);
  *  - `schemaById`: the decode path's writer-schema lookup
  *    (`GET /schemas/ids/{id}`);
  *  - `subjectSnapshot`: the full id→schema history of one subject —
  *    what [[KafkaWire.decodeEnvelopeEvolving]]'s expression captures at
  *    PLAN TIME. A snapshot (not a live handle) is deliberate: the
  *    decode Expression serializes to executors, so the registry is
  *    consulted once per (re)plan on the driver and never per record —
  *    the same once-per-query trust model as ksqlDB's
  *    schema-inference-from-registry, and the reason this trait needs no
  *    serializable implementation.
  *
  * Implementations: [[InMemorySchemaRegistry]] (complete, carries every
  * evolution spec offline) and [[RestSchemaRegistry]] (the Confluent
  * REST client, r17) — the latter tested against an in-process JDK
  * HttpServer speaking the same wire protocol, so its request paths,
  * body shapes, idempotence, and 404/error mapping are pinned without a
  * network (RestSchemaRegistrySpec); only the TCP hop to a real :8081
  * remains deployment-verified. */
trait SchemaRegistry {
  /** Register `schema` under `subject`, returning its id — the existing
    * id when this exact schema is already registered there. */
  def register(subject: String, schema: StructType): Int

  /** The writer schema a Confluent-framed record's id names; None for
    * an id this registry never issued (the caller fails loudly —
    * silently skipping undecodable records is data loss). */
  def schemaById(id: Int): Option[StructType]

  /** The subject's full (id, schema) history in VERSION order (last =
    * current schema); empty Seq for an unknown subject. Version order is
    * the only trustworthy "which schema is latest" signal: Confluent
    * global ids are content-addressed and reused (across subjects, and
    * by a same-subject rollback re-registration), so the highest id is
    * NOT necessarily the newest version — the r17 REST client is where
    * that stops being hypothetical. */
  def subjectHistory(subject: String): Seq[(Int, StructType)]

  /** Every (id, schema) registered under `subject` as the id-dispatch
    * map [[KafkaWire.avroDecodeRegistry]] consumes; empty for an
    * unknown subject. Derived FINAL so the map and the history can
    * never disagree about a subject's contents. */
  final def subjectSnapshot(subject: String): Map[Int, StructType] =
    subjectHistory(subject).toMap
}

/** In-memory [[SchemaRegistry]] with Confluent id semantics: globally
  * unique monotonically-increasing ids, idempotent registration within
  * a subject, thread-safe. This is the registry the offline suite runs
  * evolution through end-to-end (AvroEvolutionSpec / KafkaWireSpec);
  * production swaps in an HTTP-backed implementation without touching
  * the wire path. */
final class InMemorySchemaRegistry extends SchemaRegistry {
  private val lock = new Object
  private var nextId = 1
  private var byId = Map.empty[Int, StructType]
  private var bySubject = Map.empty[String, Vector[Int]]

  def register(subject: String, schema: StructType): Int = lock.synchronized {
    val ids = bySubject.getOrElse(subject, Vector.empty)
    ids.find(id => byId(id) == schema).getOrElse {
      val id = nextId
      nextId += 1
      byId += id -> schema
      bySubject += subject -> (ids :+ id)
      id
    }
  }

  def schemaById(id: Int): Option[StructType] = lock.synchronized(byId.get(id))

  def subjectHistory(subject: String): Seq[(Int, StructType)] =
    lock.synchronized {
      bySubject.getOrElse(subject, Vector.empty).map(id => id -> byId(id))
    }
}

object SchemaRegistry {
  /** One subject's id-dispatch map + latest id — the load-bearing
    * "latest = last VERSION, never max id" rule (content-addressed
    * Confluent ids are reused, so the highest id is not the newest
    * version), kept in ONE place for every path that builds a decode
    * ([[decodeEnvelope]] here, the replication facade's key/value
    * resolution). */
  def resolveSubject(
      registry: SchemaRegistry, subject: String): (Map[Int, StructType], Int) = {
    val history = registry.subjectHistory(subject)
    require(history.nonEmpty, s"subject '$subject' has no registered schemas")
    (history.toMap, history.last._1)
  }

  /** [[KafkaWire.decodeEnvelopeEvolving]] resolved through the registry
    * seam: snapshot the value subject's history once (driver-side, plan
    * time) and build the id-dispatch decode from it. */
  def decodeEnvelope(
      frame: DataFrame,
      registry: SchemaRegistry,
      keySchema: StructType,
      valueSubject: String): DataFrame = {
    val (byId, latestId) = resolveSubject(registry, valueSubject)
    KafkaWire.decodeEnvelopeEvolving(frame, keySchema, byId, latestId = latestId)
  }
}
