package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types.StructType

/** [[SchemaRegistry]] over Confluent Schema Registry's REST surface —
  * the deployment half the in-memory registry stands in for offline
  * (reference: docker-compose.yaml:142-162 runs the service at :8081;
  * start-source-connector.sh:97-101 points the Avro converters at it).
  * Shipped TESTED despite the sandbox having no network: the spec
  * drives this client against an in-process JDK HttpServer speaking the
  * same wire protocol (RestSchemaRegistrySpec), so the request paths,
  * content type, body shapes, and error mapping are all pinned — the
  * pieces a mock-free "deployment drop-in" note used to leave to the
  * first production run.
  *
  * Wire protocol (Confluent Schema Registry API, v1 content type):
  *  - `POST /subjects/{subject}/versions` body `{"schema": <avro json>}`
  *    → `{"id": N}`; the service is idempotent for a schema already
  *    registered under the subject (same id back), which is what the
  *    trait's `register` contract requires;
  *  - `GET /schemas/ids/{id}` → `{"schema": <avro json>}`; 404 → None;
  *  - `GET /subjects/{subject}/versions` → `[1, 2, …]`, then
  *    `GET /subjects/{subject}/versions/{v}` → `{"id": N, "schema": …}`
  *    per version, kept in VERSION order (the trait's subjectHistory —
  *    Confluent global ids are content-addressed and reusable, so only
  *    version order can name the current schema); a 404 subject →
  *    empty history (the trait's unknown-subject contract).
  *
  * Schemas cross the wire as Avro schema JSON ([[AvroSerde.avroSchema]]
  * out, [[AvroSerde.structType]] back) — the same mapping the engine's
  * serde uses, so a schema registered here decodes exactly the bytes
  * [[AvroSerde.toBytesWithId]] frames. The conversion is deterministic,
  * which is what makes the service-side idempotence reachable: the same
  * StructType always posts byte-identical schema JSON.
  *
  * Driver-side only, by the same plan-time trust model the trait
  * documents: [[SchemaRegistry.decodeEnvelope]] snapshots a subject once
  * per (re)plan; nothing here serializes to executors. Non-2xx responses
  * other than the contractual 404s fail LOUDLY with the status and body
  * — a half-up registry must stop the plan, not ship a partial subject
  * history into the decode expression.
  *
  * @param baseUrl e.g. `http://schema-registry:8081` (no trailing slash)
  * @param auth    optional basic-auth credentials (user, password) —
  *                Confluent's `basic.auth.user.info` equivalent
  */
final class RestSchemaRegistry(
    baseUrl: String,
    auth: Option[(String, String)] = None,
    timeout: Duration = Duration.ofSeconds(30),
    cacheVersions: Boolean = true) extends SchemaRegistry {

  private val ContentType = "application/vnd.schemaregistry.v1+json"
  private val mapper = new ObjectMapper()
  private val client = HttpClient.newBuilder().connectTimeout(timeout).build()
  private val base = baseUrl.stripSuffix("/")

  /** (subject, version) → (id, schema) memo. A Confluent (subject,
    * version) binding is IMMUTABLE in normal operation (evolution and
    * soft-deletes only ever mint new version numbers), so repeated
    * `subjectHistory` calls — e.g. a registry-decoding pull query per
    * point lookup — cost ONE round-trip (the version list, which must
    * stay live to see new versions) plus fetches for unseen versions
    * only, instead of 1 + V sequential HTTP requests each with this
    * client's full timeout. The one operation that REMAPS version
    * numbers is a hard subject DELETE followed by re-registration —
    * destructive admin surgery; run it with `cacheVersions = false`
    * (or a fresh client), same as Confluent's own caching serializers
    * require. */
  private val versionCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), (Int, StructType)]()

  def register(subject: String, schema: StructType): Int = {
    val what = s"register under '$subject'"
    val body = mapper.createObjectNode()
    body.put("schema", AvroSerde.avroSchema(schema).toString)
    val resp = send(request(s"$base/subjects/${enc(subject)}/versions")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body))))
    requireOk(resp, what)
    intField(resp, parsed(resp, what), what, "id")
  }

  def schemaById(id: Int): Option[StructType] = {
    val resp = send(request(s"$base/schemas/ids/$id").GET())
    if (resp.statusCode() == 404) None
    else {
      requireOk(resp, s"fetch schema id $id")
      Some(AvroSerde.structType(new org.apache.avro.Schema.Parser()
        .parse(jsonField(resp, s"fetch schema id $id", "schema").asText())))
    }
  }

  def subjectHistory(subject: String): Seq[(Int, StructType)] = {
    val versions = send(request(s"$base/subjects/${enc(subject)}/versions").GET())
    if (versions.statusCode() == 404) Seq.empty
    else {
      requireOk(versions, s"list versions of '$subject'")
      // version ORDER is the payload here (Confluent returns versions
      // ascending; sorted defensively) — the last entry is the
      // subject's current schema, which content-addressed global ids
      // cannot tell you (a rollback re-registration reuses an old id)
      val listWhat = s"list versions of '$subject'"
      val list = parsed(versions, listWhat)
      if (!list.isArray)
        malformed(versions, listWhat, "a JSON array of version numbers")
      def fetch(v: Int): (Int, StructType) = {
        val what = s"fetch '$subject' version $v"
        val resp = send(request(s"$base/subjects/${enc(subject)}/versions/$v").GET())
        // a version the list just named MUST resolve: a 404 here means
        // the subject changed mid-snapshot (or the service is lying) —
        // either way a partial history must not reach the decoder
        requireOk(resp, what)
        val node = parsed(resp, what)
        intField(resp, node, what, "id") -> AvroSerde.structType(
          new org.apache.avro.Schema.Parser()
            .parse(jsonField(resp, node, what, "schema").asText()))
      }
      list.elements().asScala.toSeq.map { e =>
        // asInt() would coerce a textual element ("latest", an HTML
        // fragment behind a proxy) to version 0 and surface as a
        // spurious 404 on a version nobody named — the malformed-body
        // contract owns this failure, not the follow-up fetch (and a
        // floating-point element must not truncate: same isExactInt
        // rule as intField)
        if (!isExactInt(e))
          malformed(versions, listWhat, "a JSON array of version numbers")
        e.intValue()
      }.sorted.map { v =>
        if (cacheVersions) {
          // NOT computeIfAbsent: its mapping function runs under the
          // map's bin lock, so one wedged fetch (full client timeout)
          // would stall every unrelated thread hashing to the same bin.
          // A duplicate concurrent fetch of the same immutable
          // (subject, version) binding is idempotent — race freely.
          val k = (subject, v)
          val cached = versionCache.get(k)
          if (cached != null) cached
          else { val r = fetch(v); versionCache.putIfAbsent(k, r); r }
        } else fetch(v)
      }
    }
  }

  /** Percent-encode a subject for use as one URL path segment —
    * Confluent subjects can carry any character under custom
    * subject-name strategies; a raw space would make URI.create throw
    * and a raw '/', '?', '#' would silently change the request. */
  private def enc(subject: String): String =
    java.net.URLEncoder.encode(subject, java.nio.charset.StandardCharsets.UTF_8)
      .replace("+", "%20")

  private def request(url: String): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(timeout)
      .header("Content-Type", ContentType)
      .header("Accept", ContentType)
    auth.fold(b) { case (user, pass) =>
      val cred = java.util.Base64.getEncoder.encodeToString(
        s"$user:$pass".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      b.header("Authorization", s"Basic $cred")
    }
  }

  private def send(b: HttpRequest.Builder): HttpResponse[String] =
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())

  private def requireOk(resp: HttpResponse[String], what: String): Unit =
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new IllegalStateException(
        s"schema registry: $what failed with HTTP ${resp.statusCode()}: " +
          resp.body().take(500))

  /** A 2xx body that is not what the protocol promised — same loud
    * error shape as [[requireOk]] (request description + status + body),
    * never a bare NullPointerException from a missing key (r17 advisor
    * finding): a proxy's HTML error page with a 200, or a registry
    * version whose response dropped a field, must name the request it
    * broke. */
  private def malformed(
      resp: HttpResponse[String], what: String, expected: String): Nothing =
    throw new IllegalStateException(
      s"schema registry: $what returned HTTP ${resp.statusCode()} but its " +
        s"body is not $expected: ${resp.body().take(500)}")

  private def parsed(
      resp: HttpResponse[String], what: String): com.fasterxml.jackson.databind.JsonNode = {
    val node =
      try mapper.readTree(resp.body())
      catch {
        case _: com.fasterxml.jackson.core.JacksonException =>
          malformed(resp, what, "valid JSON")
      }
    // readTree maps an EMPTY body to null/MissingNode depending on the
    // jackson line — normalize both to the same loud failure
    if (node == null || node.isMissingNode) malformed(resp, what, "valid JSON")
    node
  }

  /** Required object field of a 2xx response body. */
  private def jsonField(
      resp: HttpResponse[String],
      what: String,
      name: String): com.fasterxml.jackson.databind.JsonNode =
    jsonField(resp, parsed(resp, what), what, name)

  /** Same, against an already-parsed body — multi-field readers parse
    * once (a version response embeds the full Avro schema JSON; double
    * parsing it per field is pure waste). */
  private def jsonField(
      resp: HttpResponse[String],
      node: com.fasterxml.jackson.databind.JsonNode,
      what: String,
      name: String): com.fasterxml.jackson.databind.JsonNode = {
    val f = node.get(name)
    if (f == null || f.isNull)
      malformed(resp, what, s"a JSON object carrying '$name'")
    f
  }

  /** Required INTEGER field: asInt() coerces text/objects to 0, which
    * would send a wrong id downstream instead of failing here. And
    * canConvertToInt alone checks RANGE only — a floating-point body
    * ({"id": 3.7}) passes it and intValue() silently truncates to 3,
    * dispatching a wrong schema id; the value must also be integral
    * (r18 advisor finding). */
  private def intField(
      resp: HttpResponse[String],
      node: com.fasterxml.jackson.databind.JsonNode,
      what: String,
      name: String): Int = {
    val f = jsonField(resp, node, what, name)
    if (!isExactInt(f)) malformed(resp, what, s"an integer '$name'")
    f.intValue()
  }

  /** In-int-range AND integral: 3.7 must not truncate to 3. */
  private def isExactInt(f: com.fasterxml.jackson.databind.JsonNode): Boolean =
    f.canConvertToInt && f.canConvertToExactIntegral
}
