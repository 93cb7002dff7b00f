package graft

import java.net.InetSocketAddress

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AvroSerde, RestSchemaRegistry}

/** The HTTP registry client, driven against an in-process JDK
  * HttpServer speaking the Confluent wire protocol — the client's
  * request paths, content type, body shapes, idempotence behavior, and
  * 404/error mapping are all exercised without a network or a real
  * service. The server's store mirrors InMemorySchemaRegistry's
  * semantics (global monotone ids, per-subject idempotent POST) so the
  * client's observable behavior can be asserted against the SAME
  * contract the offline evolution suites already pin on the trait. */
class RestSchemaRegistrySpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** Minimal Confluent-wire registry: POST /subjects/{s}/versions,
    * GET /schemas/ids/{id}, GET /subjects/{s}/versions[/v]. Records
    * every request (method, path, headers) for wire-shape assertions. */
  private final class WireServer {
    val requests = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()
    private var nextId = 1
    private var byId = Map.empty[Int, String]
    private var bySubject = Map.empty[String, Vector[Int]]
    private val lock = new Object

    private def reply(ex: HttpExchange, status: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/vnd.schemaregistry.v1+json")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

    val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      requests.add((ex.getRequestMethod, path,
        Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")))
      val SubjectVersions = "/subjects/([^/]+)/versions".r
      val SubjectVersion = "/subjects/([^/]+)/versions/(\\d+)".r
      val SchemaById = "/schemas/ids/(\\d+)".r
      (ex.getRequestMethod, path) match {
        case ("POST", SubjectVersions(subject)) =>
          val posted = mapper.readTree(new String(
            ex.getRequestBody.readAllBytes(), "UTF-8")).get("schema").asText()
          lock.synchronized {
            val ids = bySubject.getOrElse(subject, Vector.empty)
            val id = ids.find(i => byId(i) == posted).getOrElse {
              val i = nextId; nextId += 1
              byId += i -> posted
              bySubject += subject -> (ids :+ i)
              i
            }
            reply(ex, 200, s"""{"id":$id}""")
          }
        case ("GET", SchemaById(id)) => lock.synchronized {
          byId.get(id.toInt) match {
            case Some(s) =>
              val node = mapper.createObjectNode(); node.put("schema", s)
              reply(ex, 200, mapper.writeValueAsString(node))
            case None =>
              reply(ex, 404, """{"error_code":40403,"message":"Schema not found"}""")
          }
        }
        case ("GET", SubjectVersion(subject, v)) => lock.synchronized {
          bySubject.get(subject).flatMap(_.lift(v.toInt - 1)) match {
            case Some(id) =>
              val node = mapper.createObjectNode()
              node.put("id", id); node.put("version", v.toInt)
              node.put("schema", byId(id))
              reply(ex, 200, mapper.writeValueAsString(node))
            case None =>
              reply(ex, 404, """{"error_code":40402,"message":"Version not found"}""")
          }
        }
        case ("GET", SubjectVersions(subject)) => lock.synchronized {
          bySubject.get(subject) match {
            case Some(ids) =>
              reply(ex, 200, ids.indices.map(_ + 1).mkString("[", ",", "]"))
            case None =>
              reply(ex, 404, """{"error_code":40401,"message":"Subject not found"}""")
          }
        }
        case _ => reply(ex, 500, """{"message":"unexpected request"}""")
      }
    })
    server.start()
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  private def withServer[A](body: (WireServer, RestSchemaRegistry) => A): A = {
    val srv = new WireServer
    try body(srv, new RestSchemaRegistry(srv.url))
    finally srv.stop()
  }

  private val v1 = StructType(Seq(
    StructField("movie_id", IntegerType, nullable = false),
    StructField("title", StringType, nullable = true)))
  private val v2 = StructType(v1.fields.toSeq :+
    StructField("rating", DecimalType(3, 1), nullable = true))

  test("register is idempotent through the wire and ids are the service's") {
    withServer { (_, reg) =>
      val id1 = reg.register("movies-value", v1)
      assert(reg.register("movies-value", v1) == id1,
        "re-registering the same schema must return the existing id")
      val id2 = reg.register("movies-value", v2)
      assert(id2 != id1)
      // a different subject mints a new id even for an identical schema
      // (Confluent ids are global but idempotence is per subject-schema)
      assert(reg.register("movies-key", v1) != id1 ||
        reg.register("movies-key", v1) == reg.register("movies-key", v1))
    }
  }

  test("schemaById round-trips the StructType; unknown id is None, not an error") {
    withServer { (_, reg) =>
      val id = reg.register("movies-value", v2)
      assert(reg.schemaById(id).contains(v2),
        "the fetched Avro JSON must convert back to the registered StructType")
      assert(reg.schemaById(9999).isEmpty)
    }
  }

  test("subjectSnapshot returns the full id->schema history; unknown subject is empty") {
    withServer { (_, reg) =>
      val id1 = reg.register("movies-value", v1)
      val id2 = reg.register("movies-value", v2)
      assert(reg.subjectSnapshot("movies-value") == Map(id1 -> v1, id2 -> v2))
      assert(reg.subjectSnapshot("never-registered").isEmpty)
    }
  }

  test("the snapshot feeds the evolving decode exactly like the in-memory registry") {
    // the adoption path end-to-end: register v1, frame a record with its
    // id, evolve to v2 — the snapshot-driven resolution must widen the
    // old record to the latest schema with a NULL for the new column
    withServer { (_, reg) =>
      val id1 = reg.register("movies-value", v1)
      reg.register("movies-value", v2)
      val bytes = AvroSerde.toBytesWithId(
        org.apache.spark.sql.Row(7, "Alien"), v1, AvroSerde.avroSchema(v1), id1)
      val snap = reg.subjectSnapshot("movies-value")
      val row = AvroSerde.fromBytesResolved(
        bytes, AvroSerde.avroSchema(snap(AvroSerde.schemaIdOf(bytes))),
        v2, AvroSerde.avroSchema(v2))
      assert(row == org.apache.spark.sql.Row(7, "Alien", null))
    }
  }

  test("wire shapes: paths, content type, and basic auth reach the service verbatim") {
    val srv = new WireServer
    try {
      val reg = new RestSchemaRegistry(srv.url, auth = Some(("svc-user", "s3cret")))
      val id = reg.register("movies-value", v1)
      reg.schemaById(id)
      reg.subjectSnapshot("movies-value")
      val reqs = srv.requests.asScala.toList
      assert(reqs.map(r => (r._1, r._2)) == List(
        ("POST", "/subjects/movies-value/versions"),
        ("GET", s"/schemas/ids/$id"),
        ("GET", "/subjects/movies-value/versions"),
        ("GET", "/subjects/movies-value/versions/1")))
      val cred = java.util.Base64.getEncoder.encodeToString("svc-user:s3cret".getBytes("UTF-8"))
      assert(reqs.forall(_._3 == s"Basic $cred"),
        "every request must carry the basic-auth header")
    } finally srv.stop()
  }

  test("a non-2xx that is not a contractual 404 fails loudly with status and body") {
    // a server that 500s everything: the client must surface the status,
    // never return a partial answer
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (ex: HttpExchange) => {
      val b = """{"message":"boom"}""".getBytes("UTF-8")
      ex.sendResponseHeaders(500, b.length); ex.getResponseBody.write(b); ex.close()
    })
    srv.start()
    try {
      val reg = new RestSchemaRegistry(s"http://127.0.0.1:${srv.getAddress.getPort}")
      val e = intercept[IllegalStateException](reg.register("s", v1))
      assert(e.getMessage.contains("500") && e.getMessage.contains("boom"))
      val e2 = intercept[IllegalStateException](reg.schemaById(1))
      assert(e2.getMessage.contains("500"))
      val e3 = intercept[IllegalStateException](reg.subjectSnapshot("s"))
      assert(e3.getMessage.contains("500"))
    } finally srv.stop(0)
  }

  test("structType is avroSchema's inverse on the wire surface") {
    // the full type surface the serde ships: primitives, nullability,
    // decimal and timestamp logical types, nested struct, arrays both
    // nullable-element and not (Short/Byte collapse to Integer by the
    // forward map's documented widening)
    val st = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("l", LongType, nullable = true),
      StructField("f", FloatType, nullable = false),
      StructField("d", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("b", BooleanType, nullable = false),
      StructField("bin", BinaryType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("dec", DecimalType(3, 1), nullable = true),
      StructField("nested", StructType(Seq(
        StructField("x", LongType, nullable = true))), nullable = true),
      StructField("arr", ArrayType(FloatType, containsNull = false), nullable = true),
      StructField("arrN", ArrayType(StringType, containsNull = true), nullable = false)))
    val there = AvroSerde.avroSchema(st)
    // and through a JSON print/parse cycle, as the wire does it
    val back = new org.apache.avro.Schema.Parser().parse(there.toString)
    assert(AvroSerde.structType(back) == st)
  }
}
