package graft

import java.net.InetSocketAddress

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Minimal in-process Confluent-wire schema registry: POST
  * /subjects/{s}/versions, GET /schemas/ids/{id}, GET
  * /subjects/{s}/versions[/v]. Records every request (method, path,
  * auth header) for wire-shape assertions. Shared by
  * RestSchemaRegistrySpec (the client's protocol surface) and
  * ReplicationRegistrySpec (the registry-backed replication facade
  * end-to-end), so the two suites exercise the SAME service semantics.
  *
  * The store mirrors the real Confluent model where it matters:
  * CONTENT-ADDRESSED global ids (the same schema JSON gets the same id
  * under every subject — which is exactly what makes "latest = max id"
  * false and the version order load-bearing), per-subject idempotent
  * POST, version numbers 1-based in registration order. */
final class TestRegistryServer {
  private val mapper = new ObjectMapper()
  val requests = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()
  private var nextId = 1
  private var byId = Map.empty[Int, String]
  private var byJson = Map.empty[String, Int]
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
    // RAW path: the subject segment arrives percent-encoded and must
    // be routed as ONE segment (getPath would decode %2F into a real
    // slash and split it — the exact confusion the encoding prevents)
    val path = ex.getRequestURI.getRawPath
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
          val id = byJson.getOrElse(posted, {
            val i = nextId; nextId += 1
            byId += i -> posted; byJson += posted -> i
            i
          })
          val ids = bySubject.getOrElse(subject, Vector.empty)
          if (!ids.contains(id)) bySubject += subject -> (ids :+ id)
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
