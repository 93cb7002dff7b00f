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

  // the in-process Confluent-wire service lives in TestRegistryServer
  // (shared with ReplicationRegistrySpec, which drives the replication
  // facade through this same protocol surface)

  private def withServer[A](body: (TestRegistryServer, RestSchemaRegistry) => A): A = {
    val srv = new TestRegistryServer
    try body(srv, new RestSchemaRegistry(srv.url))
    finally srv.stop()
  }

  private val v1 = StructType(Seq(
    StructField("movie_id", IntegerType, nullable = false),
    StructField("title", StringType, nullable = true)))
  private val v2 = StructType(v1.fields.toSeq :+
    StructField("rating", DecimalType(3, 1), nullable = true))

  test("register is idempotent through the wire and ids are content-addressed") {
    withServer { (_, reg) =>
      val id1 = reg.register("movies-value", v1)
      assert(reg.register("movies-value", v1) == id1,
        "re-registering the same schema must return the existing id")
      val id2 = reg.register("movies-value", v2)
      assert(id2 != id1)
      // the real Confluent id model: the same schema CONTENT gets the
      // same global id under a different subject — the property that
      // makes max-id an unsound "latest" (pinned end-to-end below)
      assert(reg.register("movies-key", v1) == id1,
        "identical schema content must reuse the global id across subjects")
    }
  }

  test("latest is the newest VERSION, not the highest id") {
    // content-addressed ids make a subject's newest version carry a
    // LOWER id than an older one: v2's schema was registered earlier
    // under another subject. The decode built through the trait must
    // output the latest VERSION's schema; the max-id shortcut (valid
    // only for the in-memory registry's monotone ids) would pick the
    // OLD schema and silently drop the new column from every record.
    withServer { (_, reg) =>
      val idA = reg.register("staging-value", v2) // v2 content gets the LOW id
      val idB = reg.register("movies-value", v1)
      assert(reg.register("movies-value", v2) == idA)
      val hist = reg.subjectHistory("movies-value")
      assert(hist == Seq(idB -> v1, idA -> v2))
      assert(hist.last._1 < hist.head._1,
        "fixture must exercise latest-version id < older-version id")
      import org.apache.spark.sql.catalyst.expressions.Literal
      val lit = Literal(null, BinaryType)
      assert(graft.sources.AvroDecodeRegistry(
        lit, hist.toMap, latestId = hist.last._1).dataType == v2,
        "the history's last version must be the output schema")
      // the max-id shortcut would have picked v1 (idB > idA) — pinned
      // here as the WRONG answer, and latestId is a required parameter
      // so that shortcut is no longer reachable by omission
      val dispatch = hist.toMap
      assert(dispatch(dispatch.keys.max) == v1)
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

  test("repeat subjectHistory costs ONE round-trip: immutable versions are memoized") {
    // the registry-decoding pull query resolves the subject per point
    // lookup; without the memo that is 1 + V sequential HTTP requests
    // (each with the client's full timeout) on the serving path. The
    // version LIST stays live (new versions must be seen); the
    // per-version fetches happen once per unseen version.
    withServer { (srv, reg) =>
      val id1 = reg.register("movies-value", v1)
      assert(reg.subjectHistory("movies-value") == Seq(id1 -> v1))
      srv.requests.clear()
      assert(reg.subjectHistory("movies-value") == Seq(id1 -> v1))
      assert(srv.requests.asScala.map(_._2).toList ==
        List("/subjects/movies-value/versions"),
        "second resolution must re-fetch only the live version list")
      // a NEW version is seen immediately and fetched exactly once
      val id2 = reg.register("movies-value", v2)
      srv.requests.clear()
      assert(reg.subjectHistory("movies-value") == Seq(id1 -> v1, id2 -> v2))
      assert(srv.requests.asScala.map(_._2).toList ==
        List("/subjects/movies-value/versions", "/subjects/movies-value/versions/2"),
        "only the unseen version pays a fetch")
      // the escape hatch for hard-delete surgery: no memo at all
      val uncached = new graft.sources.RestSchemaRegistry(srv.url, cacheVersions = false)
      srv.requests.clear()
      uncached.subjectHistory("movies-value")
      uncached.subjectHistory("movies-value")
      assert(srv.requests.asScala.count(_._2 == "/subjects/movies-value/versions/1") == 2,
        "cacheVersions=false must re-fetch every version each call")
    }
  }

  test("concurrent cold resolutions of one subject all succeed; the memo settles to one entry") {
    // the memo fetches OUTSIDE the ConcurrentHashMap bin lock (r18
    // review: a wedged fetch inside computeIfAbsent stalls unrelated
    // threads) — the cost is a benign duplicate fetch under a cold-start
    // race, never a wrong or missing result. Hammer one subject from
    // many threads, cold cache: every thread sees the full history, and
    // afterwards the memo serves repeats with only the live list call.
    withServer { (srv, reg) =>
      val id1 = reg.register("movies-value", v1)
      val id2 = reg.register("movies-value", v2)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val results = (1 to 16).map { _ =>
          pool.submit(new java.util.concurrent.Callable[Seq[(Int, _)]] {
            def call() = reg.subjectHistory("movies-value")
          })
        }.map(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
        results.foreach(h => assert(h == Seq(id1 -> v1, id2 -> v2)))
      } finally pool.shutdownNow()
      // warm now: a repeat resolution pays exactly the one live call
      srv.requests.clear()
      reg.subjectHistory("movies-value")
      assert(srv.requests.asScala.map(_._2).toList ==
        List("/subjects/movies-value/versions"),
        "post-race the memo must hold both versions")
    }
  }

  test("wire shapes: paths, content type, and basic auth reach the service verbatim") {
    val srv = new TestRegistryServer
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

  test("a well-statused but MALFORMED body fails loudly, never a bare NPE") {
    // a proxy's HTML error page with a 200, a registry that dropped a
    // field, an empty body: each must fail with the requireOk error
    // shape (request description + status + body), not a
    // NullPointerException from a missing JSON key (r17 advisor finding)
    def serve(body: String)(check: RestSchemaRegistry => Unit): Unit = {
      val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      srv.createContext("/", (ex: HttpExchange) => {
        val b = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, if (b.isEmpty) -1 else b.length)
        if (b.nonEmpty) ex.getResponseBody.write(b)
        ex.close()
      })
      srv.start()
      try check(new RestSchemaRegistry(s"http://127.0.0.1:${srv.getAddress.getPort}"))
      finally srv.stop(0)
    }
    // missing key with an otherwise-valid object body
    serve("""{"unexpected":42}""") { reg =>
      val e = intercept[IllegalStateException](reg.register("s", v1))
      assert(e.getMessage.contains("register under 's'")
        && e.getMessage.contains("'id'")
        && e.getMessage.contains("unexpected"), e.getMessage)
      val e2 = intercept[IllegalStateException](reg.schemaById(1))
      assert(e2.getMessage.contains("'schema'"), e2.getMessage)
      // the versions LIST must be an array — an object here means the
      // endpoint is not what we think it is
      val e3 = intercept[IllegalStateException](reg.subjectHistory("s"))
      assert(e3.getMessage.contains("array"), e3.getMessage)
    }
    // non-JSON (the proxy-error-page case) and empty bodies
    serve("<html>gateway error</html>") { reg =>
      val e = intercept[IllegalStateException](reg.register("s", v1))
      assert(e.getMessage.contains("gateway error"), e.getMessage)
    }
    serve("") { reg =>
      val e = intercept[IllegalStateException](reg.register("s", v1))
      assert(e.getMessage.contains("valid JSON"), e.getMessage)
    }
    // a WELL-TYPED key holding the wrong JSON type: asInt() would
    // coerce "7" fine but {"id":"oops"} (or a versions list of
    // strings) to 0 — a wrong id downstream instead of a loud error
    serve("""{"id":"oops"}""") { reg =>
      val e = intercept[IllegalStateException](reg.register("s", v1))
      assert(e.getMessage.contains("integer"), e.getMessage)
    }
    serve("""["latest"]""") { reg =>
      val e = intercept[IllegalStateException](reg.subjectHistory("s"))
      assert(e.getMessage.contains("array of version numbers"), e.getMessage)
    }
    // FLOATING-POINT where an integer is promised: canConvertToInt
    // alone checks range, so {"id":3.7} would truncate to 3 and
    // dispatch a wrong schema id (r18 advisor finding) — and a
    // fractional versions-list element would 404 on a version nobody
    // named; both must trip the malformed-body contract instead
    serve("""{"id":3.7}""") { reg =>
      val e = intercept[IllegalStateException](reg.register("s", v1))
      assert(e.getMessage.contains("integer") && e.getMessage.contains("3.7"),
        e.getMessage)
    }
    serve("""[1.5]""") { reg =>
      val e = intercept[IllegalStateException](reg.subjectHistory("s"))
      assert(e.getMessage.contains("array of version numbers"), e.getMessage)
    }
    // an integral-VALUED float (3.0) is still not the protocol's shape —
    // Confluent writes JSON integers; accept-and-round would paper over
    // a body that is not what we think it is... but canConvertToExact-
    // Integral treats 3.0 as exact, so pin the ACTUAL contract: 3.0
    // converts (documented Jackson semantics), 3.7 never does
    serve("""{"id":3.0}""") { reg =>
      assert(reg.register("s", v1) == 3,
        "an exact-integral float converts under Jackson's canConvertToExactIntegral")
    }
  }

  test("subjects with reserved URL characters travel percent-encoded") {
    withServer { (srv, reg) =>
      // custom subject-name strategies can put spaces and slashes in
      // subjects; raw interpolation would throw (space) or change the
      // request path (slash)
      val id = reg.register("cso movies/value#1", v1)
      assert(reg.subjectHistory("cso movies/value#1") == Seq(id -> v1))
      val paths = srv.requests.asScala.map(_._2).toList
      assert(paths.forall(_.contains("cso%20movies%2Fvalue%231")), paths.toString)
    }
  }

  test("foreign schema shapes that cannot round-trip fail LOUDLY at fetch, not per record") {
    def parse(json: String) = new org.apache.avro.Schema.Parser().parse(json)
    // union(T, null): branch order is encoded in the binary — the
    // regenerated null-first writer schema would decode swapped indices
    val tFirst = parse("""{"type":"record","name":"R","fields":[
      {"name":"t","type":["string","null"]}]}""")
    val e1 = intercept[IllegalArgumentException](AvroSerde.structType(tFirst))
    assert(e1.getMessage.contains("null-FIRST"))
    // decimal on FIXED: different binary layout than the bytes decimal
    // the serde encodes
    val fixedDec = parse("""{"type":"record","name":"R","fields":[
      {"name":"d","type":{"type":"fixed","name":"F","size":4,
        "logicalType":"decimal","precision":9,"scale":2}}]}""")
    val e2 = intercept[IllegalArgumentException](AvroSerde.structType(fixedDec))
    assert(e2.getMessage.contains("bytes"))
    // timestamp-millis rides a plain long: mapping it to LongType (or
    // worse, TimestampType at micros) would ship values off by 1000x
    val millis = parse("""{"type":"record","name":"R","fields":[
      {"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}}]}""")
    val e3 = intercept[IllegalArgumentException](AvroSerde.structType(millis))
    assert(e3.getMessage.contains("timestamp-millis"))
    // uuid on STRING rides losslessly: plain StringType, no error
    val uuid = parse("""{"type":"record","name":"R","fields":[
      {"name":"u","type":{"type":"string","logicalType":"uuid"}}]}""")
    assert(AvroSerde.structType(uuid) ==
      StructType(Seq(StructField("u", StringType, nullable = false))))
    // uuid on FIXED(16) (Avro 1.12 attaches it there too): raw 16 bytes
    // vs a regenerated varint-length string writer — refuse at fetch
    val fixedUuid = parse("""{"type":"record","name":"R","fields":[
      {"name":"u","type":{"type":"fixed","name":"U","size":16,
        "logicalType":"uuid"}}]}""")
    val e4 = intercept[IllegalArgumentException](AvroSerde.structType(fixedUuid))
    assert(e4.getMessage.contains("uuid"))
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
