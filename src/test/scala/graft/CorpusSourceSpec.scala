package graft

import org.apache.spark.sql.types._
import graft.sources.CorpusSource

/** Corrupt-row quarantine contract: good rows parse to the expected
  * schema, broken lines land in quarantine with their raw text, and
  * nothing is silently dropped (good + quarantined = input lines). */
class CorpusSourceSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("readJsonl splits good rows and quarantined raw lines, losing nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "missing lang field"}""",       // schema-on-read: lang NULL
      """{"doc_id": 3, "text": "broken line""",                 // malformed JSON
      """not json at all""",                                    // malformed
      """{"doc_id": 4, "text": "fine again", "lang": "de"}""")
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))

    val (good, quarantine) = CorpusSource.readJsonl(spark, dir.toString, schema)
    assert(good.columns.toSeq == Seq("doc_id", "text", "lang"))
    val g = good.collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
      .sortBy(_._1).toSeq
    assert(g == Seq(
      (1L, "hello world", Some("en")),
      (2L, "missing lang field", None),
      (4L, "fine again", Some("de"))))
    val q = quarantine.collect().map(_.getString(0)).sorted.toSeq
    assert(q == Seq("""not json at all""", """{"doc_id": 3, "text": "broken line"""))
    // conservation: every input line is accounted for exactly once
    assert(good.count() + quarantine.count() == lines.length.toLong)
  }

  test("blank and literal-null lines QUARANTINE, never become phantom all-NULL docs (r20)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-blank")
    val lines = Seq(
      """{"doc_id": 1, "text": "real doc", "lang": "en"}""",
      "",      // blank line: from_json('') yields a NULL struct
      "null",  // literal JSON null: NULL struct too
      """{"doc_id": 2, "text": "another", "lang": "de"}""")
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val (good, quarantine) = CorpusSource.readJsonl(spark, dir.toString, schema)
    // the NULL struct's corrupt-marker field is NULL, so a marker-only
    // test routed these to `good` as all-NULL rows
    assert(good.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
      "only rows that actually PARSED are good")
    assert(quarantine.collect().map(_.getString(0)).sorted.toSeq == Seq("", "null"))
    // the streaming flavor routes identically
    val streamed = CorpusSource.readJsonlStream(spark, dir.toString, schema)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-jsonl-blank-ck").toString
    val got = scala.collection.mutable.ArrayBuffer[(Option[Long], Option[String])]()
    val q = streamed.writeStream
      .outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got.synchronized {
          got ++= b.collect().map(r => (
            if (r.isNullAt(0)) None else Some(r.getLong(0)),
            Option(r.getString(r.fieldIndex("quarantined_raw")))))
        }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(got.count(_._2.isEmpty) == 2, s"two good rows: $got")
    assert(got.flatMap(_._2).sorted.toSeq == Seq("", "null"), s"two quarantined: $got")
  }

  test("readJsonl rejects a schema that collides with the corrupt marker") {
    val bad = StructType(Seq(StructField("__graft_corrupt", StringType)))
    intercept[IllegalArgumentException] {
      CorpusSource.readJsonl(spark, "/tmp/unused", bad)
    }
  }

  test("a valid line carrying a '_corrupt' payload key is NOT quarantined") {
    // the marker is namespaced precisely so plausible crawl-metadata keys
    // in the DATA cannot masquerade as the parser's corrupt-row signal
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-marker")
    java.nio.file.Files.write(
      dir.resolve("a.jsonl"),
      java.util.List.of(
        """{"doc_id": 1, "text": "ok", "_corrupt": "from the crawler"}""",
        """not json at all"""))
    val schema = StructType(Seq(
      StructField("doc_id", org.apache.spark.sql.types.LongType),
      StructField("text", StringType)))
    val (good, quarantine) = CorpusSource.readJsonl(spark, dir.toString, schema)
    assert(good.count() == 1L && quarantine.count() == 1L)
    assert(quarantine.collect().head.getString(0) == "not json at all")
  }

  test("readJsonlStream parses a file stream with the same quarantine semantics") {
    import org.apache.spark.sql.{Dataset, Row}
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-stream")
    java.nio.file.Files.write(dir.resolve("a.jsonl"),
      Seq(
        """{"doc_id": 1, "text": "good", "lang": "en"}""",
        """garbage line""").mkString("\n").getBytes("UTF-8"))
    val out = scala.collection.mutable.ArrayBuffer[(Option[Long], Option[String])]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-jsonl-ckpt").toString
    val q = CorpusSource.readJsonlStream(spark, dir.toString, schema)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val rows = batch.collect().map { r =>
          (if (r.isNullAt(0)) None else Some(r.getLong(0)),
            Option(r.getString(r.fieldIndex("quarantined_raw"))))
        }
        out.synchronized { out ++= rows }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(out.sortBy(_._1).toList == List(
      (None, Some("garbage line")),
      (Some(1L), None)))
  }
}
