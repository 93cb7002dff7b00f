package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.IngestPipeline

/** End-to-end contract of the one-call ingest pipeline: gates drop
  * low-quality docs, history and in-stream duplicates are removed
  * (first arrival wins across batches), survivors land in the parquet
  * corpus as context-window chunks, exactly once. */
class IngestPipelineSpec extends SparkTestBase {

  import spark.implicits._

  test("ingest: gate -> dedup (history + stream) -> chunk -> parquet, end to end") {
    val history = Seq((100L, "already ingested text here"))
      .toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-ingest-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest-ckpt").toString
    val cfg = IngestPipeline.Config(
      outDir = out, checkpointDir = ckpt,
      minTokens = 2, chunkWindow = 3, chunkStride = 2)

    val input = MemoryStream[(Long, String)](spark)
    val q = IngestPipeline.run(
      input.toDF().toDF("doc_id", "text"), history, cfg)
    try {
      input.addData(Seq(
        (1L, "already ingested text here"),   // history dup — dropped
        (2L, "one two three four five"),      // survives: 2 chunks
        (3L, "solo")))                        // below minTokens — gated out
      q.processAllAvailable()
      input.addData(Seq(
        (4L, "one two three four five"),      // in-stream dup of 2 — dropped
        (5L, "six seven eight")))             // survives: 1 chunk
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got == Seq(
      (2L, 0, "one two three", 3), (2L, 1, "three four five", 3),
      (2L, 2, "five", 1), // tail chunk (window 3, stride 2 over 5 tokens)
      (5L, 0, "six seven eight", 3), (5L, 1, "eight", 1)))
  }

  test("restart resumes dedup state and the corpus stays exactly-once") {
    // the facade-level restart composition (StreamRestartSpec pins the
    // component): kill the ingest query, restart on the same checkpoint
    // with the source slice realigned — the RESUMED fingerprint state
    // must drop a cross-restart duplicate, and the parquet sink's
    // commit log must keep the corpus exactly-once (no re-chunked
    // gen-1 docs)
    val history = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-ingest-rs-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest-rs-ckpt").toString
    val cfg = IngestPipeline.Config(
      outDir = out, checkpointDir = ckpt,
      minTokens = 2, chunkWindow = 3, chunkStride = 2)
    val batch1 = Seq((1L, "one two three four five"), (2L, "six seven eight"))
    val batch2 = Seq(
      (3L, "one two three four five"), // cross-restart dup of 1 — resumed state drops it
      (4L, "nine ten eleven"))
    val input1 = MemoryStream[(Long, String)](spark)
    val q1 = IngestPipeline.run(input1.toDF().toDF("doc_id", "text"), history, cfg)
    try { input1.addData(batch1); q1.processAllAvailable() } finally q1.stop()
    val input2 = MemoryStream[(Long, String)](spark)
    input2.addData(batch1) // replayed source offsets are the source's duty
    val q2 = IngestPipeline.run(input2.toDF().toDF("doc_id", "text"), history, cfg)
    try { input2.addData(batch2); q2.processAllAvailable() } finally q2.stop()
    val got = spark.read.parquet(out)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got == Seq(
      (1L, 0, "one two three"), (1L, 1, "three four five"), (1L, 2, "five"),
      (2L, 0, "six seven eight"), (2L, 1, "eight"),
      (4L, 0, "nine ten eleven"), (4L, 1, "eleven")),
      s"restarted ingest corpus diverged (dup leaked or chunks doubled): $got")
  }

  test("batch flavor agrees with the stream on an id-ordered replay") {
    // same corpus as the end-to-end stream test, arriving in id order —
    // the stream's first-arrival-wins and the batch's lowest-id-wins
    // must then produce identical chunks
    val history = Seq((100L, "already ingested text here"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "already ingested text here"), // history dup — dropped
      (2L, "one two three four five"),    // survives: 3 chunks
      (3L, "solo"),                       // below minTokens — gated out
      (4L, "one two three four five"),    // batch dup of 2 — dropped
      (5L, "six seven eight"))            // survives: 2 chunks
      .toDF("doc_id", "text")
    val cfg = IngestPipeline.Config(
      outDir = "", checkpointDir = "",
      minTokens = 2, chunkWindow = 3, chunkStride = 2)
    val raw = IngestPipeline.batch(incoming, history, cfg)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .toSeq
    // r22 ordering contract: batch() sorts survivors below the chunk
    // explode, so the rows must arrive ALREADY (id, chunk_ix)-ordered —
    // q_ingest relies on that instead of a final orderBy over the
    // exploded chunks (which would re-execute the pipeline for the
    // range sampler)
    assert(raw == raw.sortBy(x => (x._1, x._2)),
      s"batch() output must be (id, chunk_ix)-ordered without a caller sort: $raw")
    assert(raw == Seq(
      (2L, 0, "one two three", 3), (2L, 1, "three four five", 3),
      (2L, 2, "five", 1),
      (5L, 0, "six seven eight", 3), (5L, 1, "eight", 1)))
  }

  test("whitespace variants collapse in the STREAM like in the batch (r20 parity fix)") {
    // the stream's within-stream dedup previously keyed on raw md5
    // while the batch keyed on the normalized fingerprint — 'a b' and
    // 'a  b' both shipped through run() while batch() kept one
    val history = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-ingest-ws-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest-ws-ckpt").toString
    val cfg = IngestPipeline.Config(
      outDir = out, checkpointDir = ckpt,
      minTokens = 2, chunkWindow = 3, chunkStride = 2)
    val input = MemoryStream[(Long, String)](spark)
    val q = IngestPipeline.run(input.toDF().toDF("doc_id", "text"), history, cfg)
    try {
      input.addData(Seq(
        (1L, "one two three"),
        (2L, "one  two   three"))) // whitespace variant of doc 1
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).distinct.sorted.toSeq
    assert(streamed == Seq(1L), s"the variant must collapse in the stream: $streamed")
    // and equals the batch flavor on the same input
    val batch = IngestPipeline.batch(
      Seq((1L, "one two three"), (2L, "one  two   three")).toDF("doc_id", "text"),
      history, cfg)
      .select("doc_id").collect().map(_.getLong(0)).distinct.sorted.toSeq
    assert(batch == streamed)
  }

  test("batch() carries partitionBy columns like run() (r20 parity fix)") {
    val history = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val cfg = IngestPipeline.Config(
      outDir = "", checkpointDir = "",
      minTokens = 2, chunkWindow = 3, chunkStride = 3, partitionBy = Seq("lang"))
    val incoming = Seq(
      (1L, "uno dos tres", "es"),
      (2L, "one two three", "en"),
      (3L, "one  two  three", "en")) // normalized dup of 2: dropped, lang kept from 2
      .toDF("doc_id", "text", "lang")
    val got = IngestPipeline.batch(incoming, history, cfg)
      .select("doc_id", "chunk_text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    // previously the groupBy dropped 'lang' entirely, so a partitioned
    // corpus could not be backfilled batch-equivalently
    assert(got == Seq(
      (1L, "uno dos tres", "es"),
      (2L, "one two three", "en")), got.toString)
  }

  test("optional redact + perplexity gates: scrubbed corpus, PII-dup collapse, atypical docs dropped") {
    val history = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // LM trained on a trusted corpus of ordinary vocabulary
    val trusted = Seq(
      (100L, "one two three four five six seven"),
      (101L, "two three four five six seven eight"))
      .toDF("doc_id", "text")
    val lm = graft.ops.TextOps.trainUnigramLm(trusted, "text")
    val incoming = Seq(
      (1L, "contact alice@example.org about one two three"),
      (2L, "contact bob@example.net about one two three"), // dup of 1 AFTER redaction
      (3L, "zxqv wkjh qpzm vbnx glrt mmnn ppqq"))          // atypical vocab — ppl-gated out
      .toDF("doc_id", "text")
    val cfg = IngestPipeline.Config(
      outDir = "", checkpointDir = "",
      minTokens = 2, chunkWindow = 16, chunkStride = 16,
      redactRules = graft.ops.TextOps.piiRules,
      lm = Some(lm),
      // trusted LM: total=14, V=8, denom=23 -> OOV token costs ln(23)≈3.14,
      // common (c=2) costs ln(23/3)≈2.04. Docs 1/2 post-redaction mix both
      // (avg≈2.66); doc 3 is pure OOV (3.14). 2.9 separates them.
      maxAvgNll = 2.9)
    val got = IngestPipeline.batch(incoming, history, cfg)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    // doc 2 deduped against doc 1 BECAUSE redaction unified their texts;
    // doc 3 ppl-gated; the shipped chunk is scrubbed
    assert(got == Seq((1L, "contact <EMAIL> about one two three")))
  }

  test("optional DSIR gate: off-domain docs dropped by the importance floor") {
    val history = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // target = the domain we want more of; raw = the whole mixed crawl
    val targetDocs = Seq(
      (100L, "one two three four five"),
      (101L, "two three four five six"))
      .toDF("doc_id", "text")
    val crawlDocs = targetDocs.unionByName(Seq(
      (102L, "zxqv wkjh qpzm vbnx glrt"),
      (103L, "wkjh qpzm vbnx glrt mmnn"))
      .toDF("doc_id", "text"))
    val target = graft.ops.TextOps.trainUnigramLm(targetDocs, "text")
    val raw = graft.ops.TextOps.trainUnigramLm(crawlDocs, "text")
    val incoming = Seq(
      (1L, "one two three four"), // target-resembling: weight > 0
      (2L, "zxqv wkjh qpzm vbnx")) // off-domain: weight < 0
      .toDF("doc_id", "text")
    val cfg = IngestPipeline.Config(
      outDir = "", checkpointDir = "",
      minTokens = 2, chunkWindow = 16, chunkStride = 16,
      dsir = Some((target, raw)), minDsirWeight = 0.0)
    val got = IngestPipeline.batch(incoming, history, cfg)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(got == Seq((1L, "one two three four")))
    // the gate is a stateless projection: the same floor on the
    // dsirWeights operator agrees doc-for-doc (batch == stream algebra)
    val w = graft.ops.TextOps.dsirWeights(
        crawlDocs.unionByName(incoming), "doc_id", "text",
        org.apache.spark.sql.functions.col("doc_id").isin(100L, 101L))
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(w(102L) == false && w(103L) == false)
  }

  test("raw (pre-redaction) history still blocks its scrubbed incoming twin") {
    // history holds the document AS INGESTED — PII intact. The pipeline
    // scrubs incoming docs before the anti-join, so history must be
    // compared by its redacted text too, or this doc re-ingests forever.
    val history = Seq((1L, "contact alice@example.org about one two three"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (2L, "contact bob@example.net about one two three"), // = history post-redaction
      (3L, "genuinely new text here"))
      .toDF("doc_id", "text")
    val cfg = IngestPipeline.Config(
      outDir = "", checkpointDir = "",
      minTokens = 2, chunkWindow = 16, chunkStride = 16,
      redactRules = graft.ops.TextOps.piiRules)
    val got = IngestPipeline.batch(incoming, history, cfg)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(got == Seq((3L, "genuinely new text here")))
  }

  test("ingest with a partitioned corpus layout (lang directories)") {
    val history = spark.emptyDataFrame
      .sparkSession.createDataFrame(
        java.util.List.of[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    val out = java.nio.file.Files.createTempDirectory("graft-ingest3-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest3-ckpt").toString
    val cfg = IngestPipeline.Config(
      outDir = out, checkpointDir = ckpt,
      chunkWindow = 3, chunkStride = 3, partitionBy = Seq("lang"))
    val input = MemoryStream[(Long, String, String)](spark)
    val q = IngestPipeline.run(
      input.toDF().toDF("doc_id", "text", "lang"), history, cfg)
    try {
      input.addData(Seq(
        (1L, "uno dos tres", "es"),
        (2L, "one two three", "en")))
      q.processAllAvailable()
    } finally q.stop()
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).sorted.toSeq
    assert(dirs == Seq("lang=en", "lang=es"))
    val rows = spark.read.parquet(out)
      .select("doc_id", "chunk_text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(rows == Seq((1L, "uno dos tres", "es"), (2L, "one two three", "en")))
  }

  test("ingest from JSONL files: corpus out, quarantine out, one call") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val in = java.nio.file.Files.createTempDirectory("graft-ingest-in")
    java.nio.file.Files.write(in.resolve("batch-0.jsonl"),
      Seq(
        """{"doc_id": 1, "text": "alpha beta gamma delta"}""",
        """{"doc_id": 2, "text": "already ingested text here"}""", // history dup
        """this line is not json""").mkString("\n").getBytes("UTF-8"))
    val history = Seq((100L, "already ingested text here")).toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-ingest2-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest2-ckpt").toString
    val qOut = java.nio.file.Files.createTempDirectory("graft-quar-out").toString
    val qCkpt = java.nio.file.Files.createTempDirectory("graft-quar-ckpt").toString
    val cfg = IngestPipeline.Config(
      outDir = out, checkpointDir = ckpt, minTokens = 2,
      chunkWindow = 3, chunkStride = 3)
    val (corpusQ, quarQ) = IngestPipeline.runFromJsonl(
      spark, in.toString, schema, history, cfg, qOut, qCkpt)
    try { corpusQ.processAllAvailable(); quarQ.processAllAvailable() }
    finally { corpusQ.stop(); quarQ.stop() }
    val chunks = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(chunks == Seq((1L, 0, "alpha beta gamma"), (1L, 1, "delta")))
    val quarantined = spark.read.parquet(qOut).collect().map(_.getString(0)).toSeq
    assert(quarantined == Seq("this line is not json"))
  }
}
