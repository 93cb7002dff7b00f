package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.TextOps

/** Top-level (encoder-friendly) streaming text-op test record. */
case class TDoc(doc_id: Long, lang: String, text: String)

/** The stateless text operators (chunking, deterministic sampling,
  * quality features) are pure projections/generators, so the SAME
  * DataFrame code runs unchanged on a stream — this suite pins that
  * contract (per-batch output == the batch operator on the batch's
  * rows), which is what makes the corpus pipeline deployable at
  * ingest time without a parallel streaming implementation. */
class StatelessTextStreamSpec extends SparkTestBase {

  import spark.implicits._

  private def runStream(
      chunks: Seq[Seq[TDoc]])(transform: DataFrame => DataFrame): Seq[Seq[Row]] = {
    val input = MemoryStream[TDoc](spark)
    val out = transform(input.toDF())
    val batches = ArrayBuffer[Seq[Row]]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sls-test").toString
    val q = out.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val rows = batch.collect().toSeq
        batches.synchronized { batches += rows }
        ()
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()
    batches.toSeq
  }

  private val docs = Seq(
    Seq(
      TDoc(1, "en", "one two three four five six seven eight nine ten"),
      TDoc(2, "de", "ein zwei drei")),
    Seq(
      TDoc(3, "en", "the quick brown fox jumps over the lazy dog again and again"),
      TDoc(4, "fr", "")))

  test("chunk streams batch-identically (pure generator)") {
    val streamed = runStream(docs)(TextOps.chunk(_, "doc_id", "text", window = 4, stride = 3))
      .map(_.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted)
    val batch = docs.map(c =>
      TextOps.chunk(c.toDF(), "doc_id", "text", 4, 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq.sorted)
    assert(streamed == batch)
  }

  test("deterministicSample streams batch-identically (same per-row verdicts)") {
    val rates = Map("en" -> 0.5)
    val streamed = runStream(docs)(TextOps.deterministicSample(_, "doc_id", "lang", rates, 1.0))
      .flatMap(_.map(_.getLong(0))).sorted
    val batch = TextOps.deterministicSample(docs.flatten.toDF(), "doc_id", "lang", rates, 1.0)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed == batch)
  }

  test("qualityFeatures streams batch-identically (pure projection)") {
    val streamed = runStream(docs)(TextOps.qualityFeatures(_, "text")
      .select("doc_id", "n_tokens", "punct_ratio"))
      .flatMap(_.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))).sorted
    val batch = TextOps.qualityFeatures(docs.flatten.toDF(), "text")
      .select("doc_id", "n_tokens", "punct_ratio")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(streamed == batch)
  }

  test("assignSplit streams batch-identically (same per-row split verdicts)") {
    val splits = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val streamed = runStream(docs)(TextOps.assignSplit(_, "doc_id", splits)
      .select("doc_id", "split"))
      .flatMap(_.map(r => (r.getLong(0), r.getString(1)))).sorted
    val batch = TextOps.assignSplit(docs.flatten.toDF(), "doc_id", splits)
      .select("doc_id", "split")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(streamed == batch)
  }

  test("gopherQuality streams batch-identically (pure projection, no output sort)") {
    def key(r: Row) = (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getLong(3), r.getDouble(4), r.getBoolean(5))
    val streamed = runStream(docs)(TextOps.gopherQuality(_, "doc_id", "text"))
      .flatMap(_.map(key)).sortBy(_._1)
    val batch = TextOps.gopherQuality(docs.flatten.toDF(), "doc_id", "text")
      .collect().map(key).sortBy(_._1).toSeq
    assert(streamed == batch)
  }

  test("redact streams batch-identically (pure projection)") {
    val streamed = runStream(docs)(TextOps.redact(_, "text")
      .select("doc_id", "text_redacted"))
      .flatMap(_.map(r => (r.getLong(0), r.getString(1)))).sorted
    val batch = TextOps.redact(docs.flatten.toDF(), "text")
      .select("doc_id", "text_redacted")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(streamed == batch)
  }
}
