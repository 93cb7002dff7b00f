package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.DedupStream

/** Top-level (encoder-friendly) streaming-dedup test record. */
case class SDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)

/** Streaming exact-dedup contracts: first-arrival-wins global dedup, and
  * the bounded-state within-watermark regime (collapse near-in-time
  * duplicates, re-admit after the horizon — the honest 100 TB-stream
  * trade-off documented on the operator). */
class DedupStreamSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(minutes: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1700000000000L + minutes * 60000L)

  /** Feed chunks through a dedup transform, collecting appended rows. */
  private def run(
      chunks: Seq[Seq[SDoc]])(transform: DataFrame => DataFrame): Seq[(Long, String)] = {
    val input = MemoryStream[SDoc](spark)
    val out = transform(input.toDF())
    val got = ArrayBuffer[(Long, String)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dedup-test").toString
    val q = out.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val rows = batch.collect().map(r =>
          (r.getLong(r.fieldIndex("doc_id")), r.getString(r.fieldIndex("text"))))
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    try {
      chunks.foreach { c =>
        if (c.nonEmpty) input.addData(c)
        q.processAllAvailable()
      }
    } finally q.stop()
    got.toSeq
  }

  test("dedup keeps the first arrival per distinct text across batch boundaries") {
    val chunks = Seq(
      Seq(SDoc(1, "alpha", ts(0)), SDoc(2, "beta", ts(1))),
      Seq(SDoc(3, "alpha", ts(2)), SDoc(4, "gamma", ts(3))), // 3 duplicates 1
      Seq(SDoc(5, "beta", ts(4)), SDoc(6, "alpha", ts(5))))  // both duplicates
    val got = run(chunks)(DedupStream.dedup(_, "text"))
    assert(got.map(_._2).sorted == Seq("alpha", "beta", "gamma"))
    // first arrival won, not a later duplicate
    assert(got.toMap == Map(1L -> "alpha", 2L -> "beta", 4L -> "gamma"))
    // matches the batch operator's distinct-text count on the same data
    val batchCount = graft.ops.TextOps
      .exactDedup(chunks.flatten.toDF(), "text", "doc_id")
      .count()
    assert(got.size.toLong == batchCount)
  }

  test("dedupWithinWatermark collapses near-in-time duplicates, re-admits after the horizon") {
    val chunks = Seq(
      Seq(SDoc(1, "alpha", ts(0)), SDoc(2, "alpha", ts(1))), // near dup: dropped
      // advance the watermark far past alpha's ts + 10 min horizon
      Seq(SDoc(3, "filler", ts(60))),
      // state for alpha expired -> the late re-fetch is re-admitted
      Seq(SDoc(4, "alpha", ts(61))))
    val got = run(chunks)(DedupStream.dedupWithinWatermark(_, "text", "ts", "10 minutes"))
    assert(got.count(_._2 == "alpha") == 2, s"expected re-admission, got $got")
    assert(got.toMap.keySet == Set(1L, 3L, 4L))
  }

  test("dedupAgainstHistory drops docs already in the static corpus, streamed == batch") {
    val history = Seq((100L, "seen before"), (101L, "also  seen"))
      .toDF("doc_id", "text")
    val chunks = Seq(
      Seq(SDoc(1, "seen before", ts(0)), SDoc(2, "fresh one", ts(1))),
      Seq(SDoc(3, "also seen", ts(2)),   // normalized dup of history
          SDoc(4, "fresh two", ts(3)),
          SDoc(5, "fresh one", ts(4))))  // within-stream dup: NOT dropped (stateless)
    val got = run(chunks)(DedupStream.dedupAgainstHistory(_, history, "text"))
    assert(got.map(_._1).sorted == Seq(2L, 4L, 5L))
    // equals the batch operator on the same data
    val batch = graft.ops.TextOps
      .dedupAgainst(history, chunks.flatten.toDF().drop("ts"), "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got.map(_._1).sorted == batch)
  }
}
