package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.NearDupStream

/** Streaming near-dup candidate record (top-level for encoders). */
case class NDoc(doc_id: Long, text: String)

/** Streaming MinHash near-dup contracts: candidate parity with the batch
  * operator over the cumulative corpus, exact estimates for identical
  * docs, cross-batch detection, and the bucket-cap state bound. */
class NearDupStreamSpec extends SparkTestBase {

  import spark.implicits._

  private def run(
      chunks: Seq[Seq[NDoc]],
      maxBucket: Int = 64): Seq[(Long, Long, Double)] = {
    val input = MemoryStream[NDoc](spark)
    val out = NearDupStream.candidatePairs(
      input.toDF(), "doc_id", "text", maxBucket = maxBucket)
    val got = ArrayBuffer[(Long, Long, Double)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ndstream").toString
    val q = out.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[graft.streaming.NearDupCand], _: Long) =>
        val rows = batch.collect().map(c => (c.id1, c.id2, c.est_jaccard))
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()
    got.toSeq
  }

  private val corpus = Seq(
    NDoc(0L, "the quick brown fox jumps over the lazy dog again and again today"),
    NDoc(1L, "the quick  brown fox jumps over the lazy dog again and again today"),
    NDoc(2L, "the quick brown fox leaps over the lazy dog again and again today"),
    NDoc(3L, "completely different content about spark catalyst optimizer internals"),
    NDoc(4L, "the quick brown cat sat still watching birds in the garden quietly"))

  test("streaming candidates equal the batch banding over the cumulative corpus") {
    // split mid-near-dup-cluster so detection must work ACROSS batches
    val got = run(Seq(corpus.take(2), corpus.drop(2)))
    val streamPairs = got.map(p => (p._1, p._2)).distinct.toSet
    val batchPairs = graft.ops.NearDup
      .minhashCandidatePairs(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamPairs == batchPairs,
      s"stream $streamPairs != batch $batchPairs")
    // the same pair may surface from several bands but always with the
    // identical estimate (pure function of the two signatures)
    got.groupBy(p => (p._1, p._2)).foreach { case (pair, ests) =>
      assert(ests.map(_._3).distinct.length == 1, s"$pair estimates diverged")
    }
  }

  test("identical docs estimate 1.0; near-identical estimate high but below 1") {
    val got = run(Seq(corpus)).map(p => (p._1, p._2) -> p._3).toMap
    assert(got((0L, 1L)) == 1.0) // whitespace-normalized identical
    got.get((0L, 2L)).foreach { est => // one-word edit, if banded together
      assert(est > 0.4 && est < 1.0, s"est=$est")
    }
  }

  test("bucket cap bounds state: later arrivals match retained members only") {
    val same = (0L to 3L).map(i => NDoc(i, "alpha beta gamma delta epsilon zeta eta"))
    val got = run(same.map(Seq(_)), maxBucket = 1)
    val pairs = got.map(p => (p._1, p._2)).distinct.toSet
    // doc 0 is the only retained member of every bucket: 1,2,3 each pair
    // with 0 (est 1.0) and never with each other
    assert(pairs == Set((0L, 1L), (0L, 2L), (0L, 3L)), pairs.toString)
    assert(got.forall(_._3 == 1.0))
  }

  test("a replayed doc id neither re-pairs nor duplicates bucket state") {
    val d = NDoc(7L, "some replayed document body with enough words to shingle")
    val got = run(Seq(Seq(d), Seq(d), Seq(d)))
    assert(got.isEmpty, s"replay must not self-pair: $got")
  }

  test("within-watermark flavor expires buckets past the horizon") {
    import org.apache.spark.sql.{Dataset => Ds}
    def ts(minutes: Long) = new java.sql.Timestamp(1700000000000L + minutes * 60000L)
    val text = "alpha beta gamma delta epsilon zeta eta theta iota"
    val input = MemoryStream[SDoc](spark)
    val out = NearDupStream.candidatePairsWithinWatermark(
      input.toDF(), "doc_id", "text", "ts", "10 minutes")
    val got = ArrayBuffer[(Long, Long, Double)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ndstream-wm").toString
    val q = out.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Ds[graft.streaming.NearDupCand], _: Long) =>
        val rows = batch.collect().map(c => (c.id1, c.id2, c.est_jaccard))
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    try {
      // near-in-time duplicate: flagged
      input.addData(Seq(SDoc(1L, text, ts(0))))
      q.processAllAvailable()
      input.addData(Seq(SDoc(2L, text, ts(5))))
      q.processAllAvailable()
      assert(got.map(p => (p._1, p._2)).distinct == Seq((1L, 2L)))
      got.clear()
      // advance the watermark far past the horizon (watermark = max
      // event time - delay), then let the timeout fire
      input.addData(Seq(SDoc(50L, "completely different filler content here now", ts(60))))
      q.processAllAvailable()
      input.addData(Seq(SDoc(51L, "more unrelated filler content to tick the clock", ts(61))))
      q.processAllAvailable()
      got.clear()
      // the identical doc re-arrives AFTER expiry: bucket state is gone,
      // so no pair — it becomes the new retained member instead
      input.addData(Seq(SDoc(3L, text, ts(62))))
      q.processAllAvailable()
      assert(got.isEmpty, s"expired bucket must not pair: $got")
      // and the NEW member is live: a fresh near-in-time duplicate pairs
      input.addData(Seq(SDoc(4L, text, ts(63))))
      q.processAllAvailable()
      assert(got.map(p => (p._1, p._2)).distinct == Seq((3L, 4L)), got.toString)
    } finally q.stop()
  }
}
