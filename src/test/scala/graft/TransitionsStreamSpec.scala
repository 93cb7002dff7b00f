package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.EventAnalytics
import graft.streaming.TransitionsStream

/** Stream/batch parity for the transition counts: an ordered keyed
  * feed, in any chunking, converges to exactly the batch
  * [[EventAnalytics.transitions]] pair counts (probabilities are a
  * read-time projection over the counts — the denominators are the
  * per-prev re-aggregate of this same table). */
class TransitionsStreamSpec extends SparkTestBase {

  import spark.implicits._

  /** Final (prev, next) -> n_pairs from the update-mode emissions
    * (latest emission per pair wins). */
  private def runStream(chunks: Seq[Seq[Ev]]): Map[(String, String), Long] = {
    graft.streaming.ChangelogStream.configure(spark)
    val input = MemoryStream[Ev](spark)
    val out = TransitionsStream.transitionCounts[Long, Ev](
      input.toDS(), _.user_id, _.event_id, _.event_type)
    val latest = mutable.Map[(String, String), Long]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-trans-stream").toString
    val q = out.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect()
        latest.synchronized {
          rows.foreach(r => latest((r.getString(0), r.getString(1))) = r.getLong(2))
        }
        ()
      }
      .start()
    try {
      chunks.foreach { c =>
        if (c.nonEmpty) input.addData(c)
        q.processAllAvailable()
      }
    } finally q.stop()
    latest.toMap
  }

  private def batchCounts(events: Seq[Ev]): Map[(String, String), Long] =
    EventAnalytics
      .transitions(
        events.map(e => (e.user_id, e.event_id, e.event_id, e.event_type))
          .toDF("user_id", "ts_ns", "event_id", "event_type"),
        "user_id", "ts_ns", "event_id", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

  private def orderedEvents: Seq[Ev] = {
    val rnd = new scala.util.Random(13)
    (1L to 150L).map { seq =>
      Ev(rnd.nextInt(8).toLong, seq, Seq("view", "click", "purchase", "error")(rnd.nextInt(4)),
        0.0)
    }
  }

  test("streamed counts equal batch transitions (single chunk)") {
    val events = orderedEvents
    assert(runStream(Seq(events)) == batchCounts(events))
  }

  test("streamed counts equal batch transitions under any chunking") {
    val events = orderedEvents
    for (size <- Seq(1, 11, 47)) {
      assert(runStream(events.grouped(size).toSeq) == batchCounts(events),
        s"chunk size $size diverged from batch")
    }
  }

  test("a NULL-typed event neither pairs nor splits the surrounding run (batch posture)") {
    // batch transitions filters NULL types before the lag window, so
    // A, null, B still pairs A→B; the stream must skip the null row
    // entirely — no (A, null)/(null, B) pairs, frontier unmoved by it
    val events = Seq(
      Ev(1L, 1L, "view", 0.0), Ev(1L, 2L, null, 0.0), Ev(1L, 3L, "click", 0.0))
    assert(runStream(Seq(events)) == Map(("view", "click") -> 1L))
    assert(runStream(Seq(events)) == batchCounts(events))
  }

  test("a below-frontier event contributes no pair") {
    val got = runStream(Seq(
      Seq(Ev(1L, 5L, "view", 0.0)),
      Seq(Ev(1L, 3L, "click", 0.0)), // stale — dropped
      Seq(Ev(1L, 7L, "purchase", 0.0))))
    assert(got == Map(("view", "purchase") -> 1L))
  }
}
