package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Changelog
import graft.streaming.Scd2Stream

/** Stream/batch parity for the SCD2 history build: an ordered keyed feed,
  * in ANY chunking, emits exactly the closed-version facts the batch
  * [[Changelog.scd2]] replay computes (the open versions are the state —
  * i.e. the applyChangelog rows — already pinned equal in ChangelogSpec). */
class Scd2StreamSpec extends SparkTestBase {

  import spark.implicits._

  /** (user_id, event_id, valid_from, valid_to) of every emitted closed fact. */
  private def runStream(chunks: Seq[Seq[Ev]]): Seq[(Long, Long, Long, Long)] = {
    graft.streaming.ChangelogStream.configure(spark)
    val input = MemoryStream[Ev](spark)
    // NULL event_type counts as deleted — the batch NULL-predicate
    // posture folded into the typed function (Scd2Stream scaladoc)
    val out = Scd2Stream.closedVersions[Long, Ev](
      input.toDS(), _.user_id, _.event_id,
      e => e.event_type == null || e.event_type == "delete")
    val emitted = ArrayBuffer[(Long, Long, Long, Long)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scd2-stream").toString
    val q = out.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(Ev, Long, Long)], _: Long) =>
        val rows = batch.collect().map(r => (r._1.user_id, r._1.event_id, r._2, r._3))
        emitted.synchronized { emitted ++= rows }
        ()
      }
      .start()
    try {
      chunks.foreach { c =>
        if (c.nonEmpty) input.addData(c)
        q.processAllAvailable()
      }
    } finally q.stop()
    emitted.toSeq
  }

  private def batchClosed(events: Seq[Ev]): Set[(Long, Long, Long, Long)] =
    Changelog
      .scd2(events.toDF(), Seq("user_id"), col("event_id"), col("event_type") === "delete")
      .filter(!col("is_current"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("valid_from_seq"), r.getAs[Long]("valid_to_seq")))
      .toSet

  /** Ordered mixed workload: 12 keys, 120 events, ~1 in 5 deletes —
    * global seq order implies per-key seq order (the Kafka contract). */
  private def orderedEvents: Seq[Ev] = {
    val rnd = new scala.util.Random(7)
    (1L to 120L).map { seq =>
      val key = rnd.nextInt(12).toLong
      val tpe = if (rnd.nextInt(5) == 0) "delete" else "update"
      Ev(key, seq, tpe, rnd.nextInt(1000).toDouble)
    }
  }

  test("streamed closed facts equal batch scd2 history (single chunk)") {
    val events = orderedEvents
    assert(runStream(Seq(events)).toSet == batchClosed(events))
  }

  test("streamed closed facts equal batch scd2 history under any chunking") {
    val events = orderedEvents
    for (size <- Seq(1, 7, 23)) {
      assert(runStream(events.grouped(size).toSeq).toSet == batchClosed(events),
        s"chunk size $size diverged from the batch replay")
    }
  }

  test("a tombstone closes the open version without opening one") {
    val emitted = runStream(Seq(
      Seq(Ev(1L, 1L, "insert", 1.0)),
      Seq(Ev(1L, 2L, "delete", 0.0)),
      Seq(Ev(1L, 3L, "insert", 3.0))))
    // v1 closed by the tombstone at seq 2; the tombstone itself emitted
    // no version; the re-insert at 3 is still OPEN (in state, not here)
    assert(emitted == Seq((1L, 1L, 1L, 2L)))
  }

  test("events below the sequence frontier are dropped, history unchanged") {
    val emitted = runStream(Seq(
      Seq(Ev(1L, 5L, "insert", 5.0)),
      Seq(Ev(1L, 3L, "update", 3.0)), // below the frontier — dropped
      Seq(Ev(1L, 7L, "update", 7.0))))
    assert(emitted == Seq((1L, 5L, 5L, 7L)),
      "the stale event must neither emit nor shift valid_to")
  }

  test("a NULL-typed raw tombstone closes without opening (batch posture)") {
    // batch scd2's !coalesce(pred, true) treats a NULL predicate as
    // deleted; the typed stream must agree via the caller-folded
    // predicate — a null-typed event closes v1 and opens NOTHING
    val emitted = runStream(Seq(
      Seq(Ev(1L, 1L, "insert", 1.0)),
      Seq(Ev(1L, 2L, null, 0.0)),
      Seq(Ev(1L, 3L, "insert", 3.0))))
    assert(emitted == Seq((1L, 1L, 1L, 2L)))
    // and the batch replay of the same feed agrees
    assert(batchClosed(Seq(
      Ev(1L, 1L, "insert", 1.0), Ev(1L, 2L, null, 0.0), Ev(1L, 3L, "insert", 3.0)))
      == Set((1L, 1L, 1L, 2L)))
  }

  test("within one micro-batch, events fold in sequence order") {
    // arrival order inside the chunk is scrambled; the fold must still
    // produce the seq-ordered history
    val emitted = runStream(Seq(
      Seq(Ev(1L, 3L, "update", 3.0), Ev(1L, 1L, "insert", 1.0), Ev(1L, 2L, "update", 2.0))))
    assert(emitted.toSet == Set((1L, 1L, 1L, 2L), (1L, 2L, 2L, 3L)))
  }
}
