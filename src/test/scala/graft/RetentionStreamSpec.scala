package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{ActivityEvent, RetentionDelta, RetentionStream}

/** Streaming retention contracts: batch equivalence on in-order replay
  * across batch splits, change-only emission, anchored (never-rewriting)
  * cohorts, and the offset cap bounding state. */
class RetentionStreamSpec extends SparkTestBase {

  import spark.implicits._

  private def run(
      chunks: Seq[Seq[ActivityEvent]],
      maxOffsetDays: Int = 30): Seq[RetentionDelta] = {
    val input = MemoryStream[ActivityEvent](spark)
    // dayUnit 10: test events use small ts ticks, 10 ticks = one "day"
    val out = RetentionStream.retentionDeltas(input.toDS(), maxOffsetDays, dayUnit = 10L)
    val got = ArrayBuffer[RetentionDelta]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-retstream").toString
    val q = out.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[RetentionDelta], _: Long) =>
        val rows = batch.collect()
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()
    got.toSeq
  }

  private def matrix(deltas: Seq[RetentionDelta]): Map[(Long, Long), Long] =
    deltas.groupBy(d => (d.cohortDay, d.dayOffset)).map { case (k, ds) =>
      k -> ds.map(_.user).distinct.size.toLong
    }

  test("in-order replay across batch splits equals the batch retention matrix") {
    val events = Seq(
      // user 1: cohort day 1, active days 1, 2, 4
      ActivityEvent(1L, 10L), ActivityEvent(1L, 21L), ActivityEvent(1L, 45L),
      // user 2: cohort day 1, active days 1, 4
      ActivityEvent(2L, 15L), ActivityEvent(2L, 42L),
      // user 3: cohort day 2, active day 2 only (two events, one delta)
      ActivityEvent(3L, 20L), ActivityEvent(3L, 27L))
    // split mid-user so cohorts and offsets must survive batch boundaries
    val got = run(Seq(events.take(2), events.slice(2, 5), events.drop(5)))

    val batch = graft.ops.EventAnalytics.retention(
      events.toDF().toDF("user_id", "ts")
        .selectExpr("user_id", "ts * 8640000000000 AS ts"), // tick -> nanos/10
      "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(matrix(got) == batch)
    // change-only: exactly one delta per (user, offset) — 6 total
    assert(got.size == 6)
  }

  test("a repeat same-day event emits nothing") {
    val got = run(Seq(
      Seq(ActivityEvent(1L, 10L)),
      Seq(ActivityEvent(1L, 15L)), // same day 1 — silent
      Seq(ActivityEvent(1L, 25L))))
    assert(got == Seq(
      RetentionDelta(1L, 1L, 0L), RetentionDelta(1L, 1L, 1L)))
  }

  test("the cohort anchors at the first-observed day; earlier stragglers are dropped") {
    val got = run(Seq(
      Seq(ActivityEvent(1L, 30L)),   // anchor: day 3
      Seq(ActivityEvent(1L, 10L)),   // day 1 — BEFORE the anchor, dropped
      Seq(ActivityEvent(1L, 40L))))  // day 4 = offset 1
    assert(got == Seq(
      RetentionDelta(1L, 3L, 0L), RetentionDelta(1L, 3L, 1L)))
  }

  test("maxOffsetDays caps both emission and state") {
    val got = run(
      Seq(Seq(
        ActivityEvent(1L, 10L),   // offset 0
        ActivityEvent(1L, 30L),   // offset 2 — over the cap, dropped
        ActivityEvent(1L, 20L))), // offset 1
      maxOffsetDays = 1)
    assert(got.toSet == Set(
      RetentionDelta(1L, 1L, 0L), RetentionDelta(1L, 1L, 1L)))
  }
}
