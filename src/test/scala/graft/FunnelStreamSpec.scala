package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{FunnelDepth, FunnelEvent, FunnelStream}

/** Streaming funnel contracts: batch equivalence on in-order replay,
  * cross-batch advancement, monotone (never-rewinding) depth, and
  * change-only emission. */
class FunnelStreamSpec extends SparkTestBase {

  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  private def run(chunks: Seq[Seq[FunnelEvent]]): Seq[FunnelDepth] = {
    val input = MemoryStream[FunnelEvent](spark)
    val out = FunnelStream.funnelDepths(input.toDS(), steps)
    val got = ArrayBuffer[FunnelDepth]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-funnelstream").toString
    val q = out.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[FunnelDepth], _: Long) =>
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

  test("in-order replay reaches the batch operator's final depths across batch splits") {
    val events = Seq(
      FunnelEvent(1L, 10L, 1L, "view"), FunnelEvent(1L, 20L, 2L, "click"),
      FunnelEvent(1L, 30L, 3L, "purchase"),
      FunnelEvent(2L, 10L, 4L, "view"), FunnelEvent(2L, 15L, 5L, "purchase"),
      FunnelEvent(2L, 20L, 6L, "click"),
      FunnelEvent(3L, 10L, 7L, "error"))
    // split so user 1's funnel must advance ACROSS micro-batches
    val got = run(Seq(events.take(2), events.drop(2)))
    val finalDepth = got.groupBy(_.user).map { case (u, ds) => u -> ds.map(_.depth).max }
    assert(finalDepth == Map(1L -> 3, 2L -> 2)) // user 3 never emits

    val batch = graft.ops.EventAnalytics.funnel(
      events.toDF().toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type", steps)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // stream depth histogram == batch funnel counts
    val streamCounts = (1 to steps.size).map { s =>
      s.toLong -> finalDepth.values.count(_ >= s).toLong
    }.toMap
    assert(streamCounts == batch)
  }

  test("depth is monotone: a late out-of-order event cannot rewind state") {
    // batch 1 delivers view+click; batch 2 delivers an EARLIER duplicate
    // view (out of order) then purchase — depth must go 2 -> 3, never back
    val got = run(Seq(
      Seq(FunnelEvent(1L, 10L, 1L, "view"), FunnelEvent(1L, 20L, 2L, "click")),
      Seq(FunnelEvent(1L, 5L, 3L, "view"), FunnelEvent(1L, 30L, 4L, "purchase"))))
    assert(got.map(_.depth) == Seq(2, 3))
  }

  test("a batch that advances nothing emits nothing") {
    val got = run(Seq(
      Seq(FunnelEvent(1L, 10L, 1L, "view")),
      Seq(FunnelEvent(1L, 20L, 2L, "error")), // no advance -> silent
      Seq(FunnelEvent(1L, 30L, 3L, "click"))))
    assert(got.map(_.depth) == Seq(1, 2))
  }

  test("within a micro-batch, events fold in (ts, eventId) order, not arrival order") {
    // purchase listed FIRST in the batch but timestamped last — full depth
    val got = run(Seq(Seq(
      FunnelEvent(1L, 30L, 3L, "purchase"),
      FunnelEvent(1L, 10L, 1L, "view"),
      FunnelEvent(1L, 20L, 2L, "click"))))
    assert(got == Seq(FunnelDepth(1L, 3)))
  }
}
