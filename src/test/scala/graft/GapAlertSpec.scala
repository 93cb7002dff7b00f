package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.ops.EventAnalytics
import graft.streaming.{GapAlert, GapAlertStream}

/** Silence detection, both halves: the batch lag-window over history
  * ([[EventAnalytics.gaps]], the q_gaps oracle row) and the event-time
  * dead-man's switch ([[GapAlertStream]]) — alert when the watermark
  * passes a key's last heartbeat + gap, re-arming on revival. */
class GapAlertSpec extends SparkTestBase {

  import spark.implicits._

  test("gaps finds every over-threshold consecutive hole, per key, micros out") {
    val m = 60000000000L // one minute in nanos
    val df = Seq(
      (1L, 0 * m), (1L, 2 * m), (1L, 10 * m), (1L, 11 * m), (1L, 30 * m),
      (2L, 0 * m), (2L, 4 * m),
      (3L, 5 * m) // single event: no consecutive pair, no gap
    ).toDF("user_id", "ts_ns")
    val got = EventAnalytics.gaps(df, "user_id", "ts_ns", gapNs = 5 * m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val us = m / 1000
    assert(got.toSeq == Seq(
      (1L, 2 * us, 10 * us, 8 * us),
      (1L, 11 * us, 30 * us, 19 * us)))
  }

  test("the dead-man's switch alerts when the watermark passes last_seen + gap") {
    graft.streaming.ChangelogStream.configure(spark)
    val input = MemoryStream[(Long, Long)](spark) // (key, epoch-micros)
    val stream = input.toDF().toDF("key", "us")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros($"us"))
    val gapUs = 5L * 60 * 1000000 // 5 minutes
    val alerts = GapAlertStream.alerts(stream, "key", "ts", gapUs, "0 seconds")
    val got = ArrayBuffer[GapAlert]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-gapalert").toString
    val q = alerts.toDF().writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.collect()
        got.synchronized {
          got ++= rows.map { r: Row => GapAlert(r.getLong(0), r.getLong(1), r.getLong(2)) }
        }
        ()
      }
      .start()
    // NOTE: heartbeats start at t=1min, not 0 — the stream's initial
    // watermark is epoch 0 and the stateful operator's late filter is
    // STRICT (`ts > watermark`), so an epoch-0 event would be dropped
    // before the fold. Real timestamps are never near epoch; only this
    // fixture is.
    def min(n: Long) = n * 60 * 1000000L
    try {
      // batch 1: A and B heartbeat at t=1min; A again at t=2min
      input.addData(Seq((1L, min(1)), (2L, min(1)), (1L, min(2))))
      q.processAllAvailable()
      assert(got.isEmpty, "no alert while the watermark is behind every deadline")
      // batch 2: A heartbeats at t=20min -> watermark (delay 0) = 20min
      input.addData(Seq((1L, min(20))))
      q.processAllAvailable()
      // batch 3: timers evaluate against the post-batch-2 watermark —
      // B's deadline (1+5min) has passed, B alerts once; A's newest
      // deadline (20+5min) has not
      input.addData(Seq((1L, min(21))))
      q.processAllAvailable()
      got.synchronized {
        assert(got.toSeq == Seq(GapAlert(2L, min(1), gapUs)),
          s"exactly one alert for the silent key, got $got")
      }
      // revival re-arms: B heartbeats again, goes silent again -> a
      // SECOND alert for a fresh episode
      input.addData(Seq((2L, min(22))))
      q.processAllAvailable()
      input.addData(Seq((1L, min(40))))
      q.processAllAvailable()
      input.addData(Seq((1L, min(41))))
      q.processAllAvailable()
      got.synchronized {
        assert(got.toSeq == Seq(
          GapAlert(2L, min(1), gapUs),
          GapAlert(2L, min(22), gapUs)), s"revival must re-arm, got $got")
      }
    } finally q.stop()
  }
}
