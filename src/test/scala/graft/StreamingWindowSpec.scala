package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.ops.Windowing

/** Watermarked streaming tumbling aggregation: windows finalize exactly
  * once when the watermark passes, late data beyond the bound is
  * dropped — the state-droppability property the reference's unbounded
  * TABLE lacks. */
class StreamingWindowSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2026-08-12 10:$minute%02d:00")

  private case class Result(windowStart: String, eventType: String, cnt: Long)

  private def run(batches: Seq[Seq[(java.sql.Timestamp, String)]]): Seq[Result] = {
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    val out = Windowing.tumbleStream(
      input.toDF().toDF("ts", "event_type"),
      "ts", "10 minutes", "5 minutes",
      dims = Seq(col("event_type")),
      aggs = Seq(count(lit(1)).as("cnt")))
    val got = ArrayBuffer[Result]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-window-test").toString
    val q = out.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.collect()
        got.synchronized {
          got ++= rows.map { r: Row =>
            Result(
              r.getAs[java.sql.Timestamp]("window_start").toString,
              r.getAs[String]("event_type"),
              r.getAs[Long]("cnt"))
          }
        }
        ()
      }
      .start()
    try batches.foreach { b => if (b.nonEmpty) input.addData(b); q.processAllAvailable() }
    finally q.stop()
    got.toSeq
  }

  test("a window emits once, when the watermark passes its end; late data is dropped") {
    val results = run(Seq(
      // batch 1: three events in [10:00,10:10), one at 10:04
      Seq((ts(1), "a"), (ts(4), "a"), (ts(9), "b")),
      // batch 2: event at 10:16 → watermark 10:11 > 10:10 → first window emits
      Seq((ts(16), "a")),
      // batch 3: LATE event for the closed window (10:05 < watermark) → dropped
      Seq((ts(5), "a")),
      // batch 4: advance far enough to close [10:10,10:20) too
      Seq((ts(40), "c"))
    ))
    val byWindow = results.groupBy(_.windowStart.substring(11, 16))
    assert(byWindow("10:00").map(r => (r.eventType, r.cnt)).toSet == Set(("a", 2L), ("b", 1L)))
    // the late 10:05 event did NOT reopen or re-emit the closed window
    assert(results.count(_.windowStart.substring(11, 16) == "10:00") == 2)
    assert(byWindow("10:10").map(r => (r.eventType, r.cnt)).toSet == Set(("a", 1L)))
  }

  test("streaming session windows close and emit after watermark passes last-event + gap") {
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    val out = Windowing.sessionStream(
      input.toDF().toDF("ts", "user"),
      "ts", gap = "10 minutes", watermarkDelay = "0 seconds",
      keys = Seq(col("user")),
      aggs = Seq(count(lit(1)).as("cnt")))
    val got = ArrayBuffer[(String, Long)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-session-test").toString
    val q = out.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.collect()
        got.synchronized { got ++= rows.map(r => (r.getAs[String]("user"), r.getAs[Long]("cnt"))) }
        ()
      }
      .start()
    try {
      input.addData(Seq((ts(1), "u1"), (ts(5), "u1"))) // one session, 2 events
      q.processAllAvailable()
      assert(got.isEmpty) // session still open
      input.addData(Seq((ts(40), "u2"))) // watermark jumps past u1's session
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSeq == Seq(("u1", 2L)))
  }


  test("streaming hopping windows fan events into width/hop windows, equal to batch on non-late data") {
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    val out = Windowing.hopStream(
      input.toDF().toDF("ts", "event_type"),
      "ts", width = "20 minutes", hop = "10 minutes", watermarkDelay = "5 minutes",
      dims = Seq(col("event_type")),
      aggs = Seq(count(lit(1)).as("cnt")))
    val got = ArrayBuffer[(String, String, Long)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hop-test").toString
    val q = out.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.collect()
        got.synchronized {
          got ++= rows.map { r: Row =>
            (r.getAs[java.sql.Timestamp]("window_start").toString,
              r.getAs[String]("event_type"), r.getAs[Long]("cnt"))
          }
        }
        ()
      }
      .start()
    val events = Seq(ts(5) -> "click", ts(12) -> "click", ts(14) -> "view")
    try {
      input.addData(events)
      q.processAllAvailable()
      input.addData(Seq(ts(59) -> "view")) // advance watermark, close earlier windows
      q.processAllAvailable()
    } finally q.stop()
    // batch equivalent over the same closed, non-late events
    val batch = events.toDF("ts", "event_type")
      .groupBy(window(col("ts"), "20 minutes", "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start"), col("event_type"), col("cnt"))
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp](0).toString, r.getString(1), r.getLong(2)))
      .toSet
    assert(got.toSet == batch)
    // each event appears in exactly width/hop = 2 windows
    assert(got.filter(_._2 == "click").map(_._3).sum == 4) // 2 events x 2 windows
  }


  test("hopStream enforces the batch contract: width multiple of hop, no pre-epoch windows") {
    val df = Seq((ts(5), "click")).toDF("ts", "event_type")
    intercept[IllegalArgumentException] {
      Windowing.hopStream(df, "ts", "20 minutes", "7 minutes", "5 minutes",
        Seq(col("event_type")), Seq(count(lit(1)).as("cnt")))
    }
    // batch-mode evaluation of the same transform: an event shortly after
    // the epoch must not produce a 1969 window (hopNanos clamps; so must
    // the streaming flavor)
    val early = Seq((new java.sql.Timestamp(5L * 60000L), "click")).toDF("ts", "event_type")
    val wins = Windowing.hopStream(early, "ts", "20 minutes", "10 minutes", "5 minutes",
      Seq(col("event_type")), Seq(count(lit(1)).as("cnt")))
      .select(col("window_start").cast("long")).collect().map(_.getLong(0))
    assert(wins.nonEmpty && wins.forall(_ >= 0L))
  }

  test("streaming windowed counts equal the batch tumble on the same (non-late) data") {
    val events = Seq((ts(1), "a"), (ts(4), "a"), (ts(9), "b"), (ts(16), "a"))
    val streamed = run(Seq(events, Seq((ts(59), "z"))))
      .filter(_.eventType != "z")
      .map(r => (r.windowStart.substring(11, 16), r.eventType, r.cnt)).toSet
    val batch = Windowing.tumble(
      events.toDF("ts", "event_type"), col("ts"), "10 minutes",
      dims = Seq(col("event_type")),
      aggs = Seq(count(lit(1)).as("cnt")))
      .select(date_format(col("window_start"), "HH:mm"), col("event_type"), col("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed == batch)
  }

  test("quantilesStream: windows emit sketch percentiles once, within the exact rank bound") {
    val input = MemoryStream[(java.sql.Timestamp, Double)](spark)
    val out = Windowing.quantilesStream(
      input.toDF().toDF("ts", "value"), "ts", "10 minutes", "5 minutes",
      "value", Seq(0.5, 0.95))
    val got = ArrayBuffer[(String, Double, Double)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-qstream-test").toString
    val q = out.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.collect()
        got.synchronized {
          got ++= rows.map { r: Row =>
            (r.getAs[java.sql.Timestamp]("window_start").toString.substring(11, 16),
              r.getAs[Double]("p50_approx"), r.getAs[Double]("p95_approx"))
          }
        }
        ()
      }
      .start()
    val values = (1 to 9).map(i => (ts(i), i.toDouble))
    try {
      input.addData(values); q.processAllAvailable()
      input.addData(Seq((ts(59), 1000.0))); q.processAllAvailable() // advance watermark
    } finally q.stop()
    // the 10:00 window holds 1..9; at n < accuracy the sketch's rank
    // error is < 1, so estimates must be data values within one rank of
    // the exact discrete quantile (5 for p50, 8 or 9 for p95)
    val w0 = got.filter(_._1 == "10:00")
    assert(w0.size == 1, got.toSeq)
    assert(math.abs(w0.head._2 - 5.0) <= 1.0, w0.head)
    assert(w0.head._3 >= 8.0 && w0.head._3 <= 9.0, w0.head)
  }
}
